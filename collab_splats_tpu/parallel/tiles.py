"""Tile-sharded rendering: gaussian -> tile-band all-to-all routing.

Closes the SURVEY §2c "long-context analog": in the default sharded step
(parallel/train.py) every device all-gathers the FULL projected set, so
per-device memory and compositing work stay O(total N) however many chips
share the ``gauss`` axis.  Here the image's tile grid is split into G
horizontal bands (one per gauss-axis device) and the projected rows are
*routed*, not replicated:

  1. each device projects its local C/G Gaussian shard,
  2. for every band owner it packs the (few) local Gaussians whose screen
     bbox overlaps that band into a fixed-capacity send slab,
  3. one ``all_to_all`` over the gauss axis delivers to each device exactly
     the Gaussians touching ITS band — per-device buffers are
     O(C/G + G*S) instead of O(C),
  4. each device bins + composites only its own band (existing XLA
     pipeline, band-local tile grid),
  5. the tiny pixel bands are all-gathered so the loss (including the
     windowed SSIM, which needs cross-band context) is computed on the
     full image exactly as in the unsharded path.

Backward: the all_to_all transposes to the reverse all_to_all and the
band all-gather to a reduce-scatter — gradients route themselves.

Capacity semantics mirror ops/tiles.py: per-destination overflow drops the
farthest Gaussians (counted in ``spilled``), never corrupts memory.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from ..core.options import RenderOptions
from ..core.projection import Projection
from ..ops.rasterize import render_from_projections
from .mesh import GAUSS_AXIS


def band_rows(height: int, tile_size: int, n_bands: int) -> int:
    """Tile rows per band (requires the padded tile grid to split evenly)."""
    nty = -(-height // tile_size)
    assert nty % n_bands == 0, (
        f"tile rows {nty} not divisible into {n_bands} bands; pad the image"
    )
    return nty // n_bands


class RouteInfo(NamedTuple):
    """Send-side slab layout of one :func:`route_to_bands` call.

    Lets callers route *computed statistics* back to the source shards with
    the reverse ``all_to_all`` (used by the tile-sharded train step's
    densification statistics): received slab row ``band * send_cap + slot``
    on band owner ``band`` came from local Gaussian ``slot_gid[band, slot]``
    on this device (valid where ``slot_valid``).
    """

    slot_gid: jax.Array    # [n_bands, send_cap] local gaussian index
    slot_valid: jax.Array  # [n_bands, send_cap] bool


def route_to_bands(
    proj: Projection,
    extras: jax.Array,
    height: int,
    tile_size: int,
    n_bands: int,
    send_cap: int,
) -> Tuple[Projection, jax.Array, jax.Array, jax.Array, RouteInfo]:
    """Inside shard_map: route local projections to band owners.

    Args:
        proj: local-shard projections [n_local].
        extras: [n_local, E] extra per-gaussian rows to ship (opacity,
            colors, ...).
        send_cap: S, max Gaussians shipped to any single band per source
            device.

    Returns:
        (proj_recv [G*S] with band-local v coordinates, extras_recv
        [G*S, E], valid_recv [G*S] bool, spilled [] int32, RouteInfo).
    """
    rows = band_rows(height, tile_size, n_bands)
    band_px = rows * tile_size
    n = proj.depth.shape[0]

    # Band overlap from the screen-space bbox (per-axis vertical extent,
    # consistent with ops/tiles.tile_bbox's ry-based membership).
    v = proj.mean2d[:, 1]
    r = proj.radius_xy[:, 1]
    b0 = jnp.clip(jnp.floor((v - r) / band_px), 0, n_bands - 1).astype(jnp.int32)
    b1 = jnp.clip(jnp.floor((v + r) / band_px), 0, n_bands - 1).astype(jnp.int32)

    # Pack one [D]-row per gaussian once; slab scatter per band.  Normals
    # are NOT shipped here — callers put whatever normal they composite
    # into ``extras`` (render_tile_sharded does), so shipping proj.normal
    # too would duplicate 3 f32 channels per routed gaussian on the wire.
    flat = jnp.concatenate(
        [
            proj.mean2d, proj.depth[:, None], proj.conic, proj.radius[:, None],
            proj.compensation[:, None], proj.plane, proj.radius_xy,
            extras,
        ],
        axis=1,
    )
    d = flat.shape[1]
    band_ids = jnp.arange(n_bands, dtype=jnp.int32)
    member = (
        proj.valid[None, :]
        & (b0[None, :] <= band_ids[:, None])
        & (b1[None, :] >= band_ids[:, None])
    )                                                   # [G, n]
    # Near-to-far priority for the capacity cut: rank members per band by
    # depth so overflow drops the farthest (occluded-in-practice) rows.
    order = jnp.argsort(
        jnp.where(member, proj.depth[None, :], jnp.inf), axis=1
    )                                                   # [G, n]
    take = min(send_cap, n)
    slot_gid = order[:, :take]                          # [G, take]
    slot_valid = jnp.take_along_axis(member, slot_gid, axis=1)
    if send_cap > take:                                 # slab > shard size
        pad = send_cap - take
        slot_gid = jnp.pad(slot_gid, ((0, 0), (0, pad)))
        slot_valid = jnp.pad(slot_valid, ((0, 0), (0, pad)))
    send = flat[slot_gid.reshape(-1)].reshape(n_bands, send_cap, d)
    # Validity rides as one extra channel of the SAME slab: a second
    # all_to_all per step just for one bit doubles the collective launch
    # cost on the hot path.
    send = jnp.concatenate(
        [send,
         jax.lax.stop_gradient(slot_valid.astype(jnp.float32))[..., None]],
        axis=-1,
    )
    spilled = jnp.sum(member.astype(jnp.int32)) - jnp.sum(
        slot_valid.astype(jnp.int32)
    )

    recv = jax.lax.all_to_all(
        send, GAUSS_AXIS, split_axis=0, concat_axis=0, tiled=True
    ).reshape(n_bands * send_cap, d + 1)                # [G*S, D+1]
    valid_recv = recv[:, d] > 0.5
    spilled = jax.lax.psum(spilled, GAUSS_AXIS)

    my_band = jax.lax.axis_index(GAUSS_AXIS)
    v_off = (my_band * band_px).astype(jnp.float32)
    mean2d = recv[:, 0:2].at[:, 1].add(-v_off)
    proj_recv = Projection(
        mean2d=mean2d,
        depth=recv[:, 2],
        conic=recv[:, 3:6],
        radius=recv[:, 6],
        compensation=recv[:, 7],
        plane=recv[:, 8:10],
        normal=jnp.zeros((recv.shape[0], 3), recv.dtype),
        valid=valid_recv,
        radius_xy=recv[:, 10:12],
    )
    extras_recv = recv[:, 12:d]
    return proj_recv, extras_recv, valid_recv, spilled, RouteInfo(
        slot_gid=slot_gid, slot_valid=slot_valid
    )


def render_tile_sharded(
    proj: Projection,
    opac: jax.Array,
    colors: jax.Array,
    camera: Camera,
    opts: RenderOptions,
    n_bands: int,
    send_cap: int,
    normal_cam: jax.Array | None = None,
    absgrad_sink: jax.Array | None = None,
):
    """Inside shard_map over the gauss axis: full-image render with routed,
    band-local compositing.  Returns (RenderOutput with full-image maps —
    identical on every gauss-axis member — the band-local RenderMeta, and
    the :class:`RouteInfo` for routing statistics back to source shards).

    ``absgrad_sink`` (optional) is the per-(band-tile, splat) zero sink of
    shape ``absgrad_sink_shape(width, band_px, n_bands * send_cap, opts)``;
    its cotangent indexes the *received slab* via ``meta.bins.tile_gauss``
    (see parallel/train.py's tile-sharded statistics path).

    ``camera.height`` must make the tile grid divisible into ``n_bands``
    (pad upstream if needed).
    """
    ts = opts.tile_size
    rows = band_rows(camera.height, ts, n_bands)
    band_px = rows * ts
    if normal_cam is None:
        normal_cam = proj.normal
    extras = jnp.concatenate([opac[:, None], colors, normal_cam], axis=1)
    proj_b, extras_b, valid_b, spilled, route = route_to_bands(
        proj, extras, camera.height, ts, n_bands, send_cap
    )
    c_dim = colors.shape[1]
    opac_b = jnp.where(valid_b, extras_b[:, 0], 0.0)
    colors_b = extras_b[:, 1 : 1 + c_dim]
    normal_b = extras_b[:, 1 + c_dim : 4 + c_dim]

    band_cam = Camera(
        K=camera.K, c2w=camera.c2w, width=camera.width, height=band_px
    )
    out, meta = render_from_projections(
        proj_b, opac_b, colors_b, normal_b, band_cam, opts,
        absgrad_sink=absgrad_sink,
    )

    # Stitch bands to the full image on every member (pixels are tiny
    # relative to the gaussian table; backward = reduce-scatter).
    gather = lambda x: jax.lax.all_gather(x, GAUSS_AXIS, axis=0, tiled=True)
    full = out._replace(
        color=gather(out.color)[: camera.height],
        alpha=gather(out.alpha)[: camera.height],
        depth=gather(out.depth)[: camera.height],
        median_depth=gather(out.median_depth)[: camera.height],
        normal=gather(out.normal)[: camera.height],
        spilled=jax.lax.psum(out.spilled, GAUSS_AXIS) + spilled,
    )
    return full, meta, route
