"""Production tiled rasterizer: dense per-tile compositing under `jit`.

TPU-native replacement for the gsplat-rade CUDA rasterization entry point
(``rasterization(...)`` 6-tuple contract, /root/reference/collab_splats/
models/rade_gs_model.py:439-465).  Design (SURVEY.md §7 layer 2):

* projection (core/projection.py) and binning (ops/tiles.py) run as dense XLA
  ops;
* compositing processes tiles in chunks with ``lax.map`` + ``jax.checkpoint``:
  for a chunk of tiles, all (pixel, splat) alphas are evaluated densely
  [chunk, pixels, K], transmittance is a log-space cumsum, and the weighted
  color/normal reductions are einsums that XLA lowers onto the MXU.  No
  divergent loops, fully static shapes, O(chunk · 256 · K) VMEM-resident
  working set.

Gradients: the whole path is plain differentiable JAX.  Densification
statistics (gsplat ``absgrad``, rade_gs_model.py:456-458) are exposed via an
*additive sink*: ``absgrad_sink`` [T, K, 2] of zeros is added to the gathered
per-intersection 2D means, so ``jax.grad`` w.r.t. the sink yields exact
per-(tile, splat) screen-space gradients which the strategy abs-accumulates
per Gaussian — same statistic as gsplat's per-tile absgrad, with no custom
VJP.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from ..core.compositing import composite_chunk, splat_alpha
from ..core.golden import RenderOutput
from ..core.options import RenderOptions
from ..core.projection import Projection, project_gaussians
from .segsum import expand_rows, spread_masked
from .tiles import TileBins, bin_gaussians


# Packed per-gaussian column layout, shared by every compositing path
# (single-chip render_tiled, the sharded step's all-gathered exchange, and
# the Pallas intersection pack).  Change it here and nowhere else.
PG_MEAN2D = slice(0, 2)
PG_CONIC = slice(2, 5)
PG_DEPTH = 5
PG_PLANE = slice(6, 8)
PG_OPAC = 8
PG_NORMAL = slice(9, 12)
PG_COLORS = slice(12, None)
PG_FIXED = 12   # columns before the C color/feature channels


def pack_per_gauss(
    proj: Projection,
    opac: jax.Array,
    normal_cam: jax.Array,
    colors: jax.Array,
) -> jax.Array:
    """[N, 12+C] packed per-gaussian matrix in the PG_* column layout."""
    return jnp.concatenate(
        [
            proj.mean2d,                       # PG_MEAN2D
            proj.conic,                        # PG_CONIC
            proj.depth[:, None],               # PG_DEPTH
            proj.plane,                        # PG_PLANE
            opac[:, None],                     # PG_OPAC
            normal_cam,                        # PG_NORMAL
            colors,                            # PG_COLORS
        ],
        axis=1,
    )


def pack_intersections(
    proj: Projection,
    opac: jax.Array,
    colors: jax.Array,
    normal_cam: jax.Array,
    sorted_gid: jax.Array,
) -> jax.Array:
    """Build the packed per-intersection matrix [D, M] consumed by the
    Pallas compositing kernel (row layout in ops/pallas/composite.py).

    One XLA gather in intersection order; its transpose (VJP) is exactly the
    per-Gaussian scatter-add that routes pixel gradients back from
    intersections to Gaussians.
    """
    per_gauss = pack_per_gauss(proj, opac, normal_cam, colors)
    # Mosaic DMA slices must be sublane-aligned: pad channels to 8.
    d = per_gauss.shape[1]
    pad = (-d) % 8
    if pad:
        per_gauss = jnp.pad(per_gauss, ((0, 0), (0, pad)))
    return per_gauss[sorted_gid].T


def render_tiled_pallas(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    camera: Camera,
    opts: RenderOptions = RenderOptions(),
    normals_world: Optional[jax.Array] = None,
    absgrad_sink: Optional[jax.Array] = None,
    stop_threshold: float = 1e-4,
    interpret: bool = False,
    alive_mask: Optional[jax.Array] = None,
) -> tuple[RenderOutput, "RenderMeta"]:
    """Pallas-kernel render path.

    Same contract as :func:`render_tiled`; compositing runs in the fused
    per-tile TPU kernel (ops/pallas/composite.py) over contiguous packed
    intersection segments, with transmittance early exit.  Use
    ``interpret=True`` on CPU for tests.

    ``absgrad_sink`` here is **per-intersection**: shape [2, M] zeros added
    to the packed 2D-mean rows, so its cotangent is the exact per-(tile,
    splat) screen-space gradient (consumed by
    ``train.strategy.update_state_from_isect``).  Use
    :func:`pallas_sink_shape` for the shape.
    """
    from .pallas.composite import CHUNK, composite_tiles

    viewmat = camera.viewmat()
    proj = project_gaussians(
        means, quats, scales, viewmat, camera.K,
        camera.width, camera.height,
        eps2d=opts.eps2d, near_plane=opts.near_plane,
        far_plane=opts.far_plane, radius_clip=opts.radius_clip,
        opacities=opacities,
    )
    if alive_mask is not None:
        proj = proj._replace(valid=proj.valid & alive_mask)
    opac = opacities
    if opts.rasterize_mode == "antialiased":
        opac = opac * proj.compensation
    if normals_world is not None:
        normal_cam = normals_world @ viewmat[:3, :3].T
    else:
        normal_cam = proj.normal

    bins = bin_gaussians(proj, camera.width, camera.height, opts,
                         opacities=jax.lax.stop_gradient(opac))
    ts = opts.tile_size
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    num_tiles = ntx * nty
    n_color = colors.shape[-1]

    from .tiles import align_segments, default_tile_capacity

    aligned_gid, aligned_starts, lens = align_segments(
        bins.starts, bins.sorted_gid, CHUNK
    )
    isect = pack_intersections(proj, opac, colors, normal_cam, aligned_gid)
    if absgrad_sink is not None:
        isect = isect.at[0:2, :].add(absgrad_sink)
    k_cap = opts.tile_capacity or default_tile_capacity(means.shape[0])
    max_chunks = max(-(-k_cap // CHUNK), 1)

    packed = composite_tiles(
        isect, aligned_starts, lens, ntx, ts, n_color,
        opts.near_plane, stop_threshold, max_chunks, interpret,
    )

    def stitch(x):
        ch = x.shape[2:]
        x = x.reshape((nty, ntx, ts, ts) + ch)
        x = jnp.swapaxes(x, 1, 2).reshape((nty * ts, ntx * ts) + ch)
        return x[: camera.height, : camera.width]

    p = ts * ts
    packed_img = packed.reshape(num_tiles, p, n_color + 6)
    color = stitch(packed_img[..., :n_color])
    normal = stitch(packed_img[..., n_color : n_color + 3])
    alpha = stitch(packed_img[..., n_color + 3])
    depth_sum = stitch(packed_img[..., n_color + 4])
    median = stitch(packed_img[..., n_color + 5])
    if opts.normalize_depth:
        depth = depth_sum / jnp.clip(alpha, 1e-10, None)
    else:
        depth = depth_sum

    # bins.spilled = globally-dropped + per-tile overflow past k_cap; the
    # kernel truncates at max_chunks*CHUNK (>= k_cap) instead, so replace
    # the k_cap tile-overflow term with the kernel's own — adding both
    # would double-count every overflowing intersection.
    tile_spill = jnp.sum(jnp.maximum(lens - k_cap, 0))
    kernel_spill = (
        jnp.sum(jnp.maximum(lens - max_chunks * CHUNK, 0)) - tile_spill
    )
    out = RenderOutput(
        color=color,
        alpha=alpha,
        depth=depth,
        median_depth=median,
        normal=normal,
        spilled=bins.spilled + kernel_spill.astype(jnp.int32),
    )
    meta = RenderMeta(proj=proj, bins=bins, width=camera.width,
                      height=camera.height, aligned_gid=aligned_gid)
    return out, meta


class RenderMeta(NamedTuple):
    """Side info for the densification strategy, mirroring the gsplat `info`
    dict keys consumed by the reference (utils/utils.py:19-33: width, height,
    radii, means2d, depths)."""

    proj: Projection
    bins: TileBins
    width: int
    height: int
    aligned_gid: Optional[jax.Array] = None


def pallas_sink_shape(width: int, height: int, n: int, opts: RenderOptions):
    """Shape of the per-intersection absgrad sink for the Pallas path
    (aligned layout: M + num_tiles * CHUNK columns).  Same argument order
    as :func:`absgrad_sink_shape` — the two are called side by side."""
    from .pallas.composite import CHUNK
    from .tiles import default_max_intersections

    m = opts.max_intersections or default_max_intersections(n)
    ts = opts.tile_size
    num_tiles = (-(-width // ts)) * (-(-height // ts))
    return (2, m + num_tiles * CHUNK)


def absgrad_sink_shape(width: int, height: int, n: int, opts: RenderOptions):
    ts = opts.tile_size
    ntx, nty = -(-width // ts), -(-height // ts)
    from .tiles import default_tile_capacity

    k = opts.tile_capacity or default_tile_capacity(n)
    return (ntx * nty, k, 2)


def render_tiled(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    camera: Camera,
    opts: RenderOptions = RenderOptions(),
    normals_world: Optional[jax.Array] = None,
    absgrad_sink: Optional[jax.Array] = None,
    tile_chunk: int = 64,
    alive_mask: Optional[jax.Array] = None,
) -> tuple[RenderOutput, RenderMeta]:
    """Render one camera with the tiled rasterizer.

    Args match :func:`core.golden.render_golden`; ``colors`` is [N, C] with
    SH already evaluated (C = 3 for RGB, 3 + latent_dim for rade-features).
    ``alive_mask`` (optional [N] bool) removes dead capacity-padding rows
    from binning entirely — they are already invisible (zero opacity), but
    without the mask they'd still consume intersection-buffer slots and
    tile-window capacity.

    Returns:
        (RenderOutput, RenderMeta).  ``RenderOutput.color`` has no background
        blended; maps are [H, W, ...] cropped to the camera size.
    """
    viewmat = camera.viewmat()
    proj = project_gaussians(
        means, quats, scales, viewmat, camera.K,
        camera.width, camera.height,
        eps2d=opts.eps2d, near_plane=opts.near_plane,
        far_plane=opts.far_plane, radius_clip=opts.radius_clip,
        opacities=opacities,
    )
    if alive_mask is not None:
        proj = proj._replace(valid=proj.valid & alive_mask)
    opac = opacities
    if opts.rasterize_mode == "antialiased":
        opac = opac * proj.compensation

    if normals_world is not None:
        normal_cam = normals_world @ viewmat[:3, :3].T
    else:
        normal_cam = proj.normal

    per_gauss = None
    if opts.remat_projection:
        # Build the packed matrix inside a remat boundary so the backward
        # recomputes the projection math instead of staging its ~16 saved
        # [N, 1] intermediates (see RenderOptions.remat_projection).  The
        # duplicate forward projection is CSE'd by XLA; the outer `proj`
        # then only feeds non-differentiable binning and strategy stats,
        # so cut its (dead) gradient path explicitly.
        def _pack(means, quats, scales, opacities, colors, normals_world,
                  viewmat):
            # opacities passed so the inner projection is HLO-identical to
            # the outer one (CSE merges the duplicates).
            pj = project_gaussians(
                means, quats, scales, viewmat, camera.K,
                camera.width, camera.height,
                eps2d=opts.eps2d, near_plane=opts.near_plane,
                far_plane=opts.far_plane, radius_clip=opts.radius_clip,
                opacities=opacities,
            )
            op = opacities
            if opts.rasterize_mode == "antialiased":
                op = op * pj.compensation
            if normals_world is not None:
                nc = normals_world @ viewmat[:3, :3].T
            else:
                nc = pj.normal
            return pack_per_gauss(pj, op, nc, colors)

        per_gauss = jax.checkpoint(_pack)(
            means, quats, scales, opacities, colors, normals_world, viewmat
        )
        proj = jax.tree.map(jax.lax.stop_gradient, proj)

    return render_from_projections(
        proj, opac, colors, normal_cam, camera, opts,
        absgrad_sink=absgrad_sink, tile_chunk=tile_chunk,
        per_gauss=per_gauss,
    )


def render_tiled_batch(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    cameras: Camera,
    opts: RenderOptions = RenderOptions(),
) -> RenderOutput:
    """Render a *batch* of cameras in one jitted program.

    ``cameras`` is a stacked :class:`Camera` (K [B,3,3], c2w [B,4,4], shared
    static width/height).  Cameras run sequentially under ``lax.map`` —
    one 720p camera already saturates a chip, and the hoisted per-camera
    intersection expansion (``g_full``, ~110 MB at 1M gaussians / 512
    capacity) would scale with B under vmap and OOM eval-all sweeps.
    The single-camera-per-step training contract of the reference
    (rade_gs_model.py:95) doesn't apply here: batched rendering serves
    eval-all sweeps, TSDF fusion, and single-host camera parallelism.
    """

    def one(kc):
        K, c2w = kc
        cam = Camera(K=K, c2w=c2w, width=cameras.width,
                     height=cameras.height)
        out, _ = render_tiled(means, quats, scales, opacities, colors, cam,
                              opts)
        return out

    return jax.lax.map(one, (cameras.K, cameras.c2w))


def render_from_projections(
    proj: Projection,
    opac: jax.Array,
    colors: jax.Array,
    normal_cam: jax.Array,
    camera: Camera,
    opts: RenderOptions = RenderOptions(),
    absgrad_sink: Optional[jax.Array] = None,
    tile_chunk: int = 64,
    per_gauss: Optional[jax.Array] = None,
) -> tuple[RenderOutput, RenderMeta]:
    """Binning + compositing from already-projected Gaussians.

    ``per_gauss`` optionally supplies the packed [N, 12+C] per-gaussian
    matrix (columns: mean2d, conic, depth, plane, opac, normal, colors);
    when given, ``proj``/``opac``/``normal_cam`` feed only the
    (non-differentiable) binning — used by the remat-projection path in
    :func:`render_tiled`.

    Split out of :func:`render_tiled` so the projection phase can run
    gaussian-sharded across a device mesh (each device projects its shard,
    projections are all-gathered — arrays far smaller than the raw
    parameters' SH coefficients — and compositing proceeds locally;
    the all-gather's backward is the reduce-scatter that routes pixel
    gradients back to each Gaussian's owner).  See parallel/train.py.
    """
    bins = bin_gaussians(proj, camera.width, camera.height, opts,
                         opacities=jax.lax.stop_gradient(opac))
    ts = opts.tile_size
    ntx, nty = bins.num_tiles_x, bins.num_tiles_y
    num_tiles = ntx * nty
    k_cap = bins.tile_gauss.shape[1]
    c_dim = (per_gauss.shape[1] - PG_FIXED) if per_gauss is not None \
        else colors.shape[-1]

    # Pad the tile axis to a multiple of the chunk size.
    tile_chunk = min(tile_chunk, num_tiles)
    n_chunks = -(-num_tiles // tile_chunk)
    t_pad = n_chunks * tile_chunk
    pad_t = t_pad - num_tiles
    tile_gauss = jnp.pad(bins.tile_gauss, ((0, pad_t), (0, 0)))
    tile_mask = jnp.pad(bins.tile_mask, ((0, pad_t), (0, 0)))
    if absgrad_sink is None:
        sink = None
    else:
        sink = jnp.pad(absgrad_sink, ((0, pad_t), (0, 0), (0, 0)))

    p = ts * ts
    px_u = (jnp.arange(p, dtype=jnp.float32) % ts) + 0.5
    px_v = (jnp.arange(p, dtype=jnp.float32) // ts) + 0.5
    tile_ids = jnp.arange(t_pad, dtype=jnp.int32)

    # One packed per-gaussian matrix so the expansion is a single *row*
    # gather instead of seven 1-D gathers (1-D gathers are ~10x slower per
    # element on TPU — see the binning profile note in ops/tiles.py).
    if per_gauss is None:
        per_gauss = pack_per_gauss(proj, opac, normal_cam, colors)
    # Gather ONCE outside the chunk loop; chunks take contiguous slices.
    # Profiled at 1M/720p: an in-loop per-chunk gather costs its 0.7 ms
    # again in the remat backward, and its transpose is 57 separate
    # per-chunk reductions; hoisted, the remat re-gather disappears
    # (g_full is a saved residual) and the in-loop slice transposes are
    # contiguous dynamic-update-slices.
    #
    # Masked and padded slots all clip to the same few rows (ops/tiles.py
    # clips the window to the segment end; tile padding is zeros).  Their
    # cotangents are exactly zero — every gradient chain is gated by the
    # tile mask — so spreading them uniformly keeps every index in range
    # without concentrating dead rows.  expand_rows = table[idx] with a
    # sorted-segment-sum backward: a plain gather's AD transpose is a
    # [1.8M, 15] -> [N, 15] scatter-add that profiled at 146 ms/step (half
    # the train step); the segment-sum backward (payload sort + blocked
    # cumsum + one monotone boundary gather) is ~3x cheaper.
    flat_idx = spread_masked(
        tile_gauss.reshape(-1), tile_mask.reshape(-1), per_gauss.shape[0]
    )
    g_full = expand_rows(per_gauss, flat_idx, per_gauss.shape[0]).reshape(
        t_pad, k_cap, per_gauss.shape[1]
    )

    use_pallas_batched = opts.pallas_batched and (
        opts.pallas_interpret or jax.default_backend() == "tpu")
    if opts.fused_vjp and use_pallas_batched:
        tile_mask_f = tile_mask.astype(g_full.dtype)
        snk_full = sink if sink is not None \
            else jnp.zeros((t_pad, k_cap, 2), g_full.dtype)
        f = _pallas_fused(opts.near_plane, ntx, ts, opts.pallas_interpret,
                          tile_chunk, pallas_bwd=opts.pallas_batched_bwd)
        out_v, alpha, depth_acc, median = f(g_full, snk_full, tile_mask_f)
        normal = out_v[..., :3]
        color = out_v[..., 3:]
        if opts.normalize_depth:
            depth = depth_acc / jnp.clip(alpha, 1e-10, None)
        else:
            depth = depth_acc
        # _stitch_outputs expects per-chunk stacking; fold the tile axis.
        def chunked(x):
            return x.reshape((n_chunks, tile_chunk) + x.shape[1:])
        return _stitch_outputs(
            chunked(color), chunked(alpha), chunked(depth), chunked(median),
            chunked(normal), bins, proj, camera,
            num_tiles, t_pad, p, ts, ntx, nty)

    if opts.fused_vjp:
        from ..core.compositing import fused_compositor

        fused = fused_compositor(opts.near_plane)
        tile_mask_f = tile_mask.astype(g_full.dtype)

        def chunk_body_fused(start):
            msk = jax.lax.dynamic_slice(
                tile_mask_f, (start, 0), (tile_chunk, k_cap))
            tid = jax.lax.dynamic_slice(tile_ids, (start,), (tile_chunk,))
            g = jax.lax.dynamic_slice(
                g_full, (start, 0, 0), (tile_chunk, k_cap, g_full.shape[2]))
            if sink is None:
                snk = jnp.zeros((tile_chunk, k_cap, 2), g.dtype)
            else:
                snk = jax.lax.dynamic_slice(
                    sink, (start, 0, 0), (tile_chunk, k_cap, 2))
            txc = (tid % ntx).astype(jnp.float32)
            tyc = (tid // ntx).astype(jnp.float32)
            up = txc[:, None] * ts + px_u[None, :]
            vp = tyc[:, None] * ts + px_v[None, :]
            out_v, alpha_out, depth_acc, median = fused(g, snk, msk, up, vp)
            # out_v channel order follows g's value columns: normal ++ colors.
            normal = out_v[..., :3]
            color = out_v[..., 3:]
            if opts.normalize_depth:
                depth_out = depth_acc / jnp.clip(alpha_out, 1e-10, None)
            else:
                depth_out = depth_acc
            return color, alpha_out, depth_out, median, normal

        starts = jnp.arange(n_chunks, dtype=jnp.int32) * tile_chunk
        color, alpha, depth, median, normal = jax.lax.map(
            chunk_body_fused, starts)
        return _stitch_outputs(
            color, alpha, depth, median, normal, bins, proj, camera,
            num_tiles, t_pad, p, ts, ntx, nty)

    def chunk_body(start):
        msk = jax.lax.dynamic_slice(tile_mask, (start, 0), (tile_chunk, k_cap))
        tid = jax.lax.dynamic_slice(tile_ids, (start,), (tile_chunk,))

        g = jax.lax.dynamic_slice(                       # [TC, K, 12+C]
            g_full, (start, 0, 0),
            (tile_chunk, k_cap, g_full.shape[2]),
        )
        mean2d_g = g[..., PG_MEAN2D]
        if sink is not None:
            mean2d_g = mean2d_g + jax.lax.dynamic_slice(
                sink, (start, 0, 0), (tile_chunk, k_cap, 2)
            )
        conic_g = g[..., PG_CONIC]
        depth_g = g[..., PG_DEPTH]
        plane_g = g[..., PG_PLANE]
        opac_g = g[..., PG_OPAC]
        normal_g = g[..., PG_NORMAL]
        colors_g = g[..., PG_COLORS]

        txc = (tid % ntx).astype(jnp.float32)
        tyc = (tid // ntx).astype(jnp.float32)
        up = txc[:, None] * ts + px_u[None, :]           # [TC, P]
        vp = tyc[:, None] * ts + px_v[None, :]

        du = up[:, :, None] - mean2d_g[:, None, :, 0]    # [TC, P, K]
        dv = vp[:, :, None] - mean2d_g[:, None, :, 1]
        alphas = splat_alpha(
            du, dv, conic_g[:, None], opac_g[:, None], msk[:, None]
        )
        t_pix = depth_g[:, None, :] \
            + plane_g[:, None, :, 0] * du + plane_g[:, None, :, 1] * dv
        t_pix = jnp.clip(t_pix, opts.near_plane, None)
        # One fused composite with the analytic suffix-sum backward
        # (core/compositing.composite_chunk); colors and normals ride the
        # same einsum.
        vals = jnp.concatenate([colors_g, normal_g], axis=-1)
        out_v, alpha_out, depth_acc, median = composite_chunk(
            alphas, t_pix, vals
        )
        color = out_v[..., :c_dim]
        normal = out_v[..., c_dim:]
        if opts.normalize_depth:
            depth_out = depth_acc / jnp.clip(alpha_out, 1e-10, None)
        else:
            depth_out = depth_acc
        return color, alpha_out, depth_out, median, normal

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * tile_chunk
    if opts.remat_compositing:
        body = jax.checkpoint(chunk_body)
    else:
        # Pin exactly the analytic-VJP residuals (named in
        # core/compositing._composite_chunk_fwd) across the loop; everything
        # else is still rematted.  An un-checkpointed body keeps EVERY
        # [T,P,K] intermediate (du/dv/sigma/scan stages) live between the
        # forward and backward loops — measured 24.2 GB at 1M/720p, an HBM
        # OOM on v5e — while the named residuals are ~5.4 GB.
        body = jax.checkpoint(
            chunk_body,
            policy=jax.checkpoint_policies.save_only_these_names(
                "composite_residuals"
            ),
        )
    color, alpha, depth, median, normal = jax.lax.map(body, starts)
    return _stitch_outputs(
        color, alpha, depth, median, normal, bins, proj, camera,
        num_tiles, t_pad, p, ts, ntx, nty)


import functools


@functools.lru_cache(maxsize=None)
def _pallas_fused(near_plane: float, ntx: int, ts: int, interpret: bool,
                  tile_chunk: int, pallas_bwd: bool = True):
    """Custom VJP pairing the batched Pallas compositing forward
    (ops/pallas/batched.py: whole-image kernel, VMEM-resident chain, value
    einsum fused in — no [T,P,K] HBM tensor anywhere) with either the
    batched Pallas backward (ops/pallas/batched_bwd.py: back-to-front
    suffix walk, VMEM-resident, writes only per-splat moments) or the
    chunked XLA moment backward (core/compositing.fused_bwd_from_g)."""
    from ..core.compositing import fused_bwd_from_g, moments_to_dg
    from .pallas.batched import composite_batched_fwd

    p = ts * ts

    def _forward(g_full, sink, msk):
        g_geo = g_full[..., :9].at[..., 0:2].add(sink)
        g_t = jnp.moveaxis(g_geo, -1, 0)               # [9, T_pad, K]
        vals_t = jnp.moveaxis(g_full[..., 9:], -1, 0)  # [V, T_pad, K]
        out_vt, alpha, depth_acc, median, idx, blk_cum = \
            composite_batched_fwd(
                g_t, vals_t, msk, ntx=ntx, ts=ts, near_plane=near_plane,
                interpret=interpret)
        out_v = jnp.moveaxis(out_vt, 0, -1)            # [T_pad, P, V]
        return (out_v, alpha, depth_acc, median), idx, blk_cum

    @jax.custom_vjp
    def f(g_full, sink, msk):
        out, _, _ = _forward(g_full, sink, msk)
        return out

    def fwd(g_full, sink, msk):
        out, idx, blk_cum = _forward(g_full, sink, msk)
        t_total = 1.0 - out[1]
        return out, (g_full, sink, msk, idx, t_total, blk_cum)

    def bwd_pallas(res, cot):
        from .pallas.batched_bwd import composite_batched_bwd

        g_full, sink, msk, idx, t_total, blk_cum = res
        t_pad, k_cap = msk.shape
        g_v, g_alpha, g_depth, g_med = cot
        g_geo = g_full[..., :9].at[..., 0:2].add(sink)
        s6, t3, d_opac, d_vals = composite_batched_bwd(
            jnp.moveaxis(g_geo, -1, 0),
            jnp.moveaxis(g_full[..., 9:], -1, 0),
            msk, blk_cum,
            jnp.moveaxis(g_v, -1, 0),
            g_alpha, g_depth, g_med, idx, t_total,
            ntx=ntx, ts=ts, near_plane=near_plane, interpret=interpret)
        tid = jnp.arange(t_pad, dtype=jnp.int32)
        u0 = ((tid % ntx) * ts).astype(jnp.float32)[:, None] + 0.5
        v0 = ((tid // ntx) * ts).astype(jnp.float32)[:, None] + 0.5
        d_g, d_sink = moments_to_dg(
            g_full, sink, jnp.moveaxis(s6, 0, -1), jnp.moveaxis(t3, 0, -1),
            d_opac, jnp.moveaxis(d_vals, 0, -1), u0, v0)
        return d_g, d_sink, jnp.zeros_like(msk)

    def bwd_xla(res, cot):
        g_full, sink, msk, idx, t_total, blk_cum = res
        t_pad, k_cap = msk.shape
        n_chunks = t_pad // tile_chunk
        tile_ids = jnp.arange(t_pad, dtype=jnp.int32)
        px_u = (jnp.arange(p, dtype=jnp.float32) % ts) + 0.5
        px_v = (jnp.arange(p, dtype=jnp.float32) // ts) + 0.5

        def body(start):
            def sl(x):
                return jax.lax.dynamic_slice_in_dim(x, start, tile_chunk, 0)

            tid = jax.lax.dynamic_slice(tile_ids, (start,), (tile_chunk,))
            txc = (tid % ntx).astype(jnp.float32)
            tyc = (tid // ntx).astype(jnp.float32)
            up = txc[:, None] * ts + px_u[None, :]
            vp = tyc[:, None] * ts + px_v[None, :]
            ct = tuple(sl(c) for c in cot)
            return fused_bwd_from_g(
                sl(g_full), sl(sink), sl(msk), up, vp, sl(idx),
                sl(t_total), ct, near_plane)

        starts = jnp.arange(n_chunks, dtype=jnp.int32) * tile_chunk
        d_g, d_sink = jax.lax.map(body, starts)
        d = g_full.shape[-1]
        return (d_g.reshape(t_pad, k_cap, d),
                d_sink.reshape(t_pad, k_cap, 2), jnp.zeros_like(msk))

    f.defvjp(fwd, bwd_pallas if pallas_bwd else bwd_xla)
    return f


def _stitch_outputs(color, alpha, depth, median, normal, bins, proj, camera,
                    num_tiles, t_pad, p, ts, ntx, nty):
    """Reassemble per-chunk packed tile maps into full [H, W, ...] images."""

    def stitch(x):
        # [n_chunks, TC, P, ...] -> [H, W, ...]
        ch = x.shape[3:]
        x = x.reshape((t_pad, p) + ch)[:num_tiles]
        x = x.reshape((nty, ntx, ts, ts) + ch)
        x = jnp.swapaxes(x, 1, 2).reshape((nty * ts, ntx * ts) + ch)
        return x[: camera.height, : camera.width]

    out = RenderOutput(
        color=stitch(color),
        alpha=stitch(alpha),
        depth=stitch(depth),
        median_depth=stitch(median),
        normal=stitch(normal),
        spilled=bins.spilled,
    )
    meta = RenderMeta(proj=proj, bins=bins, width=camera.width,
                      height=camera.height)
    return out, meta
