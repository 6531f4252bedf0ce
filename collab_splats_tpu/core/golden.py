"""Golden reference renderer: exact, naive O(N * pixels) compositing.

This is the semantic specification for every production kernel (SURVEY.md §7
layer 1): a pure-`jnp`, fully differentiable renderer that evaluates *all*
Gaussians at *every* pixel (subject to the same tile-membership and alpha
cutoffs the tiled rasterizer applies, so the two agree exactly up to
per-tile capacity truncation and float associativity).

Slow by design — used for unit tests, finite-difference gradient checks, and
CPU-toy parity runs; never on the training hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .cameras import Camera
from .compositing import composite, splat_alpha
from .options import RenderOptions
from .projection import Projection, project_gaussians


class RenderOutput(NamedTuple):
    """Rendered maps, mirroring the reference's rasterization 6-tuple
    (rade_gs_model.py:439-465) minus the meta dict."""

    color: jax.Array         # [H, W, C]
    alpha: jax.Array         # [H, W]
    depth: jax.Array         # [H, W] expected depth
    median_depth: jax.Array  # [H, W]
    normal: jax.Array        # [H, W, 3] camera-space
    spilled: jax.Array       # [] int32: splats dropped by capacity limits


def _prepare(proj: Projection, opacities: jax.Array, opts: RenderOptions):
    """Depth-sort and apply antialias compensation. Returns (order, opac)."""
    opac = opacities
    if opts.rasterize_mode == "antialiased":
        opac = opac * proj.compensation
    sort_depth = jnp.where(proj.valid, proj.depth, jnp.inf)
    order = jnp.argsort(sort_depth)
    return order, opac


def render_golden(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    opacities: jax.Array,
    colors: jax.Array,
    normals_world: jax.Array | None,
    camera: Camera,
    opts: RenderOptions = RenderOptions(),
) -> RenderOutput:
    """Render one camera naively.

    Args:
        means: [N, 3] world positions.
        quats: [N, 4] wxyz orientations.
        scales: [N, 3] linear scales.
        opacities: [N] activated opacities in [0, 1].
        colors: [N, C] per-Gaussian colors/features (SH already evaluated).
        normals_world: optional [N, 3] world-space normals to composite
            instead of the RaDe plane-derived camera-space normals (unused by
            default; pass None).
        camera: the camera.
        opts: static options.

    Returns:
        :class:`RenderOutput` (color has no background blended in).
    """
    viewmat = camera.viewmat()
    proj = project_gaussians(
        means, quats, scales, viewmat, camera.K,
        camera.width, camera.height,
        eps2d=opts.eps2d, near_plane=opts.near_plane,
        far_plane=opts.far_plane, radius_clip=opts.radius_clip,
    )
    order, opac = _prepare(proj, opacities, opts)

    if normals_world is not None:
        R_wc = viewmat[:3, :3]
        normal_cam = normals_world @ R_wc.T
    else:
        normal_cam = proj.normal

    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    depth = proj.depth[order]
    plane = proj.plane[order]
    radius = proj.radius[order]
    valid = proj.valid[order]
    opac = opac[order]
    cols = colors[order]
    norms = normal_cam[order]

    ts = opts.tile_size
    # Gaussian tile bbox (inclusive): floor((mean2d +- radius) / ts) with
    # the max-eigenvalue square radius.  Production binning
    # (ops/tiles.tile_bbox) uses the tighter per-axis radius_xy — a strict
    # subset whose excluded tiles contribute exactly zero (alpha cutoff),
    # so the golden's wider membership renders identically and stays a
    # one-formula spec.
    tx0 = jnp.floor((mean2d[:, 0] - radius) / ts)
    ty0 = jnp.floor((mean2d[:, 1] - radius) / ts)
    tx1 = jnp.floor((mean2d[:, 0] + radius) / ts)
    ty1 = jnp.floor((mean2d[:, 1] + radius) / ts)

    H, W = camera.height, camera.width
    u = jnp.arange(W, dtype=jnp.float32) + 0.5
    v = jnp.arange(H, dtype=jnp.float32) + 0.5

    rows_per_chunk = max(1, min(H, 2 ** 22 // max(W * means.shape[0], 1) + 1))
    # Round H up into equal chunks.
    n_chunks = -(-H // rows_per_chunk)
    pad_h = n_chunks * rows_per_chunk

    def render_rows(row0):
        vs = jax.lax.dynamic_slice(
            jnp.pad(v, (0, pad_h - H), constant_values=1e9),
            (row0,), (rows_per_chunk,)
        )
        # [R, W, N] offsets.
        du = u[None, :, None] - mean2d[None, None, :, 0]
        du = jnp.broadcast_to(du, (rows_per_chunk, W, mean2d.shape[0]))
        dv = vs[:, None, None] - mean2d[None, None, :, 1]
        dv = jnp.broadcast_to(dv, du.shape)
        # Tile membership of this pixel for each gaussian.
        ptx = jnp.floor(u / ts)[None, :, None]
        pty = jnp.floor(vs / ts)[:, None, None]
        member = (
            (ptx >= tx0[None, None, :]) & (ptx <= tx1[None, None, :])
            & (pty >= ty0[None, None, :]) & (pty <= ty1[None, None, :])
        )
        mask = member & valid[None, None, :]
        alphas = splat_alpha(du, dv, conic[None, None], opac[None, None], mask)
        t_pix = depth[None, None, :] + plane[None, None, :, 0] * du \
            + plane[None, None, :, 1] * dv
        t_pix = jnp.clip(t_pix, opts.near_plane, None)
        out = composite(
            alphas, t_pix,
            jnp.broadcast_to(cols[None, None], (rows_per_chunk, W) + cols.shape),
            jnp.broadcast_to(norms[None, None], (rows_per_chunk, W) + norms.shape),
            normalize_depth=opts.normalize_depth,
        )
        return out.color, out.alpha, out.depth, out.median_depth, out.normal

    row_starts = jnp.arange(n_chunks) * rows_per_chunk
    color, alpha, depth_im, median, normal = jax.lax.map(render_rows, row_starts)

    def unchunk(x):
        return x.reshape((pad_h,) + x.shape[2:])[:H]

    return RenderOutput(
        color=unchunk(color),
        alpha=unchunk(alpha),
        depth=unchunk(depth_im),
        median_depth=unchunk(median),
        normal=unchunk(normal),
        spilled=jnp.zeros((), jnp.int32),
    )
