"""Tile binning: map projected Gaussians to per-tile, depth-ordered lists.

TPU-native replacement for gsplat's tile-intersection + CUB radix-sort stage
(SURVEY.md §2b N1).  The GPU version builds a dynamically sized
(tile, depth)-keyed list with device radix sort; under XLA everything must be
static-shaped, so we:

1. compute each Gaussian's tile-bbox intersection count,
2. expand into a **fixed-capacity** intersection buffer via an exclusive
   cumsum + ``searchsorted`` slot->gaussian inversion (no scatter with
   dynamic extents),
3. lexicographically sort (tile_id, depth) with ``jax.lax.sort``,
4. cut per-tile windows of at most ``tile_capacity`` front-most splats with a
   second ``searchsorted``.

Capacity overflows never corrupt results: whole Gaussians that don't fit the
global buffer are dropped and counted, and per-tile overflow beyond
``tile_capacity`` drops the *farthest* splats (those are occluded in
practice).  The ``spilled`` counter makes truncation observable (SURVEY.md §7
"cap + spill statistics").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.options import RenderOptions
from ..core.projection import Projection


class TileBins(NamedTuple):
    tile_gauss: jax.Array   # [T, K] int32 gaussian index, front-to-back
    tile_mask: jax.Array    # [T, K] bool validity
    num_tiles_x: int
    num_tiles_y: int
    spilled: jax.Array      # [] int32 dropped intersections (global + per-tile)
    sorted_gid: jax.Array   # [M] int32 gaussian ids sorted by (tile, depth)
    starts: jax.Array       # [T+1] int32 segment starts into sorted_gid


def default_max_intersections(n: int) -> int:
    return int(min(max(8 * n, 1 << 15), 1 << 24))


def default_tile_capacity(n: int) -> int:
    cap = 1 << 9  # 512
    while cap > 8 and cap > 2 * n:
        cap //= 2
    return cap


def align_segments(
    bounds: jax.Array,
    sorted_gid: jax.Array,
    chunk: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Re-lay the sorted intersection list so every tile's segment starts on
    a ``chunk`` boundary (Mosaic DMA offsets must be lane-aligned).

    Args:
        bounds: [T+1] tight segment bounds into ``sorted_gid``.
        sorted_gid: [M] gaussian ids sorted by (tile, depth).
        chunk: alignment quantum (the kernel's CHUNK).

    Returns:
        (aligned_gid [M + T*chunk], aligned_starts [T+1] all multiples of
        ``chunk``, lens [T] true per-tile lengths).  Padding slots replicate
        id 0; the kernel masks lanes beyond ``lens``.
    """
    num_tiles = bounds.shape[0] - 1
    m = sorted_gid.shape[0]
    lens = bounds[1:] - bounds[:-1]
    padded = -(-lens // chunk) * chunk
    aligned_starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)]
    )
    m_al = m + num_tiles * chunk
    slots = jnp.arange(m_al, dtype=jnp.int32)
    t = jnp.clip(
        jnp.searchsorted(aligned_starts, slots, side="right").astype(jnp.int32)
        - 1,
        0, num_tiles - 1,
    )
    r = slots - aligned_starts[t]
    valid = r < lens[t]
    src = jnp.clip(bounds[t] + r, 0, m - 1)
    aligned_gid = jnp.where(valid, sorted_gid[src], 0)
    return aligned_gid, aligned_starts, lens


def windowed_gather(src: jax.Array, starts: jax.Array, k_cap: int,
                    block: int = 32) -> jax.Array:
    """Gather contiguous windows ``src[starts[t] : starts[t] + k_cap]`` for
    every ``t`` — the tile-capacity window cut — without an element gather.

    An element gather of the [T, K] window costs ~5-7 device cycles per
    *row* regardless of width (profiled: 13 ms for 1.8M elements at
    1M/720p).  Because each window is a contiguous range, a window can be
    assembled from ``block``-wide rows of ``src`` instead: every output
    block spans exactly two consecutive source rows (the in-row offset
    ``starts[t] % block`` is constant per tile), so the gather shrinks to
    ``2 * T * K/block`` rows, and the per-lane shift is ``block`` static
    slices + integer selects on the VPU.  (A one-hot reduction formulation
    was measured to be miscompiled on TPU: XLA rewrites the int32
    select-sum as a bf16 MXU matmul, quantizing ids above 2**8 — so the
    shift must stay select-only, with no reduction XLA can matmul-ify.)

    Args:
        src: [M] int32 values (gaussian ids: < 2**24).
        starts: [T] window start offsets into ``src`` (any alignment).
        k_cap: window length (multiple of ``block``).

    Returns:
        [T, k_cap] gathered values; lanes past the end of ``src`` read
        padding zeros (callers mask with ``win < ends`` as before).
    """
    while k_cap % block and block > 1:
        block //= 2
    m = src.shape[0]
    t = starts.shape[0]
    j = k_cap // block
    rows = -(-m // block) + (k_cap // block) + 1
    src_w = jnp.pad(src, (0, rows * block - m)).reshape(rows, block)

    off = (starts % block).astype(jnp.int32)                     # [T]
    base_row = starts // block                                   # [T]
    r0 = base_row[:, None] + jnp.arange(j, dtype=jnp.int32)[None, :]
    r0 = jnp.clip(r0, 0, rows - 2)
    pair = jnp.concatenate([src_w[r0], src_w[r0 + 1]], axis=-1)  # [T, J, 2B]
    # Shift: out[t, j, w] = pair[t, j, off[t] + w].  One static slice per
    # possible offset, merged with integer selects (exact; see docstring).
    out = jax.lax.slice_in_dim(pair, 0, block, axis=2)           # [T, J, B]
    for s in range(1, block):
        shifted = jax.lax.slice_in_dim(pair, s, s + block, axis=2)
        out = jnp.where(off[:, None, None] == s, shifted, out)
    return out.reshape(t, k_cap)


def tile_bbox(proj: Projection, num_tiles_x: int, num_tiles_y: int, tile_size: int):
    """Inclusive tile-coordinate bbox per Gaussian, clamped to the grid.

    Uses the per-axis half-extents ``radius_xy`` (core/projection.py): the
    exact axis-aligned bounds of the alpha >= 1/255 ellipse, so the bbox is
    tighter than gsplat's max-eigenvalue square for anisotropic splats with
    bit-identical rendering (outside contributions are zeroed by
    ``splat_alpha``'s cutoff anyway)."""
    u, v = proj.mean2d[:, 0], proj.mean2d[:, 1]
    rx = proj.radius_xy[:, 0]
    ry = proj.radius_xy[:, 1]
    tx0 = jnp.clip(jnp.floor((u - rx) / tile_size), 0, num_tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((v - ry) / tile_size), 0, num_tiles_y - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((u + rx) / tile_size), 0, num_tiles_x - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((v + ry) / tile_size), 0, num_tiles_y - 1).astype(jnp.int32)
    return tx0, ty0, tx1, ty1


def _min_sigma_rect(mean_u, mean_v, a, b, c, u0, u1, v0, v1):
    """Exact min of sigma(du, dv) = .5(a du² + c dv²) + b du dv over the
    rectangle [u0,u1]x[v0,v1] (pixel coords).

    The unconstrained minimum (the splat center) has sigma = 0; when the
    center lies outside the rect the constrained minimum is on one of the 4
    edges, where one variable is fixed and the 1-D quadratic minimizer is
    clamped to the segment.  Used by the binning ellipse cull: a tile whose
    min sigma exceeds log(opac/ALPHA_CUTOFF) receives zero alpha at every
    pixel (splat_alpha's cutoff), so the (gaussian, tile) entry is spurious.
    """
    du0, du1 = u0 - mean_u, u1 - mean_u
    dv0, dv1 = v0 - mean_v, v1 - mean_v
    inside = (du0 <= 0) & (du1 >= 0) & (dv0 <= 0) & (dv1 >= 0)

    def sig(du, dv):
        return 0.5 * (a * du * du + c * dv * dv) + b * du * dv

    c_safe = jnp.maximum(c, 1e-12)
    a_safe = jnp.maximum(a, 1e-12)
    best = jnp.minimum(
        jnp.minimum(
            sig(du0, jnp.clip(-b * du0 / c_safe, dv0, dv1)),
            sig(du1, jnp.clip(-b * du1 / c_safe, dv0, dv1)),
        ),
        jnp.minimum(
            sig(jnp.clip(-b * dv0 / a_safe, du0, du1), dv0),
            sig(jnp.clip(-b * dv1 / a_safe, du0, du1), dv1),
        ),
    )
    return jnp.where(inside, 0.0, best)


def bin_gaussians(
    proj: Projection,
    width: int,
    height: int,
    opts: RenderOptions,
    opacities: jax.Array | None = None,
) -> TileBins:
    """Build per-tile depth-ordered Gaussian lists with static shapes.

    TPU-tuned pipeline (the binning sort dominated the first-cut renderer):

    * depth order is converted to integer *ranks* (one N-argsort) and fused
      with the tile id into a single 31-bit key, so the big M-sized sort is
      a single-key int32 sort with one payload instead of a two-key
      three-operand variadic sort;
    * the slot->gaussian expansion is a scatter of N seeds + a cumulative
      max (associative scan) instead of an M x log(N) binary-search gather.

    Ordering is exact while ``N <= 2^(31 - ceil(log2(T+2)))`` (e.g. 512k
    Gaussians at 720p); beyond that, neighboring-depth ranks may tie and
    tie order is arbitrary — the same depth-precision regime where the CUDA
    radix sort's float keys also stop discriminating.
    """
    n = proj.depth.shape[0]
    ts = opts.tile_size
    ntx = -(-width // ts)
    nty = -(-height // ts)
    num_tiles = ntx * nty
    m_cap = opts.max_intersections or default_max_intersections(n)
    k_cap = opts.tile_capacity or default_tile_capacity(n)

    tx0, ty0, tx1, ty1 = tile_bbox(proj, ntx, nty, ts)
    ncols = tx1 - tx0 + 1
    nrows = ty1 - ty0 + 1
    counts = jnp.where(proj.valid, ncols * nrows, 0).astype(jnp.int32)

    # Conservatively drop whole Gaussians that would overflow the global
    # buffer.  The raw count total can exceed int32 (1M gaussians whose
    # radii balloon can cover the full grid: sum ~ 3.6e9), so the FIRST
    # pass runs in f32 — exact as integers until the cumulative exceeds
    # 2^24 >= m_cap, monotone afterwards, so the keep cut is sound — and
    # the exact int32 offsets are recomputed over kept counts only (their
    # sum is <= ~m_cap by construction), with a final exact guard for the
    # few boundary rows the f32 pass may have mis-kept.
    approx_incl = jnp.cumsum(counts.astype(jnp.float32))
    keep0 = approx_incl <= float(m_cap)
    counts_kept = jnp.where(keep0, counts, 0)
    offsets = jnp.cumsum(counts_kept) - counts_kept
    keep = keep0 & (offsets + counts_kept <= m_cap)
    dropped_f = jnp.sum(counts.astype(jnp.float32)) - jnp.sum(
        jnp.where(keep, counts, 0).astype(jnp.float32)
    )
    dropped = jnp.minimum(dropped_f, 2.0e9).astype(jnp.int32)
    counts = jnp.where(keep, counts, 0)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1] if n > 0 else jnp.zeros((), jnp.int32)

    # Depth ordering: exact global ranks (one N-sort), or quantized
    # log-depth keys (opts.exact_binning=False skips the N-sort entirely;
    # within-tile ordering of near-equal depths becomes arbitrary).
    tile_bits_est = max(int(np.ceil(np.log2(num_tiles + 2))), 1)
    rank_bits_est = 31 - tile_bits_est
    if opts.exact_binning:
        order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
        rank = (
            jnp.zeros((n,), jnp.int32)
            .at[order]
            .set(jnp.arange(n, dtype=jnp.int32), unique_indices=True)
        )
    else:
        # Clamp quantized levels to 2^24-1 even when the key budget allows
        # more (few tiles -> rank_bits_est up to 30): the Pallas decode
        # kernel carries every integer field as f32, which is only exact
        # below 2^24 — a rank rounding up at 2^25 would overflow into the
        # tile bits and bin the splat into the wrong tile (ADVICE r4).
        # 24 bits of log-depth quantization is far below float32 depth
        # discrimination anyway, so the XLA path loses nothing.
        levels = (1 << min(rank_bits_est, 24)) - 1
        log_d = jnp.log(jnp.clip(proj.depth, opts.near_plane, opts.far_plane))
        lo = jnp.log(opts.near_plane)
        hi = jnp.log(jnp.minimum(opts.far_plane, 1e6))
        rank = (
            jnp.clip((log_d - lo) / (hi - lo), 0.0, 1.0) * levels
        ).astype(jnp.int32)

    # Rank column, pre-shifted to fit the key budget under exact binning.
    tile_bits = tile_bits_est
    rank_bits = rank_bits_est
    r_all = rank
    if opts.exact_binning:
        n_bits = max(int(np.ceil(np.log2(max(n, 2)))), 1)
        if n_bits > rank_bits:
            r_all = r_all >> (n_bits - rank_bits)

    if _use_pallas_binning(n, m_cap, opts):
        key, gid = _decode_keys_pallas(
            proj, opts, counts, offsets, r_all, n, m_cap,
            ntx, ts, num_tiles, rank_bits, opacities,
        )
        sorted_key, sorted_gid = jax.lax.sort((key, gid), num_keys=1)
        return _windows_from_sorted(
            sorted_key, sorted_gid, num_tiles, rank_bits, ntx, nty,
            k_cap, m_cap, dropped,
        )

    # Invert slot -> gaussian: scatter each gaussian's index at its first
    # slot, then forward-fill with a cumulative max.
    seed_pos = jnp.where(counts > 0, offsets, m_cap)
    seed = (
        jnp.full((m_cap,), -1, jnp.int32)
        .at[seed_pos]
        .max(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    gid = jax.lax.associative_scan(jnp.maximum, seed)
    slots = jnp.arange(m_cap, dtype=jnp.int32)
    slot_valid = (slots < total) & (gid >= 0)
    gid = jnp.clip(gid, 0, max(n - 1, 0))

    # One *row* gather for every per-gaussian field the expansion needs:
    # five separate 1-D gathers of M elements cost 18-49 ms EACH on TPU
    # (profiled), while a single [M, D] row gather is ~10x cheaper — and
    # row-gather cost is per ROW, not per element, so the ellipse-cull
    # columns below (f32 bitcast into the int32 matrix) ride along ~free.
    cols = [offsets, ncols, ty0 * ntx + tx0, r_all]
    if opts.ellipse_cull:
        # Cull threshold: entries with min-over-tile sigma above
        # log(opac / ALPHA_CUTOFF) contribute exactly 0 alpha at every
        # pixel of the tile (splat_alpha zeroes them), so dropping them
        # changes no output and frees tile-window slots.  With no
        # opacities given, opac = 1 is a valid (weaker) upper bound.
        from ..core.compositing import ALPHA_CUTOFF

        if opacities is None:
            thresh = jnp.full((n,), -np.log(ALPHA_CUTOFF), jnp.float32)
        else:
            thresh = jnp.log(
                jnp.clip(opacities / ALPHA_CUTOFF, 1e-12, None))
        bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.int32)  # noqa: E731
        cols += [bc(proj.mean2d[:, 0]), bc(proj.mean2d[:, 1]),
                 bc(proj.conic[:, 0]), bc(proj.conic[:, 1]),
                 bc(proj.conic[:, 2]), bc(thresh)]
    packed = jnp.stack(cols, axis=1)                    # [N, 4(+6)]
    g = packed[gid]                                     # [M, 4(+6)]
    local = slots - g[:, 0]
    g_ncols = g[:, 1]
    dy = local // g_ncols
    dx = local - dy * g_ncols
    tile_id = g[:, 2] + dy * ntx + dx
    r = g[:, 3]
    key = (tile_id << rank_bits) | r
    keep_slot = slot_valid
    if opts.ellipse_cull:
        fc = lambda x: jax.lax.bitcast_convert_type(x, jnp.float32)  # noqa: E731
        tx = (tile_id % ntx).astype(jnp.float32) * ts
        ty = (tile_id // ntx).astype(jnp.float32) * ts
        min_sig = _min_sigma_rect(
            fc(g[:, 4]), fc(g[:, 5]), fc(g[:, 6]), fc(g[:, 7]), fc(g[:, 8]),
            tx, tx + ts, ty, ty + ts,
        )
        keep_slot = keep_slot & (min_sig <= fc(g[:, 9]))
    key = jnp.where(keep_slot, key, num_tiles << rank_bits)

    sorted_key, sorted_gid = jax.lax.sort((key, gid), num_keys=1)
    return _windows_from_sorted(
        sorted_key, sorted_gid, num_tiles, rank_bits, ntx, nty, k_cap,
        m_cap, dropped,
    )


def _windows_from_sorted(sorted_key, sorted_gid, num_tiles, rank_bits,
                         ntx, nty, k_cap, m_cap, dropped) -> TileBins:
    """Per-tile capacity windows over the (tile|rank)-sorted list."""
    tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32) << rank_bits
    bounds = jnp.searchsorted(sorted_key, tile_range, side="left").astype(
        jnp.int32
    )
    starts, ends = bounds[:-1], bounds[1:]

    win = starts[:, None] + jnp.arange(k_cap, dtype=jnp.int32)[None, :]
    tile_mask = win < ends[:, None]
    if k_cap % 8 == 0:
        tile_gauss = windowed_gather(sorted_gid, starts, k_cap)
    else:
        tile_gauss = sorted_gid[jnp.clip(win, 0, m_cap - 1)]

    tile_spill = jnp.sum(jnp.maximum(ends - starts - k_cap, 0))
    return TileBins(
        tile_gauss=tile_gauss,
        tile_mask=tile_mask,
        num_tiles_x=ntx,
        num_tiles_y=nty,
        spilled=(dropped + tile_spill).astype(jnp.int32),
        sorted_gid=sorted_gid,
        starts=bounds,
    )


def _use_pallas_binning(n: int, m_cap: int, opts: RenderOptions) -> bool:
    """Pallas run-length-decode expansion (ops/pallas/binning_kernel).

    Requires every integer field to be f32-exact (< 2^24).  DEFAULT on
    TPU since the round-5 hardware A/B: at the 1M/720p bench config it
    replaces the seed scatter-max + cummax forward-fill + [M, 10]
    expansion row gather with one kernel — fwd 70.7 ms vs 79.6 ms
    (-11%), step 181.5 vs 189.1 ms, bit-exact windows/spill at 200k on
    hardware.  Off-TPU the XLA path is faster (the kernel would run
    interpreted); force either way with COLLAB_SPLATS_BINNING=pallas|xla.
    """
    import os

    if n >= (1 << 24) or m_cap > (1 << 24):
        return False
    force = os.environ.get("COLLAB_SPLATS_BINNING")
    if force == "xla":
        return False
    if force == "pallas":
        return True
    import jax

    return jax.default_backend() == "tpu"


def _decode_keys_pallas(proj, opts, counts, offsets, r_all, n, m_cap,
                        ntx, ts, num_tiles, rank_bits, opacities):
    """Build the [16, N_pad] f32 column matrix and run the decode kernel."""
    from .pallas import binning_kernel as bk

    f = lambda x: x.astype(jnp.float32)  # noqa: E731
    ends = offsets + counts
    rows = [jnp.zeros((n,), jnp.float32)] * bk.C_ROWS
    rows[bk.C_OFF] = f(offsets)
    rows[bk.C_END] = f(ends)
    # ncols of culled/invalid gaussians is irrelevant (they own no slot)
    # but must be >= 1 so the kernel's floor-div correction terminates.
    tx0, ty0, tx1, _ = tile_bbox(proj, ntx, -(-num_tiles // ntx), ts)
    rows[bk.C_NCOLS] = f(jnp.maximum(tx1 - tx0 + 1, 1))
    rows[bk.C_TILE0] = f(ty0 * ntx + tx0)
    rows[bk.C_RANK] = f(r_all)
    rows[bk.C_GIDX] = f(jnp.arange(n, dtype=jnp.int32))
    rows[bk.C_ONE] = jnp.ones((n,), jnp.float32)
    if opts.ellipse_cull:
        from ..core.compositing import ALPHA_CUTOFF

        if opacities is None:
            thresh = jnp.full((n,), -np.log(ALPHA_CUTOFF), jnp.float32)
        else:
            thresh = jnp.log(jnp.clip(opacities / ALPHA_CUTOFF, 1e-12,
                                      None))
        rows[bk.C_MU] = proj.mean2d[:, 0]
        rows[bk.C_MV] = proj.mean2d[:, 1]
        rows[bk.C_A] = proj.conic[:, 0]
        rows[bk.C_B] = proj.conic[:, 1]
        rows[bk.C_C] = proj.conic[:, 2]
        rows[bk.C_THR] = thresh
    cols16 = jnp.stack(rows, axis=0)                     # [16, N]
    n_pad = -(-n // bk.GW) * bk.GW
    cols16 = jnp.pad(cols16, ((0, 0), (0, n_pad - n)))

    m_blocks = -(-m_cap // bk.S_BLOCK)
    edges = jnp.arange(m_blocks + 1, dtype=jnp.int32) * bk.S_BLOCK
    # raw[e] = first gaussian whose slot run ends after edge e — the owner
    # of slot e*S.  Block i's owners span [raw[i], raw[i+1]] inclusive.
    raw = jnp.searchsorted(ends, edges, side="right").astype(jnp.int32)
    lo = jnp.clip((raw[:-1] // bk.GW) * bk.GW, 0, n_pad - bk.GW)
    hi = jnp.clip(-(-(raw[1:] + 1) // bk.GW) * bk.GW, 0, n_pad)
    hi = jnp.maximum(hi, lo + bk.GW)
    out = bk.decode_bin_keys(
        cols16, lo, hi, m_blocks, ntx, ts, rank_bits, num_tiles,
        bool(opts.ellipse_cull), bool(opts.pallas_interpret),
    ).reshape(m_blocks, 8, bk.S_BLOCK)
    key = out[:, 0, :].reshape(-1)[:m_cap]
    gid = out[:, 1, :].reshape(-1)[:m_cap]
    return key, gid
