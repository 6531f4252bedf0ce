"""Pallas TPU kernel: per-tile depth-ordered alpha compositing.

An *optional* backend for the rasterizer's hot loop (SURVEY.md §7 layer
2) — the XLA compositor (ops/rasterize.py) is the default and the faster
path on hardware; see BASELINE.md "Pallas compositor: retirement
decision" for the measured numbers and why the gap is structural.
Works on *packed per-intersection* data laid out [D, M] (channels x
intersections, sorted by (tile, depth) — built by ops/rasterize.py's
binning + one XLA gather), so every tile's splats form a contiguous column
range: the kernel DMAs contiguous [D, CHUNK] blocks — no scattered memory
access anywhere.

Per grid step (one 16x16 tile):
  * walk the tile's segment in CHUNK-column blocks,
  * alphas for all (pixel, splat) pairs as a dense [P, CHUNK] VPU block,
  * transmittance via a log-space cumulative sum along the splat lanes with
    a scalar carry across chunks,
  * color/normal reductions as [P, CHUNK] @ [CHUNK, C] MXU matmuls,
  * median depth via a first-crossing one-hot (no gather),
  * early exit (``lax.while_loop``) once every pixel's transmittance falls
    below ``stop_threshold`` — the analogue of the CUDA kernel's per-pixel
    saturation break.

Row layout of the packed matrix (D_BASE + C rows, f32):
  0 u, 1 v (pixel coords of the splat center)
  2 a, 3 b, 4 c (conic)
  5 depth, 6 plane_u, 7 plane_v
  8 opacity
  9,10,11 normal (camera space)
  12.. colors (C channels)

Output is a packed [T, P, C + 6] image block per tile:
  0..C-1 color, C..C+2 normal, C+3 alpha, C+4 depth_sum (unnormalized),
  C+5 median (with the same max-weight-splat fallback as the XLA path);
  plus a [T] int32 count of processed chunks (consumed by the backward
  kernel).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.compositing import ALPHA_CUTOFF, ALPHA_MAX

D_BASE = 12
CHUNK = 128
LOG_HALF = -0.6931471805599453   # log(0.5); median crossing threshold



def _tri_le() -> jax.Array:
    """[CHUNK, CHUNK] matrix M[j, k] = 1 if j <= k: x @ M = inclusive cumsum
    along lanes (Mosaic has no cumsum primitive; the MXU does it for free)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r <= c).astype(jnp.float32)


def _tri_gt() -> jax.Array:
    """[CHUNK, CHUNK] matrix M[j, k] = 1 if j > k: x @ M = exclusive suffix
    sum along lanes."""
    r = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r > c).astype(jnp.float32)


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        x, _tri_le(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _suffix_lanes(x: jax.Array) -> jax.Array:
    return jax.lax.dot_general(
        x, _tri_gt(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _pixel_grids(tile_size: int):
    p = tile_size * tile_size
    idx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)  # Mosaic: int iota only
    px = (idx % tile_size).astype(jnp.float32) + 0.5
    py = (idx // tile_size).astype(jnp.float32) + 0.5
    return px, py


def composite_fwd_kernel(
    # scalar prefetch
    starts_ref,            # [Tpad+1] int32 CHUNK-aligned segment starts
    lens_ref,              # [Tpad] int32 true segment lengths
    # inputs
    isect_ref,             # [D, M] f32 in ANY/HBM
    # outputs
    out_ref,               # [TPT, P, DOUT] f32 (blocked per program)
    nchunks_ref,           # [TPT, 8, 128] int32 (blocked per program)
    # scratch
    buf_ref,               # [2, D, CHUNK] VMEM (double buffered)
    sem,                   # DMA semaphores (2,)
    *,
    tile_size: int,
    num_tiles_x: int,
    n_color: int,
    near_plane: float,
    stop_threshold: float,
    max_chunks: int,
    tiles_per_program: int,
):
    """Processes ``tiles_per_program`` tiles per grid step (amortizing the
    per-program pipeline overhead of the sequential TPU grid)."""
    grid_g = pl.program_id(0)
    p = tile_size * tile_size
    px, py = _pixel_grids(tile_size)
    dout = n_color + 6

    def tile_body(k, _):
        t = grid_g * tiles_per_program + k
        start = pl.multiple_of(starts_ref[t], CHUNK)
        seg_len = lens_ref[t]
        n_chunks = jnp.minimum(pl.cdiv(seg_len, CHUNK), max_chunks)

        ox = ((t % num_tiles_x) * tile_size).astype(jnp.float32)
        oy = ((t // num_tiles_x) * tile_size).astype(jnp.float32)
        u = px + ox                      # [P, 1]
        v = py + oy

        def dma_for(ci):
            col = start + ci * CHUNK
            slot = jax.lax.rem(ci, 2)
            return pltpu.make_async_copy(
                isect_ref.at[:, pl.ds(col, CHUNK)], buf_ref.at[slot],
                sem.at[slot],
            )

        @pl.when(n_chunks > 0)
        def _():
            dma_for(jnp.zeros((), jnp.int32)).start()

        def body(state):
            (ci, log_t, color, normal, depth_sum, median,
             wmax, t_wmax, found) = state
            # Prefetch the next chunk while computing this one.
            @pl.when(ci + 1 < n_chunks)
            def _():
                dma_for(ci + 1).start()

            dma_for(ci).wait()
            b = buf_ref[jax.lax.rem(ci, 2)]
            # Mask lanes beyond the segment.
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
            valid = (ci * CHUNK + lane) < seg_len            # [1, CHUNK]

            du = u - b[0:1, :]                               # [P, CHUNK]
            dv = v - b[1:2, :]
            sigma = (0.5 * (b[2:3] * du * du + b[4:5] * dv * dv)
                     + b[3:4] * du * dv)
            alpha = b[8:9] * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
            alpha = jnp.minimum(alpha, ALPHA_MAX)
            keep = valid & (alpha >= ALPHA_CUTOFF) & (sigma >= 0.0)
            alpha = jnp.where(keep, alpha, 0.0)

            # Single scan per chunk: every other per-splat quantity
            # telescopes off the inclusive transmittance.
            #   t_after_k = exp(log_t + cum_k)   (T past splat k)
            #   t_in_k    = t_after_k / (1-a_k)  (T entering splat k)
            #   w_k       = a_k * t_in_k
            #   accumulated opacity past k = 1 - t_after_k
            log1m = jnp.log1p(-alpha)                        # [P, CHUNK]
            cum = _cumsum_lanes(log1m)
            t_after = jnp.exp(log_t + cum)
            inv1m = 1.0 / (1.0 - alpha)
            t_in = t_after * inv1m
            w = alpha * t_in                                 # [P, CHUNK]

            t_pix = b[5:6] + b[6:7] * du + b[7:8] * dv
            t_pix = jnp.maximum(t_pix, near_plane)

            color = color + jax.lax.dot_general(
                w, b[D_BASE : D_BASE + n_color, :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            normal = normal + jax.lax.dot_general(
                w, b[9:12, :], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            depth_sum = depth_sum + jnp.sum(w * t_pix, axis=1, keepdims=True)
            # Max-weight splat's depth (the XLA path's median fallback);
            # first occurrence via a lane-index min (no scan needed).
            lane_p = jax.lax.broadcasted_iota(jnp.int32, (p, CHUNK), 1)
            w_chunk_max = jnp.max(w, axis=1, keepdims=True)
            is_new_max = w_chunk_max > wmax
            cand = w == w_chunk_max
            first_lane = jnp.min(
                jnp.where(cand, lane_p, CHUNK), axis=1, keepdims=True
            )
            arg_mask = cand & (lane_p == first_lane)
            t_chunk_at_max = jnp.sum(
                jnp.where(arg_mask, t_pix, 0.0), axis=1, keepdims=True
            )
            t_wmax = jnp.where(is_new_max, t_chunk_at_max, t_wmax)
            wmax = jnp.maximum(wmax, w_chunk_max)

            # Median: first *live* splat where accumulated opacity crosses
            # 0.5 (T drops through 0.5).  The crossing test must not
            # compare values from two rounding paths (t_after of lane k vs
            # t_in of lane k+1 are computed through different chains and
            # can straddle 0.5 in a 1-ulp gap, double-counting or missing
            # the crossing) — so carry an explicit found flag (f32: i1
            # carries fail scf legalization) and take the first fired live
            # lane per chunk, gated on not-yet-found.
            fired = ((log_t + cum) <= LOG_HALF) & keep
            first_med = jnp.min(
                jnp.where(fired, lane_p, CHUNK), axis=1, keepdims=True
            )
            take = fired & (lane_p == first_med) & (found < 0.5)
            median = median + jnp.sum(
                jnp.where(take, t_pix, 0.0), axis=1, keepdims=True
            )
            found = jnp.maximum(
                found, jnp.max(fired.astype(jnp.float32), axis=1,
                               keepdims=True)
            )

            log_t = log_t + jnp.sum(log1m, axis=1, keepdims=True)
            return (ci + 1, log_t, color, normal, depth_sum, median,
                    wmax, t_wmax, found)

        def cond(state):
            ci = state[0]
            log_t = state[1]
            alive = jnp.max(log_t) > jnp.log(stop_threshold)
            return jnp.logical_and(ci < n_chunks, alive)

        init = (
            jnp.zeros((), jnp.int32),
            jnp.zeros((p, 1), jnp.float32),          # log transmittance
            jnp.zeros((p, n_color), jnp.float32),
            jnp.zeros((p, 3), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),
            jnp.zeros((p, 1), jnp.float32),          # median
            jnp.zeros((p, 1), jnp.float32),          # max weight
            jnp.zeros((p, 1), jnp.float32),          # depth at max weight
            jnp.zeros((p, 1), jnp.float32),          # median-found flag
        )
        (ci, log_t, color, normal, depth_sum, median,
         wmax, t_wmax, found) = jax.lax.while_loop(cond, body, init)

        # An early exit can leave the prefetched chunk's DMA un-awaited.
        @pl.when(ci < n_chunks)
        def _():
            dma_for(ci).wait()

        alpha_out = 1.0 - jnp.exp(log_t)  # Mosaic has no expm1
        median = jnp.where(found > 0.5, median, t_wmax)
        median = jnp.where(alpha_out > 0.0, median, 0.0)

        out = jnp.concatenate(
            [color, normal, alpha_out, depth_sum, median], axis=1
        )
        out_ref[k] = out
        nchunks_ref[k] = jnp.full((8, 128), ci, jnp.int32)
        return 0

    jax.lax.fori_loop(0, tiles_per_program, tile_body, 0)


def composite_bwd_kernel(
    # scalar prefetch
    starts_ref,            # [T+1] CHUNK-aligned
    lens_ref,              # [T] true lengths
    # inputs
    isect_ref,             # [D, M] ANY
    nchunks_ref,           # [1, 1] SMEM (blocked per tile)
    g_ref,                 # [1, P, DOUT] VMEM (blocked per tile)
    # outputs (aliased to a zeros array)
    d_isect_ref,           # [D, M] ANY
    # scratch
    buf_ref,               # [D, CHUNK] VMEM
    dbuf_ref,              # [D, CHUNK] VMEM
    logt_in_ref,           # [MAXC, P] VMEM  per-chunk entry log T
    gw_sum_ref,            # [MAXC, P] VMEM  per-chunk sum g_w * w
    sem,
    out_sem,
    *,
    tile_size: int,
    num_tiles_x: int,
    n_color: int,
    near_plane: float,
    max_chunks: int,
):
    t = pl.program_id(0)
    start = pl.multiple_of(starts_ref[t], CHUNK)
    seg_len = lens_ref[t]
    nc = nchunks_ref[0, 0, 0]

    p = tile_size * tile_size
    px, py = _pixel_grids(tile_size)
    u = px + ((t % num_tiles_x) * tile_size).astype(jnp.float32)
    v = py + ((t // num_tiles_x) * tile_size).astype(jnp.float32)

    g = g_ref[0]                                         # [P, DOUT]
    g_color = g[:, :n_color]
    g_normal = g[:, n_color : n_color + 3]
    g_alpha = g[:, n_color + 3 : n_color + 4]
    g_depth = g[:, n_color + 4 : n_color + 5]
    g_median = g[:, n_color + 5 : n_color + 6]

    def load_chunk(ci):
        dma = pltpu.make_async_copy(
            isect_ref.at[:, pl.ds(start + ci * CHUNK, CHUNK)], buf_ref, sem
        )
        dma.start()
        dma.wait()

    def splat_quantities(ci, b):
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1)
        valid = (ci * CHUNK + lane) < seg_len
        du = u - b[0:1, :]
        dv = v - b[1:2, :]
        sigma = 0.5 * (b[2:3] * du * du + b[4:5] * dv * dv) + b[3:4] * du * dv
        sig_c = jnp.clip(sigma, 0.0, 50.0)
        raw = b[8:9] * jnp.exp(-sig_c)
        alpha = jnp.minimum(raw, ALPHA_MAX)
        keep = valid & (alpha >= ALPHA_CUTOFF) & (sigma >= 0.0)
        alpha = alpha * keep.astype(jnp.float32)
        t_raw = b[5:6] + b[6:7] * du + b[7:8] * dv
        t_pix = jnp.maximum(t_raw, near_plane)
        return du, dv, sigma, raw, alpha, keep, t_raw, t_pix

    # ---- Phase 1: forward replay, store per-chunk entry states + g_w.w sums
    def p1_body(state):
        ci, log_t, wmax, found = state
        load_chunk(ci)
        b = buf_ref[:]
        du, dv, _, _, alpha, keep, _, t_pix = splat_quantities(ci, b)
        log1m = jnp.log1p(-alpha)
        cum = _cumsum_lanes(log1m)
        # Median-found flag: the EXACT same expression as the forward
        # kernel's fired test (log-space, live lanes only) — deriving it
        # from exp(log_t) here could disagree with the forward within a
        # few ulps of 0.5 and route g_median to the wrong splat.
        fired = ((log_t + cum) <= LOG_HALF) & keep
        found = jnp.maximum(
            found,
            jnp.max(fired.astype(jnp.float32), axis=1, keepdims=True),
        )
        # Same expression order as the forward kernel: the fallback-median
        # test in phase 2 compares w against wmax_fin bit-exactly.
        w = alpha * (jnp.exp(log_t + cum) * (1.0 / (1.0 - alpha)))
        g_w = (
            jax.lax.dot_general(
                g_color, b[D_BASE : D_BASE + n_color, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                g_normal, b[9:12, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + g_depth * t_pix
        )
        logt_in_ref[ci] = log_t[:, 0]
        gw_sum_ref[ci] = jnp.sum(g_w * w, axis=1)
        wmax = jnp.maximum(wmax, jnp.max(w, axis=1, keepdims=True))
        log_t = log_t + jnp.sum(log1m, axis=1, keepdims=True)
        return ci + 1, log_t, wmax, found

    init1 = (
        jnp.zeros((), jnp.int32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
        jnp.zeros((p, 1), jnp.float32),
    )
    _, log_t_fin, wmax_fin, crossed_ever = jax.lax.while_loop(
        lambda s: s[0] < nc, p1_body, init1
    )
    t_final = jnp.exp(log_t_fin)                         # [P, 1]

    # ---- Phase 2: forward pass emitting per-chunk input gradients.
    def p2_body(state):
        ci, seen_fb, seen_med = state
        load_chunk(ci)
        b = buf_ref[:]
        du, dv, sigma, raw, alpha, keep, t_raw, t_pix = splat_quantities(ci, b)
        log1m = jnp.log1p(-alpha)
        log_t_in_c = logt_in_ref[ci][:, None]
        cum = _cumsum_lanes(log1m)
        inv_1ma_w = 1.0 / (1.0 - alpha)
        t_after = jnp.exp(log_t_in_c + cum)
        t_in = t_after * inv_1ma_w
        w = alpha * t_in

        g_w = (
            jax.lax.dot_general(
                g_color, b[D_BASE : D_BASE + n_color, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + jax.lax.dot_general(
                g_normal, b[9:12, :], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + g_depth * t_pix
        )
        gww = g_w * w
        # Suffix of g_w.w: within-chunk exclusive suffix + later chunks.
        within = _suffix_lanes(gww)
        # S_after = sum over chunks > ci of stored sums.
        cidx = jax.lax.broadcasted_iota(jnp.int32, (max_chunks, 1), 0)
        later = (cidx > ci) & (cidx < nc)
        # NB: rows of the scratch beyond nc are uninitialized — must select,
        # not multiply (NaN * 0 = NaN).
        s_after = jnp.sum(
            jnp.where(later, gw_sum_ref[:, :], 0.0), axis=0
        )[:, None]                                        # [P, 1]
        suffix = within + s_after

        d_alpha = (g_w * t_in - suffix * inv_1ma_w
                   + g_alpha * t_final * inv_1ma_w)
        d_alpha = d_alpha * keep.astype(jnp.float32)

        # Median routing: first fired LIVE lane (the forward's found-flag
        # selection, replayed bit-exactly: log_t_in_c is the stored forward
        # carry and cum the same lane scan), else max-weight splat.
        lane_p = jax.lax.broadcasted_iota(jnp.int32, (p, CHUNK), 1)
        fired = ((log_t_in_c + cum) <= LOG_HALF) & keep
        first_med_lane = jnp.min(
            jnp.where(fired, lane_p, CHUNK), axis=1, keepdims=True
        )
        take_med = fired & (lane_p == first_med_lane) & (seen_med < 0.5)
        seen_med = jnp.maximum(
            seen_med,
            jnp.max(fired.astype(jnp.float32), axis=1, keepdims=True),
        )
        cand = (
            (w == wmax_fin) & (wmax_fin > 0.0)
            & (crossed_ever < 0.5) & (seen_fb < 0.5)
        )
        first_cand_lane = jnp.min(
            jnp.where(cand, lane_p, CHUNK), axis=1, keepdims=True
        )
        first_cand = cand & (lane_p == first_cand_lane)
        seen_fb = jnp.maximum(
            seen_fb, jnp.max(cand.astype(jnp.float32), axis=1, keepdims=True)
        )
        sel = jnp.where(
            crossed_ever > 0.5,
            take_med.astype(jnp.float32),
            first_cand.astype(jnp.float32),
        )
        g_t = g_depth * w + sel * g_median
        g_t = g_t * (keep & (t_raw > near_plane)).astype(jnp.float32)

        # alpha -> opacity / conic / mean2d.
        d_raw = d_alpha * (raw < ALPHA_MAX).astype(jnp.float32)
        d_sigma = -raw * d_raw                             # [P, CHUNK]
        d_du = d_sigma * (b[2:3] * du + b[3:4] * dv) + g_t * b[6:7]
        d_dv = d_sigma * (b[4:5] * dv + b[3:4] * du) + g_t * b[7:8]

        def colsum(x):
            return jnp.sum(x, axis=0, keepdims=True)      # [1, CHUNK]

        dbuf_ref[0:1, :] = -colsum(d_du)
        dbuf_ref[1:2, :] = -colsum(d_dv)
        dbuf_ref[2:3, :] = colsum(0.5 * du * du * d_sigma)
        dbuf_ref[3:4, :] = colsum(du * dv * d_sigma)
        dbuf_ref[4:5, :] = colsum(0.5 * dv * dv * d_sigma)
        dbuf_ref[5:6, :] = colsum(g_t)
        dbuf_ref[6:7, :] = colsum(g_t * du)
        dbuf_ref[7:8, :] = colsum(g_t * dv)
        dbuf_ref[8:9, :] = colsum(d_raw * jnp.exp(
            -jnp.clip(sigma, 0.0, 50.0)
        ))
        dbuf_ref[9:12, :] = jax.lax.dot_general(
            g_normal, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dbuf_ref[D_BASE : D_BASE + n_color, :] = jax.lax.dot_general(
            g_color, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dma = pltpu.make_async_copy(
            dbuf_ref,
            d_isect_ref.at[:, pl.ds(start + ci * CHUNK, CHUNK)],
            out_sem,
        )
        dma.start()
        dma.wait()
        return ci + 1, seen_fb, seen_med

    jax.lax.while_loop(
        lambda s: s[0] < nc, p2_body,
        (jnp.zeros((), jnp.int32), jnp.zeros((p, 1), jnp.float32),
         jnp.zeros((p, 1), jnp.float32)),
    )


def composite_tiles_fwd(
    isect: jax.Array,        # [D, M] packed, tile segments CHUNK-aligned
    starts: jax.Array,       # [T+1] int32, multiples of CHUNK
    lens: jax.Array,         # [T] int32 true segment lengths
    num_tiles_x: int,
    tile_size: int,
    n_color: int,
    near_plane: float = 0.01,
    stop_threshold: float = 1e-4,
    max_chunks: int = 64,
    interpret: bool = False,
    tiles_per_program: int = 8,
) -> Tuple[jax.Array, jax.Array]:
    """Run the forward kernel. Returns (packed [T, P, C+6], nchunks [T])."""
    num_tiles = lens.shape[0]
    p = tile_size * tile_size
    dout = n_color + 6
    d = isect.shape[0]

    tpt = tiles_per_program
    n_prog = -(-num_tiles // tpt)
    t_pad = n_prog * tpt
    # Padded tiles get zero-length segments (their loop exits immediately).
    starts_p = jnp.pad(starts, (0, t_pad - num_tiles), mode="edge")
    lens_p = jnp.pad(lens, (0, t_pad - num_tiles))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_prog,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((tpt, p, dout), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tpt, 8, 128), lambda g, *_: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, d, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        composite_fwd_kernel,
        tile_size=tile_size,
        num_tiles_x=num_tiles_x,
        n_color=n_color,
        near_plane=near_plane,
        stop_threshold=stop_threshold,
        max_chunks=max_chunks,
        tiles_per_program=tpt,
    )
    out, nchunks = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t_pad, p, dout), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, 8, 128), jnp.int32),
        ],
        interpret=interpret,
    )(starts_p, lens_p, isect)
    return out[:num_tiles], nchunks[:num_tiles, 0, 0]


def composite_tiles_bwd_call(
    isect: jax.Array,
    starts: jax.Array,
    lens: jax.Array,
    num_tiles_x: int,
    nchunks: jax.Array,
    g_packed: jax.Array,
    tile_size: int,
    n_color: int,
    near_plane: float,
    max_chunks: int,
    interpret: bool = False,
) -> jax.Array:
    """Run the backward kernel; returns d_isect [D, M]."""
    num_tiles = lens.shape[0]
    p = tile_size * tile_size
    dout = n_color + 6
    d = isect.shape[0]
    zeros = jnp.zeros_like(isect)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),           # isect
            pl.BlockSpec((1, 8, 128), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),           # nchunks
            pl.BlockSpec((1, p, dout), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),           # g
            pl.BlockSpec(memory_space=pl.ANY),            # zeros (alias)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((d, CHUNK), jnp.float32),
            pltpu.VMEM((d, CHUNK), jnp.float32),
            pltpu.VMEM((max_chunks, p), jnp.float32),
            pltpu.VMEM((max_chunks, p), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        composite_bwd_kernel,
        tile_size=tile_size,
        num_tiles_x=num_tiles_x,
        n_color=n_color,
        near_plane=near_plane,
        max_chunks=max_chunks,
    )

    def kernel_with_alias(starts_ref, lens_ref, isect_ref,
                          nchunks_ref, g_ref, zeros_ref, d_out_ref, *scratch):
        kernel(starts_ref, lens_ref, isect_ref, nchunks_ref,
               g_ref, d_out_ref, *scratch)

    return pl.pallas_call(
        kernel_with_alias,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(isect.shape, jnp.float32),
        input_output_aliases={5: 0},  # zeros input -> d_isect output
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(starts, lens, isect,
      jnp.broadcast_to(
          nchunks[:, None, None], (num_tiles, 8, 128)
      ).astype(jnp.int32),
      g_packed, zeros)


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9)
)
def composite_tiles(
    isect, starts, lens,
    num_tiles_x: int, tile_size: int, n_color: int, near_plane: float,
    stop_threshold: float, max_chunks: int, interpret: bool,
):
    """Differentiable fused compositing: packed [T, P, C+6] per-tile maps.

    Gradients flow to ``isect`` only (binning indices are integer data).
    """
    out, _ = composite_tiles_fwd(
        isect, starts, lens, num_tiles_x, tile_size, n_color,
        near_plane=near_plane, stop_threshold=stop_threshold,
        max_chunks=max_chunks, interpret=interpret,
    )
    return out


def _composite_tiles_jvp_fwd(isect, starts, lens, num_tiles_x, tile_size,
                             n_color, near_plane, stop_threshold, max_chunks,
                             interpret):
    out, nchunks = composite_tiles_fwd(
        isect, starts, lens, num_tiles_x, tile_size, n_color,
        near_plane=near_plane, stop_threshold=stop_threshold,
        max_chunks=max_chunks, interpret=interpret,
    )
    return out, (isect, starts, lens, nchunks)


def _composite_tiles_bwd(num_tiles_x, tile_size, n_color, near_plane,
                         stop_threshold, max_chunks, interpret, res, g):
    isect, starts, lens, nchunks = res
    d_isect = composite_tiles_bwd_call(
        isect, starts, lens, num_tiles_x, nchunks, g,
        tile_size, n_color, near_plane, max_chunks, interpret,
    )
    return d_isect, None, None


composite_tiles.defvjp(_composite_tiles_jvp_fwd, _composite_tiles_bwd)
