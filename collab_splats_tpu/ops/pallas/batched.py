"""Batched Pallas compositing forward: the fused-VJP forward pass with
VMEM-resident intermediates.

The XLA fused path (core/compositing.fused_compositor) is HBM-bound: the
transmittance-scan operand/result and the weight matrix materialize per
chunk (~23 ms of the 1M/720p forward loop at 819 GB/s).  This kernel
computes the whole alpha -> transmittance -> weight -> value chain for a
block of ``TC`` tiles x 128 splat lanes entirely in VMEM and writes ONLY
[T, P]-sized maps: the value einsum is fused in as per-channel
broadcast-FMA reductions (r5; previously the kernel wrote the [T, P, K]
``w`` weight tensor — 1.9 GB at 1M/720p — for an XLA-side einsum to read
back, ~4.6 GB of pure HBM round-trip, the only [T,P,K] HBM tensor left
in the batched path; the backward kernel never consumed it, recomputing
from ``blk_cum`` instead).  Unlike the retired per-tile kernel
(ops/pallas/composite.py, 358 ms — 16k tiny sequential programs), the
grid step here is a [TC*P, 128] = [8192, 128] block: VPU/MXU-sized.

Layout contract (all f32):
  g_geo  [9, T_pad, K]   geometry rows, transposed so the splat axis is the
                         lane dimension: 0 u, 1 v, 2 a, 3 b, 4 c (conic),
                         5 depth, 6 plane_u, 7 plane_v, 8 opacity
                         (== ops.rasterize PG_* layout, sink pre-added).
  vals_t [V, T_pad, K]   value channels (normal ++ colors), splat-lane minor.
  mask   [T_pad, K]      1.0 live / 0.0 dead window slots.
Outputs:
  out_v  [V, T_pad, P]   composited value channels (sum_k w * vals)
  alpha, depth_acc, median  [T_pad, P]
  med_idx [T_pad, P] i32 selected splat lane (for the backward's one-hot)

Grid is (tile chunks, K blocks) with the K axis innermost; the
log-transmittance prefix, the depth accumulator and the median running
argmax live in scratch that persists across the K blocks of one chunk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.compositing import ALPHA_CUTOFF, ALPHA_MAX

KB = 128          # splat lanes per grid step
TC = 32           # tiles per grid step ([TC*P, KB] = [8192, 128] blocks;
                  # ~4.2 MB per live f32 temporary keeps peak VMEM < 64 MB)
LOG_HALF = -0.6931471805599453


def _tri_le() -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
    return (r <= c).astype(jnp.float32)


def _fwd_kernel(g_ref, vals_ref, msk_ref, outv_ref, alpha_ref, depth_ref,
                med_ref, idx_ref, blk_ref, carry, dacc, bkey, bval, bidx, *,
                ntx: int, ts: int, near_plane: float, k_total: int,
                nb: int, n_vals: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    p = ts * ts

    @pl.when(j == 0)
    def _init():
        carry[:, :] = jnp.zeros((TC, p), jnp.float32)
        dacc[:, :] = jnp.zeros((TC, p), jnp.float32)
        bkey[:, :] = jnp.full((TC, p), -1.0, jnp.float32)
        bval[:, :] = jnp.zeros((TC, p), jnp.float32)
        bidx[:, :] = jnp.zeros((TC, p), jnp.int32)
        outv_ref[:, :, :] = jnp.zeros((n_vals, TC, p), jnp.float32)

    # Pixel-center coordinates for this chunk's tiles: [TC, P, 1].
    t_loc = jax.lax.broadcasted_iota(jnp.int32, (TC, p, 1), 0)
    p_loc = jax.lax.broadcasted_iota(jnp.int32, (TC, p, 1), 1)
    tid = i * TC + t_loc
    up = ((tid % ntx) * ts + p_loc % ts).astype(jnp.float32) + 0.5
    vp = ((tid // ntx) * ts + p_loc // ts).astype(jnp.float32) + 0.5

    def row(r):
        return g_ref[r, :, :].reshape(TC, 1, KB)

    du = up - row(0)                                   # [TC, P, KB]
    dv = vp - row(1)
    sigma = 0.5 * (row(2) * du * du + row(4) * dv * dv) + row(3) * du * dv
    alpha = row(8) * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    keep = (msk_ref[:, :].reshape(TC, 1, KB) > 0.0) \
        & (alpha >= ALPHA_CUTOFF) & (sigma >= 0.0)
    alpha = jnp.where(keep, alpha, 0.0)

    lg = jnp.log(1.0 - alpha)                          # alpha <= 0.999
    cum = jax.lax.dot_general(
        lg.reshape(TC * p, KB), _tri_le(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(TC, p, KB)
    cprev = carry[:, :].reshape(TC, p, 1)
    # Bank the block's prefix log-transmittance: the batched backward
    # kernel (batched_bwd.py) walks blocks back to front and needs it.
    # Layout [nb, T_pad, P] (nb leading) so the block's trailing two dims
    # stay (TC, P) — Mosaic requires them (8, 128)-divisible.
    blk_ref[0, :, :] = carry[:, :]
    t_excl = jnp.exp(cprev + cum - lg)
    w = alpha * t_excl
    # Fused value reduction: out_v[v] += sum_k w * vals[v, k].  Per-channel
    # broadcast FMAs over the VMEM-resident w — the same pattern as the
    # backward kernel's d_vals — replace the XLA-side
    # einsum("tpk,tkv->tpv") AND the [T, P, K] w output it read (w never
    # leaves VMEM now).  Full-f32 accumulation: at least as accurate as
    # the HIGHEST-precision MXU einsum it replaces.
    for v in range(n_vals):
        outv_ref[v, :, :] += jnp.sum(
            w * vals_ref[v, :, :].reshape(TC, 1, KB), axis=2)

    tpix = jnp.maximum(row(5) + row(6) * du + row(7) * dv, near_plane)
    dacc[:, :] += jnp.sum(w * tpix, axis=2)

    # Median: first 0.5-crossing of accumulated opacity, max-weight
    # fallback — single running argmax over the crossing/fallback key.
    kglob = j * KB + jax.lax.broadcasted_iota(jnp.int32, (TC, p, KB), 2)
    crossed = (cprev + cum <= LOG_HALF) & (alpha > 0.0)
    med_key = jnp.where(
        crossed, 2.0 + (k_total - kglob).astype(jnp.float32) / k_total, w)
    bmax = jnp.max(med_key, axis=2)                    # [TC, P]
    big = jnp.int32(1 << 30)
    li = jnp.min(
        jnp.where(med_key == bmax[:, :, None], kglob, big), axis=2)
    tpix_at = jnp.sum(
        jnp.where(kglob == li[:, :, None], tpix, 0.0), axis=2)
    upd = bmax > bkey[:, :]
    bkey[:, :] = jnp.where(upd, bmax, bkey[:, :])
    bval[:, :] = jnp.where(upd, tpix_at, bval[:, :])
    bidx[:, :] = jnp.where(upd, li, bidx[:, :])

    new_carry = carry[:, :] + jnp.sum(lg, axis=2)
    carry[:, :] = new_carry

    @pl.when(j == nb - 1)
    def _finish():
        alpha_out = 1.0 - jnp.exp(new_carry)
        alpha_ref[:, :] = alpha_out
        depth_ref[:, :] = dacc[:, :]
        med_ref[:, :] = jnp.where(alpha_out > 0.0, bval[:, :], 0.0)
        idx_ref[:, :] = bidx[:, :]


def composite_batched_fwd(g_geo, vals_t, mask, *, ntx: int, ts: int,
                          near_plane: float, interpret: bool = False):
    """Run the batched forward kernel.

    Args:
        g_geo: [9, T_pad, K] f32 (see module docstring; T_pad % TC == 0,
            K % KB == 0).
        vals_t: [V, T_pad, K] f32 value channels (normal ++ colors).
        mask: [T_pad, K] f32 validity.

    Returns:
        (out_v [V, T_pad, P] composited values, alpha [T_pad, P],
        depth_acc [T_pad, P], median [T_pad, P], med_idx [T_pad, P] i32,
        blk_cum [nb, T_pad, P] per-block prefix log-transmittance — the
        banked residual the batched backward kernel consumes).
    """
    _, t_pad, k = g_geo.shape
    nv = vals_t.shape[0]
    assert t_pad % TC == 0 and k % KB == 0, (t_pad, k)
    nb = k // KB
    p = ts * ts
    grid = (t_pad // TC, nb)

    kern = functools.partial(
        _fwd_kernel, ntx=ntx, ts=ts, near_plane=near_plane, k_total=k,
        nb=nb, n_vals=nv)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, TC, KB), lambda i, j: (0, i, j)),
            pl.BlockSpec((nv, TC, KB), lambda i, j: (0, i, j)),
            pl.BlockSpec((TC, KB), lambda i, j: (i, j)),
        ],
        out_specs=[
            pl.BlockSpec((nv, TC, p), lambda i, j: (0, i, 0)),
            pl.BlockSpec((TC, p), lambda i, j: (i, 0)),
            pl.BlockSpec((TC, p), lambda i, j: (i, 0)),
            pl.BlockSpec((TC, p), lambda i, j: (i, 0)),
            pl.BlockSpec((TC, p), lambda i, j: (i, 0)),
            pl.BlockSpec((1, TC, p), lambda i, j: (j, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nv, t_pad, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, p), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, p), jnp.int32),
            jax.ShapeDtypeStruct((nb, t_pad, p), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TC, p), jnp.float32),   # carry (log transmittance)
            pltpu.VMEM((TC, p), jnp.float32),   # depth accumulator
            pltpu.VMEM((TC, p), jnp.float32),   # median best key
            pltpu.VMEM((TC, p), jnp.float32),   # median value
            pltpu.VMEM((TC, p), jnp.int32),     # median index
        ],
        # ~10 live [TC*P, KB] f32 temporaries (~4.2 MB each at TC=32) plus
        # double-buffered blocks: the 16 MB default scoped-vmem limit OOMs.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * (1 << 20),
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(g_geo, vals_t, mask)
