"""Batched Pallas compositing backward: the fused-VJP backward pass with
VMEM-resident intermediates.

The XLA fused backward (core/compositing.fused_bwd_from_g under the chunk
loop) re-materializes several [T, P, K] tensors per chunk in HBM: the
recomputed alpha/log1m/scan chains feeding two MXU scans, r/s/suffix for
the back-to-front recurrence, and d_sigma/d_tpix as moment-matmul
operands — ~13 GB of HBM traffic per 1M/720p step.  This kernel runs the
same math for a block of ``TC`` tiles x 128 splat lanes entirely in VMEM,
walking the K blocks BACK TO FRONT (the same order as the CUDA
rasterizer's backward at /root/reference/collab_splats/models/
rade_gs_model.py:439-465's gsplat kernel) with the running suffix sum as
a scratch carry, and writes ONLY the per-(tile, splat) reductions:

  S6     [6, T_pad, K]  pixel moments of d_sigma (1, u, v, u^2, uv, v^2)
  T3     [3, T_pad, K]  pixel moments of d_tpix  (1, u, v)
  d_opac [T_pad, K]     sum_p d_alpha_raw * exp(-sigma)
  d_vals [V, T_pad, K]  sum_p w * g_v   (value-channel gradients)

The cheap per-splat recombination of the moments into d_mean/d_conic/
d_depth/d_plane (core/compositing.moments_to_dg) stays in XLA on [T, K]
shapes.  Pixel coordinates inside the moment basis are TILE-LOCAL, exactly
as in fused_bwd_from_g, so the recombination cancels tile-sized terms.

Back-to-front needs the per-block *prefix* log-transmittance, which only a
front-to-back walk produces — the batched forward kernel banks it as its
``blk_cum`` output ([T_pad, nb, P], 15 MB at 1M/720p: the one extra
residual this pairing stores).  Gradient formulas mirror
core/compositing.fused_bwd_from_g term for term; parity is pinned in
tests/test_pallas.py (interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...core.compositing import ALPHA_CUTOFF, ALPHA_MAX
from .batched import KB, TC, _tri_le


def _tri_ge() -> jax.Array:
    r = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (KB, KB), 1)
    return (r >= c).astype(jnp.float32)


def _bwd_kernel(g_ref, vals_ref, msk_ref, cprev_ref, gv_ref, ga_ref, gd_ref,
                gm_ref, idx_ref, tt_ref,
                s6_ref, t3_ref, dopac_ref, dvals_ref,
                suf_carry, *,
                ntx: int, ts: int, near_plane: float, nb: int, n_vals: int):
    i = pl.program_id(0)
    jr = pl.program_id(1)           # 0 .. nb-1, block nb-1-jr (back to front)
    j = nb - 1 - jr
    p = ts * ts

    @pl.when(jr == 0)
    def _init():
        suf_carry[:, :] = jnp.zeros((TC, p), jnp.float32)

    t_loc = jax.lax.broadcasted_iota(jnp.int32, (TC, p, 1), 0)
    p_loc = jax.lax.broadcasted_iota(jnp.int32, (TC, p, 1), 1)
    tid = i * TC + t_loc
    up = ((tid % ntx) * ts + p_loc % ts).astype(jnp.float32) + 0.5
    vp = ((tid // ntx) * ts + p_loc // ts).astype(jnp.float32) + 0.5

    def row(r):
        return g_ref[r, :, :].reshape(TC, 1, KB)

    # Forward chain recompute (identical to the batched forward kernel).
    du = up - row(0)
    dv = vp - row(1)
    sigma = 0.5 * (row(2) * du * du + row(4) * dv * dv) + row(3) * du * dv
    alpha_raw = row(8) * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    keep = (msk_ref[:, :].reshape(TC, 1, KB) > 0.0) \
        & (alpha >= ALPHA_CUTOFF) & (sigma >= 0.0)
    alpha = jnp.where(keep, alpha, 0.0)
    lg = jnp.log(1.0 - alpha)
    cum = jax.lax.dot_general(
        lg.reshape(TC * p, KB), _tri_le(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(TC, p, KB)
    cprev = cprev_ref[0, :, :].reshape(TC, p, 1)         # banked prefix
    t_excl = jnp.exp(cprev + cum - lg)
    w = alpha * t_excl
    tpix_raw = row(5) + row(6) * du + row(7) * dv
    tpix = jnp.maximum(tpix_raw, near_plane)

    # r_k = g_v . vals_k + g_depth * tpix_k (V broadcast FMAs; everything
    # stays in VMEM so unrolled per-channel passes cost no HBM traffic).
    gd = gd_ref[:, :].reshape(TC, p, 1)
    r = gd * tpix
    for v in range(n_vals):
        r += gv_ref[v, :, :].reshape(TC, p, 1) \
            * vals_ref[v, :, :].reshape(TC, 1, KB)
    s = w * r

    # suffix_i = sum_{k > i} s_k = later-block carry + in-block reverse
    # inclusive cumsum - s.
    s_rcum = jax.lax.dot_general(
        s.reshape(TC * p, KB), _tri_ge(), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).reshape(TC, p, KB)
    suffix = suf_carry[:, :].reshape(TC, p, 1) + s_rcum - s
    suf_carry[:, :] += jnp.sum(s, axis=2)

    inv1m = jnp.exp(-lg)
    ga_tt = (ga_ref[:, :] * tt_ref[:, :]).reshape(TC, p, 1)
    d_alpha = t_excl * r - suffix * inv1m + ga_tt * inv1m

    # Median one-hot + masked g_med, exactly as fused_bwd_from_g.
    g_med = jnp.where(tt_ref[:, :] < 1.0, gm_ref[:, :], 0.0)
    kglob = j * KB + jax.lax.broadcasted_iota(jnp.int32, (TC, p, KB), 2)
    onehot = (kglob == idx_ref[:, :].reshape(TC, p, 1)).astype(jnp.float32)
    d_tpix = w * gd + g_med.reshape(TC, p, 1) * onehot
    d_tpix = jnp.where(tpix_raw >= near_plane, d_tpix, 0.0)

    d_alpha_raw = jnp.where(keep & (alpha_raw < ALPHA_MAX), d_alpha, 0.0)
    d_opac_pk = d_alpha_raw * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    d_sigma = jnp.where(
        (sigma >= 0.0) & (sigma <= 50.0), -alpha_raw * d_alpha_raw, 0.0)

    # Tile-local pixel moments: all reductions run over VMEM-resident
    # tensors, so six separate multiply+reduce passes cost no HBM traffic
    # (the XLA path must matmul-fuse them to avoid re-streaming from HBM).
    ul = (p_loc % ts).astype(jnp.float32)                # up - first center
    vl = (p_loc // ts).astype(jnp.float32)

    def mom(x, b):
        return jnp.sum(x * b, axis=1)                    # [TC, KB]

    s6_ref[0, :, :] = jnp.sum(d_sigma, axis=1)
    s6_ref[1, :, :] = mom(d_sigma, ul)
    s6_ref[2, :, :] = mom(d_sigma, vl)
    s6_ref[3, :, :] = mom(d_sigma, ul * ul)
    s6_ref[4, :, :] = mom(d_sigma, ul * vl)
    s6_ref[5, :, :] = mom(d_sigma, vl * vl)
    t3_ref[0, :, :] = jnp.sum(d_tpix, axis=1)
    t3_ref[1, :, :] = mom(d_tpix, ul)
    t3_ref[2, :, :] = mom(d_tpix, vl)
    dopac_ref[:, :] = jnp.sum(d_opac_pk, axis=1)
    for v in range(n_vals):
        dvals_ref[v, :, :] = mom(w, gv_ref[v, :, :].reshape(TC, p, 1))


def composite_batched_bwd(g_geo, vals_t, mask, blk_cum, gv_t, g_alpha,
                          g_depth, g_med, idx, t_total, *, ntx: int, ts: int,
                          near_plane: float, interpret: bool = False):
    """Run the batched backward kernel.

    Args:
        g_geo: [9, T_pad, K] f32 geometry rows (PG layout, sink pre-added).
        vals_t: [V, T_pad, K] f32 value channels (normal ++ colors).
        mask: [T_pad, K] f32 validity.
        blk_cum: [nb, T_pad, P] f32 per-block prefix log-transmittance
            (the batched forward kernel's banked residual).
        gv_t: [V, T_pad, P] f32 cotangent of out_v.
        g_alpha, g_depth, g_med: [T_pad, P] f32 cotangents.
        idx: [T_pad, P] i32 median-selected splat index (forward residual).
        t_total: [T_pad, P] f32 final transmittance.

    Returns:
        (S6 [6, T_pad, K], T3 [3, T_pad, K], d_opac [T_pad, K],
        d_vals [V, T_pad, K]) — tile-local pixel moments; recombine with
        :func:`core.compositing.moments_to_dg`.
    """
    nv, t_pad, k = vals_t.shape
    assert t_pad % TC == 0 and k % KB == 0, (t_pad, k)
    nb = k // KB
    p = ts * ts
    grid = (t_pad // TC, nb)

    kern = functools.partial(
        _bwd_kernel, ntx=ntx, ts=ts, near_plane=near_plane, nb=nb,
        n_vals=nv)
    rev = lambda i, j: (0, i, nb - 1 - j)       # noqa: E731
    rev2 = lambda i, j: (i, nb - 1 - j)         # noqa: E731
    pin = lambda i, j: (i, 0)                   # noqa: E731
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, TC, KB), rev),
            pl.BlockSpec((nv, TC, KB), rev),
            pl.BlockSpec((TC, KB), rev2),
            pl.BlockSpec((1, TC, p), lambda i, j: (nb - 1 - j, i, 0)),
            pl.BlockSpec((nv, TC, p), lambda i, j: (0, i, 0)),
            pl.BlockSpec((TC, p), pin),
            pl.BlockSpec((TC, p), pin),
            pl.BlockSpec((TC, p), pin),
            pl.BlockSpec((TC, p), pin),
            pl.BlockSpec((TC, p), pin),
        ],
        out_specs=[
            pl.BlockSpec((6, TC, KB), rev),
            pl.BlockSpec((3, TC, KB), rev),
            pl.BlockSpec((TC, KB), rev2),
            pl.BlockSpec((nv, TC, KB), rev),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6, t_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((3, t_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((t_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((nv, t_pad, k), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TC, p), jnp.float32),   # running suffix carry
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * (1 << 20),
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(g_geo, vals_t, mask, blk_cum, gv_t, g_alpha, g_depth, g_med, idx,
      t_total)
