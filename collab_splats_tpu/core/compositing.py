"""Depth-ordered alpha compositing, expressed as dense axis reductions.

This is the semantic core of the RaDe-GS rasterizer (the per-tile compositing
loop of gsplat-rade's CUDA kernel, consumed via ``rasterization(...,
return_depth_normal=True)`` at /root/reference/collab_splats/models/
rade_gs_model.py:439-465) re-formulated the TPU way: instead of a divergent
per-pixel while-loop over sorted splats, the weights of *all* splats in a
pixel's list are computed densely and reduced with a cumulative product
(transmittance) plus weighted sums — cumsum + matmul shapes that XLA/Pallas
map straight onto the VPU/MXU.

Both the golden O(N*pixels) reference renderer and the production tiled
rasterizer call into this module, so they share semantics exactly.

Output channels per the reference 6-tuple contract (rade_gs_model.py:169-189):
color (RGB and optionally fused latent features), alpha, expected depth,
median depth (depth where accumulated opacity crosses 0.5), and the
alpha-composited camera-space normal.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# Per-splat alpha handling, matching gsplat's rasterizer:
ALPHA_CUTOFF = 1.0 / 255.0   # contributions below this are skipped
ALPHA_MAX = 0.999            # per-splat alpha is clamped to this


def _value_precision():
    """MXU precision for the value-accumulation einsums (w @ values and
    their VJP transposes).

    Defaults to HIGHEST (f32-accurate multi-pass bf16): the CUDA reference
    composites in full f32, one-pass bf16 costs ~4e-3 relative error on
    the weighted color/depth sums and their gradients, and these einsums
    are HBM-streaming-bound so the extra MXU passes are ~free (hardware
    A/B: COLLAB_SPLATS_VALUE_PRECISION=default|high measures it back).
    """
    import os

    return {
        "default": jax.lax.Precision.DEFAULT,
        "high": jax.lax.Precision.HIGH,
    }.get(os.environ.get("COLLAB_SPLATS_VALUE_PRECISION", "highest"),
          jax.lax.Precision.HIGHEST)


def cumsum_mxu(
    x: jax.Array,
    reverse: bool = False,
    block: int = 128,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Inclusive cumsum along the last axis as blocked triangular matmuls.

    XLA lowers ``cumsum``/``cumprod`` along a 512-long axis to a 128-wide
    ``reduce-window`` that profiled at ~0.5 ms per 64-tile chunk (27 ms per
    720p render loop) *and* forces a T(8,128)-transposed operand layout that
    adds ~7 ms of copies.  A [B, B] triangular matmul does the same scan on
    the MXU: with ``precision=HIGHEST`` (f32-accurate bf16x passes) the whole
    loop's scans cost ~2 ms and the layout stays native.

    Args:
        x: [..., K] with K a multiple of ``block`` (or K < block).
        reverse: suffix-style ``out_i = sum_{j>=i} x_j`` instead of prefix.

    Returns:
        [..., K] inclusive scan along the last axis.
    """
    k = x.shape[-1]
    b = min(block, k)
    if k % b:
        # Odd trailing size (non-power-of-two tile_capacity): plain scan.
        return jnp.cumsum(x[..., ::-1], axis=-1)[..., ::-1] if reverse \
            else jnp.cumsum(x, axis=-1)
    nb = k // b
    iota = jnp.arange(b)
    if reverse:
        tri = (iota[:, None] <= iota[None, :]).astype(x.dtype)
    else:
        tri = (iota[:, None] >= iota[None, :]).astype(x.dtype)
    xb = x.reshape(x.shape[:-1] + (nb, b))
    inner = jnp.einsum("...j,ij->...i", xb, tri, precision=precision)
    tot = jnp.sum(xb, axis=-1)                       # [..., nb]
    if reverse:
        pref = jnp.flip(jnp.cumsum(jnp.flip(tot, -1), -1), -1) - tot
    else:
        pref = jnp.cumsum(tot, axis=-1) - tot
    return (inner + pref[..., None]).reshape(x.shape)


class CompositeOutput(NamedTuple):
    color: jax.Array         # [..., C]
    alpha: jax.Array         # [...]
    depth: jax.Array         # [...]  expected depth (normalized by alpha)
    median_depth: jax.Array  # [...]
    normal: jax.Array        # [..., 3]
    weights: jax.Array       # [..., L] per-splat compositing weights


def splat_alpha(
    du: jax.Array,
    dv: jax.Array,
    conic: jax.Array,
    opacity: jax.Array,
    mask: jax.Array,
) -> jax.Array:
    """Per-splat, per-pixel alpha.

    Args:
        du, dv: [..., L] pixel offsets from the projected splat center.
        conic: [..., L, 3] inverse 2D covariance (a, b, c).
        opacity: [..., L] activated opacity (already multiplied by the
            antialias compensation when rasterize_mode == "antialiased").
        mask: [..., L] bool; False entries contribute nothing.

    Returns:
        [..., L] alphas in [0, ALPHA_MAX], exactly zero where masked or below
        ALPHA_CUTOFF (the gsplat skip threshold).
    """
    a, b, c = conic[..., 0], conic[..., 1], conic[..., 2]
    sigma = 0.5 * (a * du * du + c * dv * dv) + b * du * dv
    alpha = opacity * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    alpha = jnp.minimum(alpha, ALPHA_MAX)
    keep = mask & (alpha >= ALPHA_CUTOFF) & (sigma >= 0.0)
    return jnp.where(keep, alpha, 0.0)


def transmittance_weights(alphas: jax.Array) -> jax.Array:
    """Front-to-back compositing weights ``w_k = alpha_k * prod_{j<k}(1-a_j)``.

    The exclusive cumulative transmittance is an exclusive ``cumprod``
    (associative scan) — the TPU-friendly replacement for the sequential
    per-pixel loop of the CUDA rasterizer, with no transcendentals (the
    log-space formulation costs a log1p + exp per element; profiled on the
    compositing hot path).
    """
    one_minus = 1.0 - alphas
    t_incl = jnp.cumprod(one_minus, axis=-1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )
    return alphas * t_excl


def median_select(weights: jax.Array, depth_per_pixel: jax.Array) -> jax.Array:
    """Median depth: depth of the first splat whose accumulated opacity
    crosses 0.5 (the RaDe-GS "unbiased" depth); falls back to the max-weight
    splat when opacity never reaches 0.5.  The selection index is a stopped
    gradient; depth gradients flow through the selected splat's plane.
    """
    accum = jnp.cumsum(weights, axis=-1)
    crossed = accum >= 0.5
    cross_idx = jnp.argmax(crossed, axis=-1)
    has_cross = jnp.any(crossed, axis=-1)
    fallback_idx = jnp.argmax(weights, axis=-1)
    idx = jnp.where(has_cross, cross_idx, fallback_idx)
    idx = jax.lax.stop_gradient(idx)
    return jnp.take_along_axis(depth_per_pixel, idx[..., None], axis=-1)[..., 0]


@jax.custom_vjp
def composite_chunk(alphas: jax.Array, tpix: jax.Array, values: jax.Array):
    """Fused compositing over one tile chunk with an **analytic backward**.

    This is the hot op of the tiled rasterizer.  Reverse-differentiating the
    forward formulation (exclusive ``cumprod`` + ``prod`` + ``take_along_axis``)
    leaves XLA with the generic transposes of those scans, which profiled at
    ~10x the forward cost at 1M Gaussians / 720p.  The analytic VJP is the
    same suffix-sum recurrence the CUDA rasterizer's backward kernel uses
    (back-to-front accumulation): for L = sum_k w_k r_k with
    w_k = a_k prod_{j<k}(1-a_j),

        dL/da_i = T_i r_i - (sum_{k>i} w_k r_k) / (1 - a_i),

    i.e. one extra einsum (r) plus one reverse cumsum — backward ~= forward.

    Args:
        alphas: [T, P, K] per-(tile, pixel, splat) alphas, front-to-back
            along K, exactly 0 where masked (see :func:`splat_alpha`).
        tpix: [T, P, K] per-pixel plane-corrected splat depths.
        values: [T, K, V] per-splat composited channels (colors ++ normals).

    Returns:
        (out_v [T,P,V], alpha_out [T,P], depth_acc [T,P], median [T,P]).
        ``depth_acc`` is the unnormalized expected depth; callers divide by
        alpha if requested.  Median-depth gradients flow through the selected
        splat's depth only (selection index is piecewise constant).
    """
    out, _ = _composite_chunk_fwd(alphas, tpix, values)
    return out


def _composite_chunk_fwd(alphas, tpix, values):
    # Transmittance via exp(cumsum(log1p(-a))) with the cumsum as an MXU
    # triangular matmul (see :func:`cumsum_mxu`): XLA's cumprod lowering is
    # a 128-wide reduce-window costing ~27 ms per 720p render loop plus
    # layout copies.  log1p/exp are one transcendental pass each — cheaper
    # than the scan — and the exclusive scan falls out by subtracting the
    # element (no shift/concat pass).  alphas <= 0.999 keeps log1p finite.
    log1m = jnp.log1p(-alphas)
    cum = cumsum_mxu(log1m)
    t_incl = jnp.exp(cum)
    t_excl = jnp.exp(cum - log1m)
    w = alphas * t_excl
    t_total = t_incl[..., -1]
    out_v = jnp.einsum("tpk,tkv->tpv", w, values,
                       precision=_value_precision())
    alpha_out = 1.0 - t_total
    depth_acc = jnp.sum(w * tpix, axis=-1)
    # Median index without a second [T,P,K] scan: the accumulated weight
    # sum telescopes (sum_{j<=k} w_j == 1 - t_incl_k), so the 0.5-crossing
    # test reuses the transmittance scan.  Restrict candidates to live
    # slots (alpha > 0): with the blocked matmul scan, t_incl at a masked
    # slot can differ from its predecessor by ~1 ulp, so an unguarded
    # argmax could select a masked lane right at a block boundary and read
    # its (meaningless) depth.
    crossed = (t_incl <= 0.5) & (alphas > 0.0)
    # ONE argmax for both the crossing index and the max-weight fallback:
    # crossed slots get a key >= 2 decreasing in k (so the FIRST crossing
    # wins), uncrossed slots keep w in [0, 1) (so argmax(w)'s first-max
    # tie-break is preserved when nothing crosses).  Replaces two [T,P,K]
    # argmax reductions + an any() with a single fused reduction (~2 ms of
    # the 720p forward loop, and again in the remat replay).
    k_iota = jax.lax.broadcasted_iota(jnp.int32, alphas.shape, alphas.ndim - 1)
    k = alphas.shape[-1]
    med_key = jnp.where(
        crossed, 2.0 + (k - k_iota).astype(alphas.dtype) / k, w
    )
    idx = jnp.argmax(med_key, axis=-1)
    # One-hot masked sum instead of take_along_axis: the [T,P] gather is
    # latency-bound on TPU (~0.2 ms per chunk); the masked reduction fuses
    # into the surrounding element-wise passes.
    median = jnp.sum(jnp.where(k_iota == idx[..., None], tpix, 0.0), axis=-1)
    median = jnp.where(alpha_out > 0.0, median, 0.0)
    # Name every backward residual so a `save_only_these_names` checkpoint
    # policy (RenderOptions.remat_compositing=False) can pin exactly these
    # across the chunk loop: the backward then skips the forward replay of
    # the exp pass, the transmittance scan, and the median selection, while
    # cheap slice/du/dv math is still recomputed.  Under the default full
    # remat (policy-less jax.checkpoint) the names are inert.
    res = tuple(
        checkpoint_name(r, "composite_residuals")
        for r in (alphas, tpix, values, idx, t_excl, t_total)
    )
    return (out_v, alpha_out, depth_acc, median), res


def _composite_chunk_bwd(res, cot):
    alphas, tpix, values, idx, t_excl, t_total = res
    g_v, g_alpha, g_depth, g_med = cot
    w = alphas * t_excl

    # Per-(pixel, splat) value-cotangent r_k = values_k . g_v + g_depth*tpix_k.
    r = jnp.einsum("tpv,tkv->tpk", g_v, values,
                   precision=_value_precision()) + g_depth[..., None] * tpix
    s = w * r
    # Exclusive suffix sum: sum_{k>i} s_k (MXU matmul, not a reduce-window).
    suffix = cumsum_mxu(s, reverse=True) - s
    # alphas <= ALPHA_MAX = 0.999, so 1-a >= 1e-3; masked slots have a == 0.
    inv1m = 1.0 / jnp.maximum(1.0 - alphas, 1.0 - ALPHA_MAX)
    d_alphas = (
        t_excl * r
        - suffix * inv1m
        + (g_alpha * t_total)[..., None] * inv1m
    )

    d_values = jnp.einsum("tpk,tpv->tkv", w, g_v,
                          precision=_value_precision())

    g_med = jnp.where(t_total < 1.0, g_med, 0.0)  # median masked at alpha==0
    k = alphas.shape[-1]
    onehot = (
        jnp.arange(k, dtype=jnp.int32) == idx[..., None]
    ).astype(alphas.dtype)
    d_tpix = w * g_depth[..., None] + g_med[..., None] * onehot
    return d_alphas, d_tpix, d_values


composite_chunk.defvjp(_composite_chunk_fwd, _composite_chunk_bwd)


# ---------------------------------------------------------------------------
# Fused tile-chunk compositor: ONE custom VJP from the gathered per-splat
# matrix g to the composited maps.
#
# Motivation (profiled at 1M/720p): with the VJP boundary at
# ``composite_chunk(alphas, tpix, values)``, the [T, P, K] tensors
# ``alphas``/``tpix`` and their cotangents are forced into HBM at the
# boundary (4 x 1.9 GB per chunk loop), and the autodiffed splat_alpha
# chain materializes several more.  Widening the boundary to span
# g -> outputs leaves XLA only the *matmul operands* (the transmittance
# scan input/output and the value-einsum weight matrix) as unavoidable
# [T, P, K] materializations; every other elementwise chain (du/dv/sigma/
# alpha/tpix/median) fuses into the reduction fusions that consume it.
# The backward is the same suffix-sum recurrence as _composite_chunk_bwd
# (the CUDA rasterizer's back-to-front accumulation, gsplat-rade kernel
# consumed at /root/reference/collab_splats/models/rade_gs_model.py:439),
# extended analytically through the alpha chain to per-splat gradients.
# ---------------------------------------------------------------------------

# Column layout of g (== ops.rasterize PG_* without the leading gather):
#   0 u, 1 v | 2 a, 3 b, 4 c (conic) | 5 depth | 6,7 plane | 8 opacity |
#   9.. values (normal ++ colors).
_G_VALS = 9


def _fused_fwd_common(g, sink, msk, up, vp, near_plane):
    """Shared forward math; returns everything the bwd recurrence needs."""
    mean_u = g[..., 0] + sink[..., 0]                  # [T, K]
    mean_v = g[..., 1] + sink[..., 1]
    du = up[:, :, None] - mean_u[:, None, :]           # [T, P, K]
    dv = vp[:, :, None] - mean_v[:, None, :]
    a = g[:, None, :, 2]
    b = g[:, None, :, 3]
    c = g[:, None, :, 4]
    sigma = 0.5 * (a * du * du + c * dv * dv) + b * du * dv
    alpha_raw = g[:, None, :, 8] * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    alpha = jnp.minimum(alpha_raw, ALPHA_MAX)
    keep = (msk[:, None, :] > 0) & (alpha >= ALPHA_CUTOFF) & (sigma >= 0.0)
    alpha = jnp.where(keep, alpha, 0.0)
    log1m = jnp.log1p(-alpha)
    cum = cumsum_mxu(log1m)
    t_excl = jnp.exp(cum - log1m)
    # w = alpha * t_excl, with alpha reconstructed as -expm1(log1m) so the
    # consumer fusions read only (cum, log1m) — no cancellation (expm1) and
    # no separately materialized alpha buffer.
    w = t_excl * -jnp.expm1(log1m)
    tpix = jnp.clip(
        g[:, None, :, 5] + g[:, None, :, 6] * du + g[:, None, :, 7] * dv,
        near_plane, None,
    )
    return du, dv, sigma, alpha_raw, keep, log1m, cum, t_excl, w, tpix


def _fused_outputs(g, w, cum, log1m, tpix, differentiable=False):
    t_total = jnp.exp(cum[..., -1])
    out_v = jnp.einsum("tpk,tkv->tpv", w, g[..., _G_VALS:],
                       precision=_value_precision())
    alpha_out = 1.0 - t_total
    depth_acc = jnp.sum(w * tpix, axis=-1)
    # Median: first splat where accumulated opacity crosses 0.5, i.e.
    # t_incl = exp(cum) <= 0.5  <=>  cum <= log(0.5); live slots only
    # (log1m < 0).  Crossing/fallback key as in _composite_chunk_fwd, but
    # the selected depth and index come out of ONE variadic reduce
    # (argmax-by-key with first-max tie-break) instead of an argmax pass
    # plus a one-hot selection pass — two [T,P,K] reduction fusions were
    # ~10 ms of the 1M/720p forward loop (profiled r4).
    crossed = (cum <= -0.6931471805599453) & (log1m < 0.0)
    k = w.shape[-1]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    med_key = jnp.where(crossed, 2.0 + (k - k_iota).astype(w.dtype) / k, w)
    if differentiable:
        # lax.reduce with a custom combiner has no AD rule; autodiff
        # consumers (the f64 exactness test, any non-custom-VJP use) get
        # the argmax + one-hot selection — mathematically the same
        # first-max pick, with the tpix gradient flowing through the
        # selected slot exactly as the analytic backward's one-hot term.
        idx = jnp.argmax(med_key, axis=-1)
        median = jnp.sum(
            jnp.where(k_iota == idx[..., None], tpix, 0.0), axis=-1)
    else:
        def _pick(a, b):
            k1, t1, i1 = a
            k2, t2, i2 = b
            first = (k1 > k2) | ((k1 == k2) & (i1 <= i2))
            return (jnp.where(first, k1, k2), jnp.where(first, t1, t2),
                    jnp.where(first, i1, i2))

        _, median, idx = jax.lax.reduce(
            (med_key, tpix, k_iota),
            (jnp.asarray(-jnp.inf, med_key.dtype),
             jnp.asarray(0.0, tpix.dtype), jnp.int32(k)),
            _pick, (med_key.ndim - 1,),
        )
    median = jnp.where(alpha_out > 0.0, median, 0.0)
    return out_v, alpha_out, depth_acc, median, idx, t_total


@functools.lru_cache(maxsize=None)
def fused_compositor(near_plane: float):
    """Build the fused g -> maps compositor for a given near plane.

    Returns a function ``f(g, sink, msk, up, vp) -> (out_v, alpha, depth_acc,
    median)`` with an analytic VJP producing ``(d_g, d_sink, 0, 0, 0)``:

      * g: [T, K, 9 + V] gathered per-splat rows (see _G_VALS layout).
      * sink: [T, K, 2] additive screen-space gradient sink (zeros; its
        cotangent is the per-(tile, splat) absgrad statistic).
      * msk: [T, K] float validity (1.0 live, 0.0 dead).
      * up, vp: [T, P] pixel-center coordinates of the tile's pixels.

    ``out_v`` carries the composited value channels in g's column order
    (normal ++ colors for the production layout).
    """

    @jax.custom_vjp
    def f(g, sink, msk, up, vp):
        du, dv, sigma, alpha_raw, keep, log1m, cum, t_excl, w, tpix = (
            _fused_fwd_common(g, sink, msk, up, vp, near_plane))
        out_v, alpha_out, depth_acc, median, _, _ = _fused_outputs(
            g, w, cum, log1m, tpix)
        return out_v, alpha_out, depth_acc, median

    def fwd(g, sink, msk, up, vp):
        du, dv, sigma, alpha_raw, keep, log1m, cum, t_excl, w, tpix = (
            _fused_fwd_common(g, sink, msk, up, vp, near_plane))
        out_v, alpha_out, depth_acc, median, idx, t_total = _fused_outputs(
            g, w, cum, log1m, tpix)
        return (out_v, alpha_out, depth_acc, median), (
            g, sink, msk, up, vp, idx, t_total)

    def bwd(res, cot):
        g, sink, msk, up, vp, idx, t_total = res
        d_g, d_sink = fused_bwd_from_g(g, sink, msk, up, vp, idx, t_total,
                                       cot, near_plane)
        return (d_g, d_sink, jnp.zeros_like(msk),
                jnp.zeros_like(up), jnp.zeros_like(vp))

    f.defvjp(fwd, bwd)
    return f


def fused_bwd_from_g(g, sink, msk, up, vp, idx, t_total, cot, near_plane):
    """Analytic backward of the fused compositor (shared by the XLA and
    Pallas-forward paths): recomputes the forward chains from ``g`` and
    reduces pixel cotangents to per-(tile, splat) gradients via moment
    matmuls.  Returns ``(d_g, d_sink)``."""
    g_v, g_alpha, g_depth, g_med = cot
    # Recompute the forward chains; XLA fuses them into the consuming
    # reductions (cum's scan is one extra MXU triangular matmul).
    du, dv, sigma, alpha_raw, keep, log1m, cum, t_excl, w, tpix = (
        _fused_fwd_common(g, sink, msk, up, vp, near_plane))

    vals = g[..., _G_VALS:]
    # r_k = dL/dw_k; s/suffix implement the back-to-front recurrence.
    r = jnp.einsum("tpv,tkv->tpk", g_v, vals,
                   precision=_value_precision()) + g_depth[..., None] * tpix
    s = w * r
    suffix = cumsum_mxu(s, reverse=True) - s
    inv1m = jnp.exp(-log1m)   # 1/(1-alpha); ==1 at masked slots
    d_alpha = (
        t_excl * r
        - suffix * inv1m
        + (g_alpha * t_total)[..., None] * inv1m
    )

    # Median contribution to tpix (selection index is piecewise const).
    g_med = jnp.where(t_total < 1.0, g_med, 0.0)
    k = w.shape[-1]
    k_iota = jax.lax.broadcasted_iota(jnp.int32, w.shape, w.ndim - 1)
    onehot = (k_iota == idx[..., None]).astype(w.dtype)
    d_tpix = w * g_depth[..., None] + g_med[..., None] * onehot
    # tpix = clip(raw, near_plane, None): zero gradient where clamped.
    tpix_raw = g[:, None, :, 5] + g[:, None, :, 6] * du \
        + g[:, None, :, 7] * dv
    d_tpix = jnp.where(tpix_raw >= near_plane, d_tpix, 0.0)

    # Through alpha = where(keep, min(alpha_raw, MAX), 0).
    d_alpha_raw = jnp.where(keep & (alpha_raw < ALPHA_MAX), d_alpha, 0.0)
    d_opac_pk = d_alpha_raw * jnp.exp(-jnp.clip(sigma, 0.0, 50.0))
    d_sigma = jnp.where(
        (sigma >= 0.0) & (sigma <= 50.0), -alpha_raw * d_alpha_raw, 0.0
    )

    # Pixel reductions as MOMENT MATMULS.  du = up - mu is separable in
    # (pixel, splat), so every per-splat gradient column is a linear
    # combination of low-order pixel moments of d_sigma / d_tpix:
    #
    #   S_m = sum_p d_sigma * [1, u, v, u^2, u*v, v^2]_p     (6 moments)
    #   T_m = sum_p d_tpix  * [1, u, v]_p                    (3 moments)
    #
    # computed as two batched [P,K]^T @ [P,m] einsums on the MXU.  As
    # eight separate sum-over-p fusions these re-streamed the [T,P,K]
    # chains from HBM eight times (profiled: the backward chunk loop
    # regressed to 65 ms); as einsums, d_sigma and d_tpix materialize
    # once each.  Pixel coordinates are TILE-LOCAL (offset by the
    # tile's first pixel) so the moment recombination below cancels
    # ~tile-sized rather than ~image-sized terms (f32-safe).
    u0 = up[:, :1]                                  # [T, 1]
    v0 = vp[:, :1]
    up_l = up - u0                                  # [T, P] in [0, ts)
    vp_l = vp - v0
    basis = jnp.stack(
        [jnp.ones_like(up_l), up_l, vp_l,
         up_l * up_l, up_l * vp_l, vp_l * vp_l], axis=-1)   # [T, P, 6]
    # HIGHEST is mandatory here, not a tuning knob: moments_to_dg
    # recombines these moments with near-cancelling differences
    # (sdu = s10 - mu*s00), and one-pass bf16 moments turn d_mean — and
    # with it the absgrad densification statistic — into noise (observed:
    # ~3x over-densification and a 7 dB step-500 PSNR gap vs the same run
    # on CPU f32).  The einsums are HBM-streaming-bound, so the extra MXU
    # passes are ~free.
    S = jnp.einsum("tpk,tpm->tkm", d_sigma, basis,
                   precision=jax.lax.Precision.HIGHEST)      # [T, K, 6]
    T3 = jnp.einsum("tpk,tpm->tkm", d_tpix, basis[..., :3],
                    precision=jax.lax.Precision.HIGHEST)     # [T, K, 3]
    d_opac = jnp.sum(d_opac_pk, axis=1)
    d_vals = jnp.einsum("tpk,tpv->tkv", w, g_v,
                        precision=_value_precision())
    return moments_to_dg(g, sink, S, T3, d_opac, d_vals, u0, v0)


def moments_to_dg(g, sink, S, T3, d_opac, d_vals, u0, v0):
    """Recombine tile-local pixel moments into per-splat gradients.

    Shared tail of the fused backward: the XLA path computes the moments
    with two einsums, the batched Pallas backward kernel
    (ops/pallas/batched_bwd.py) reduces them in VMEM — both end here.

    Args:
        g: [T, K, 9 + V] gathered per-splat rows; sink [T, K, 2].
        S: [T, K, 6] moments of d_sigma against (1, u, v, u², uv, v²).
        T3: [T, K, 3] moments of d_tpix against (1, u, v).
        d_opac: [T, K]; d_vals: [T, K, V].
        u0, v0: [T, 1] tile-local pixel origin (first pixel center).

    Returns:
        (d_g [T, K, 9 + V], d_sink [T, K, 2]).
    """
    s00, s10, s01 = S[..., 0], S[..., 1], S[..., 2]
    s20, s11, s02 = S[..., 3], S[..., 4], S[..., 5]
    t00, t10, t01 = T3[..., 0], T3[..., 1], T3[..., 2]

    mu = (g[..., 0] + sink[..., 0]) - u0            # [T, K] tile-local
    mv = (g[..., 1] + sink[..., 1]) - v0
    ga = g[..., 2]
    gb = g[..., 3]
    gc = g[..., 4]
    pu = g[..., 6]
    pv = g[..., 7]
    # sum_p d_sigma * du = s10 - mu*s00 (and dv analogously).
    sdu = s10 - mu * s00
    sdv = s01 - mv * s00
    d_mean_u = -(ga * sdu + gb * sdv + pu * t00)
    d_mean_v = -(gc * sdv + gb * sdu + pv * t00)
    d_a = 0.5 * (s20 - 2.0 * mu * s10 + mu * mu * s00)
    d_b = s11 - mu * s01 - mv * s10 + mu * mv * s00
    d_c = 0.5 * (s02 - 2.0 * mv * s01 + mv * mv * s00)
    d_depth = t00
    d_plane_u = t10 - mu * t00
    d_plane_v = t01 - mv * t00

    d_g = jnp.concatenate(
        [
            d_mean_u[..., None], d_mean_v[..., None],
            d_a[..., None], d_b[..., None], d_c[..., None],
            d_depth[..., None],
            d_plane_u[..., None], d_plane_v[..., None],
            d_opac[..., None],
            d_vals,
        ],
        axis=-1,
    )
    d_sink = d_g[..., 0:2]
    return d_g, d_sink


def composite(
    alphas: jax.Array,
    depth_per_pixel: jax.Array,
    colors: jax.Array,
    normals: jax.Array,
    normalize_depth: bool = True,
) -> CompositeOutput:
    """Front-to-back composite along the trailing splat axis L.

    Args:
        alphas: [..., L] per-splat alphas, **ordered front to back** along L.
        depth_per_pixel: [..., L] per-splat depth at this pixel (the RaDe
            plane-corrected depth ``t_c + plane . d``).
        colors: [..., L, C].
        normals: [..., L, 3] camera-space unit normals.
        normalize_depth: divide expected depth by accumulated alpha (avoids
            the toward-zero bias at semi-transparent pixels; the map is still
            masked by ``alpha > 0`` downstream exactly like the reference at
            rade_gs_model.py:248-254).

    Returns:
        :class:`CompositeOutput`; median depth gradients flow through the
        depth of the selected splat (the crossing index itself is a stopped
        gradient, matching the piecewise-constant selection of the CUDA
        kernel).
    """
    weights = transmittance_weights(alphas)                     # [..., L]

    # 1 - prod(1-a): algebraically equals sum(weights) but cannot round
    # above 1.0 in f32.
    alpha_out = 1.0 - jnp.prod(1.0 - alphas, axis=-1)
    color_out = jnp.sum(weights[..., None] * colors, axis=-2)
    normal_out = jnp.sum(weights[..., None] * normals, axis=-2)

    depth_acc = jnp.sum(weights * depth_per_pixel, axis=-1)
    if normalize_depth:
        depth_out = depth_acc / jnp.clip(alpha_out, 1e-10, None)
    else:
        depth_out = depth_acc

    median = median_select(weights, depth_per_pixel)
    median = jnp.where(alpha_out > 0.0, median, 0.0)

    return CompositeOutput(
        color=color_out,
        alpha=alpha_out,
        depth=depth_out,
        median_depth=median,
        normal=normal_out,
        weights=weights,
    )
