"""Loss stack for RaDe-GS / RaDe-Features training.

Behavioral reference:
* RGB loss = (1 - ssim_lambda) * L1 + ssim_lambda * (1 - SSIM), the
  Splatfacto base loss inherited at rade_gs_model.py:289 (ssim_lambda 0.2).
* Depth-normal consistency: lambda * [(1-r) * mean(E_depth) + r *
  mean(E_middepth)] with lambda=0.05, r=0.6 (rade_gs_model.py:297-304).
* Scale regularization: penalize anisotropy ratios beyond max_gauss_ratio
  (Splatfacto semantics, applied every 10 steps when enabled).
* Cosine feature distillation (rade_features_model.py:545-584).

All pure `jnp`; SSIM is a depthwise convolution that XLA fuses/tiles onto
the TPU conv units.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2 * sigma**2))
    g /= g.sum()
    return g.astype(np.float32)


_WINDOW_1D = _gaussian_window_1d()


def _use_matmul_filter() -> bool:
    """Banded-matmul SSIM filter on TPU; depthwise conv elsewhere.

    The TPU (axon) lowering of the grouped ``conv_general_dilated``
    TRANSPOSE — the VJP of the depthwise filter — returns garbage at
    rendering-sized images: the SSIM *forward* matched CPU to 1e-4 while
    gradients through it came out 1000-25000x off with cosine ~0.04
    (scripts/grad_bisect.py: proj/rsum/l1 stages all cos 1.0000, the
    SSIM-bearing stage alone garbage; finite differences certified the
    CPU gradient).  A banded matrix multiply is the same linear operator
    with an exact, trivially-transposed autodiff rule, and the MXU eats
    [H', H] @ [H, W*C] whole.  Override: COLLAB_SPLATS_SSIM_FILTER=
    conv|matmul.
    """
    import os

    force = os.environ.get("COLLAB_SPLATS_SSIM_FILTER")
    if force == "conv":
        return False
    if force == "matmul":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _band_matrix(n_in: int, window_1d: jax.Array) -> jax.Array:
    """[n_out, n_in] banded matrix applying a 'valid' k-tap correlation:
    ``y_i = sum_j w_j x_{i+j}``.  Built device-side from iota comparisons
    (no large trace constants)."""
    k = window_1d.shape[0]
    n_out = n_in - k + 1
    rows = jnp.arange(n_out)[:, None]                  # [n_out, 1]
    cols = jnp.arange(n_in)[None, :]                   # [1, n_in]
    off = cols - rows                                  # [n_out, n_in]
    inside = (off >= 0) & (off < k)
    return jnp.where(
        inside, window_1d[jnp.clip(off, 0, k - 1)], 0.0
    ).astype(jnp.float32)


def _filter2d_matmul(img: jax.Array, window_1d: jax.Array) -> jax.Array:
    """'valid' separable Gaussian filter of [H, W, C] as two banded
    matmuls (see :func:`_use_matmul_filter`)."""
    h, w, _ = img.shape
    mh = _band_matrix(h, window_1d)                    # [H', H]
    mw = _band_matrix(w, window_1d)                    # [W', W]
    y = jnp.einsum("ih,hwc->iwc", mh, img,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("jw,iwc->ijc", mw, y,
                      precision=jax.lax.Precision.HIGHEST)


def _filter2d(img: jax.Array, window_1d: jax.Array) -> jax.Array:
    """Depthwise 'valid' Gaussian filter of [H, W, C].

    The Gaussian window is separable: two k-tap passes instead of one
    k*k-tap conv (profiled ~5x cheaper at 720p on TPU).
    """
    if _use_matmul_filter():
        return _filter2d_matmul(img, window_1d)
    c = img.shape[-1]
    k = window_1d.shape[0]
    x = img.transpose(2, 0, 1)[None]           # [1, C, H, W]
    w_row = jnp.broadcast_to(
        window_1d[None, None, :, None], (c, 1, k, 1)
    )
    w_col = jnp.broadcast_to(
        window_1d[None, None, None, :], (c, 1, 1, k)
    )
    # HIGHEST: TPU convs default to one-pass bf16, and SSIM consumes these
    # filters in the cancellation E[x^2] - E[x]^2 — bf16 makes the local
    # variance (and 20% of the training loss gradient, ssim_lambda=0.2)
    # noise.  11-tap depthwise convs are negligible FLOPs either way.
    y = jax.lax.conv_general_dilated(
        x, w_row, window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    y = jax.lax.conv_general_dilated(
        y, w_col, window_strides=(1, 1), padding="VALID",
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return y[0].transpose(1, 2, 0)             # [H', W', C]


def ssim(
    img0: jax.Array,
    img1: jax.Array,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jax.Array:
    """Mean SSIM over an [H, W, C] image pair (11x11 Gaussian window)."""
    window = jnp.asarray(_WINDOW_1D)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu0 = _filter2d(img0, window)
    mu1 = _filter2d(img1, window)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = _filter2d(img0 * img0, window) - mu00
    s11 = _filter2d(img1 * img1, window) - mu11
    s01 = _filter2d(img0 * img1, window) - mu01
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return jnp.mean(num / den)


def rgb_loss(
    pred: jax.Array, gt: jax.Array, ssim_lambda: float = 0.2
) -> jax.Array:
    """Splatfacto main loss: (1-l)*L1 + l*(1-SSIM)."""
    l1 = jnp.mean(jnp.abs(pred - gt))
    return (1.0 - ssim_lambda) * l1 + ssim_lambda * (1.0 - ssim(pred, gt))


def psnr(pred: jax.Array, gt: jax.Array, data_range: float = 1.0) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return 10.0 * jnp.log10(data_range**2 / jnp.clip(mse, 1e-12, None))


def depth_normal_loss(
    depth_error_map: jax.Array,
    middepth_error_map: jax.Array,
    depth_ratio: float = 0.6,
    depth_normal_lambda: float = 0.05,
) -> jax.Array:
    """RaDe-GS consistency loss (rade_gs_model.py:297-304)."""
    loss = (1.0 - depth_ratio) * jnp.mean(depth_error_map) \
        + depth_ratio * jnp.mean(middepth_error_map)
    return depth_normal_lambda * loss


def scale_regularization(
    log_scales: jax.Array,
    alive: jax.Array,
    max_gauss_ratio: float = 10.0,
) -> jax.Array:
    """Penalize Gaussians more anisotropic than max_gauss_ratio (Splatfacto)."""
    s = jnp.exp(log_scales)
    ratio = jnp.max(s, axis=-1) / jnp.clip(jnp.min(s, axis=-1), 1e-12, None)
    pen = jnp.maximum(ratio, max_gauss_ratio) - max_gauss_ratio
    denom = jnp.clip(jnp.sum(alive), 1.0, None)
    return 0.1 * jnp.sum(pen * alive) / denom


def cosine_distillation_loss(pred: jax.Array, gt: jax.Array) -> jax.Array:
    """Mean (1 - cosine similarity) over the channel axis 0.

    Matches ``1 - F.cosine_similarity(pred, gt, dim=0)`` with [C, H, W]
    layout (rade_features_model.py:579).
    """
    num = jnp.sum(pred * gt, axis=0)
    den = jnp.sqrt(jnp.sum(pred * pred, axis=0) + 1e-16) * jnp.sqrt(
        jnp.sum(gt * gt, axis=0) + 1e-16
    )
    return jnp.mean(1.0 - num / den)
