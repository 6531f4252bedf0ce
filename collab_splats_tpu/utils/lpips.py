"""LPIPS perceptual metric (VGG16 backbone) in JAX.

The reference inherits LPIPS from Splatfacto's eval metrics
(/root/reference/collab_splats/models/rade_gs_model.py:58 — nerfstudio's
SplatfactoModel computes psnr/ssim/lpips per eval image).  Architecture:
VGG16 conv stack, unit-normalized activations at relu{1_2,2_2,3_3,4_3,5_3},
per-channel learned linear weights, spatial average, summed over stages
(Zhang et al. 2018).

Weights come from ``scripts/convert_weights.py vgg16`` (torchvision VGG16 +
the lpips package's linear heads).  Without a weights file the metric is
unavailable — callers check :func:`lpips_available` (same gating as the
CLIP/DINO extractors; no meaningless random-weight metric is reported).
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..features.weights import find_weights

# ImageNet normalization as used inside the lpips package ("scaling layer").
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# Stage boundaries: conv index (into the 13 VGG16 convs) after which each
# LPIPS stage ends; max-pool after stages 0..3.
_STAGE_ENDS = (1, 3, 6, 9, 12)


def lpips_available() -> bool:
    return find_weights("vgg16_lpips.npz") is not None


@functools.lru_cache(maxsize=1)
def _load_params() -> Optional[Dict[str, jnp.ndarray]]:
    path = find_weights("vgg16_lpips.npz")
    if path is None:
        return None
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}


def _vgg_stages(params, x):
    """x: [H, W, 3] in [-1, 1] (lpips input convention). Returns the five
    normalized stage activation maps."""
    x = (x - _SHIFT) / _SCALE
    x = x[None].transpose(0, 3, 1, 2)                     # NCHW
    stages = []
    conv_j = 0
    for stage in range(5):
        while True:
            w = params[f"conv{conv_j}.w"]
            b = params[f"conv{conv_j}.b"]
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"),
            ) + b[None, :, None, None]
            x = jax.nn.relu(x)
            end_of_stage = conv_j == _STAGE_ENDS[stage]
            conv_j += 1
            if end_of_stage:
                break
        stages.append(x)
        if stage < 4:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
            )
    return stages


def _lpips_pair(params, a, b):
    sa = _vgg_stages(params, a)
    sb = _vgg_stages(params, b)
    total = 0.0
    for i, (fa, fb) in enumerate(zip(sa, sb)):
        na = fa * jax.lax.rsqrt(jnp.sum(fa * fa, 1, keepdims=True) + 1e-10)
        nb = fb * jax.lax.rsqrt(jnp.sum(fb * fb, 1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2                                # [1, C, h, w]
        lin = params[f"lin{i}"]
        total = total + jnp.mean(jnp.sum(d * lin[None, :, None, None], axis=1))
    return total


@functools.partial(jax.jit, static_argnames=())
def _lpips_jit(params, a, b):
    return _lpips_pair(params, a, b)


def lpips(img0, img1) -> float:
    """LPIPS distance between two [H, W, 3] images in [0, 1].

    Raises ``RuntimeError`` when no converted VGG16 weights are present
    (see module docstring).
    """
    params = _load_params()
    if params is None:
        raise RuntimeError(
            "LPIPS needs converted VGG16 weights: run "
            "scripts/convert_weights.py vgg16 and place vgg16_lpips.npz "
            "under weights/ (see features/weights.py for search paths)."
        )
    a = jnp.asarray(img0, jnp.float32) * 2.0 - 1.0
    b = jnp.asarray(img1, jnp.float32) * 2.0 - 1.0
    return float(_lpips_jit(params, a, b))
