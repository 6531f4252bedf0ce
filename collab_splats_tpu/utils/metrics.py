"""Quantitative metrics + Gaussian->pixel projection lookup.

Behavioral equivalents of /root/reference/collab_splats/utils/utils.py:
``project_gaussians`` (:13-40, flat-pixel lookup tensors from rasterizer
meta), mesh ``calculate_accuracy`` / ``calculate_completeness`` (:43-60,
KD-tree percentile metrics), and ``mean_angular_error`` (:63-81).
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from ..ops.rasterize import RenderMeta


def project_gaussians(meta: RenderMeta) -> Dict[str, np.ndarray]:
    """Flat-pixel lookup arrays for every Gaussian in a render.

    Mirrors the reference's consumption of the gsplat ``info`` dict
    (utils.py:19-40): visibility from radius > 1, rounded 2D centers
    clamped into the image, flattened to ``x + y * W``.
    """
    w, h = meta.width, meta.height
    radii = np.asarray(meta.proj.radius)
    valid_mask = radii > 1.0
    gaussian_ids = np.nonzero(valid_mask)[0]

    xy = np.round(np.asarray(meta.proj.mean2d)).astype(np.int64)
    x = np.clip(xy[:, 0], 0, w - 1)
    y = np.clip(xy[:, 1], 0, h - 1)
    return {
        "proj_flattened": x + y * w,
        "proj_depths": np.asarray(meta.proj.depth),
        "valid_mask": valid_mask,
        "gaussian_ids": gaussian_ids,
    }


def calculate_accuracy(
    reconstructed_points: np.ndarray,
    reference_points: np.ndarray,
    percentile: float = 90,
) -> float:
    """Distance below which ``percentile``% of reconstructed points lie from
    the reference cloud."""
    tree = cKDTree(np.asarray(reference_points))
    distances, _ = tree.query(np.asarray(reconstructed_points))
    return float(np.percentile(distances, percentile))


def calculate_completeness(
    reconstructed_points: np.ndarray,
    reference_points: np.ndarray,
    threshold: float = 0.05,
) -> float:
    """Percentage of reference points within ``threshold`` of the
    reconstruction."""
    tree = cKDTree(np.asarray(reconstructed_points))
    distances, _ = tree.query(np.asarray(reference_points))
    return float(np.sum(distances < threshold) / len(distances) * 100.0)


def mean_angular_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel angular error (radians) between normal maps.

    Accepts [..., 3] maps (channel-last; the reference's [B, C, H, W]
    layout transposes into this).
    """
    dots = jnp.clip(jnp.sum(pred * gt, axis=-1), -1.0, 1.0)
    return jnp.arccos(dots)
