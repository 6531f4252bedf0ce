"""Synthetic scenes: random Gaussians + camera rigs for tests and benchmarks.

The reference has no synthetic-scene tooling (its tests never render,
SURVEY.md §4); this module provides the fixtures the TPU build's golden /
kernel / training tests are anchored on, plus the synthetic-pose generator
promised for the SfM-contract tests (SURVEY.md §2b N3).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera, make_camera
from ..core.sh import num_sh_bases, rgb_to_sh0


def random_gaussian_params(
    key: jax.Array,
    n: int,
    sh_degree: int = 0,
    extent: float = 1.0,
    scale_range: tuple = (0.01, 0.05),
    latent_dim: int = 0,
) -> Dict[str, jax.Array]:
    """Raw (pre-activation) Gaussian parameters as a flat dict pytree.

    Layout matches the reference's ``gauss_params`` (SURVEY.md §2b N2):
    means [N,3], scales [N,3] log-space, quats [N,4] wxyz, opacities [N,1]
    logit-space, features_dc [N,3], features_rest [N,K-1,3], plus optional
    distill_features [N,latent_dim] (rade_features_model.py:90-93).
    """
    keys = jax.random.split(key, 6)
    means = jax.random.uniform(keys[0], (n, 3), minval=-extent, maxval=extent)
    log_scales = jnp.log(
        jax.random.uniform(
            keys[1], (n, 3), minval=scale_range[0], maxval=scale_range[1]
        )
    )
    quats = jax.random.normal(keys[2], (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    opacities = jax.random.uniform(keys[3], (n, 1), minval=0.5, maxval=3.0)
    rgb = jax.random.uniform(keys[4], (n, 3), minval=0.1, maxval=0.9)
    params = {
        "means": means.astype(jnp.float32),
        "scales": log_scales.astype(jnp.float32),
        "quats": quats.astype(jnp.float32),
        "opacities": opacities.astype(jnp.float32),
        "features_dc": rgb_to_sh0(rgb).astype(jnp.float32),
        "features_rest": 0.01
        * jax.random.normal(
            keys[5], (n, num_sh_bases(sh_degree) - 1, 3), dtype=jnp.float32
        ),
    }
    if latent_dim:
        params["distill_features"] = jnp.zeros((n, latent_dim), jnp.float32)
    return params


def look_at_c2w(eye: np.ndarray, target: np.ndarray, up=None) -> np.ndarray:
    """OpenGL camera-to-world looking from ``eye`` toward ``target``."""
    up = np.array([0.0, 0.0, 1.0]) if up is None else np.asarray(up, np.float64)
    forward = target - eye
    forward = forward / np.linalg.norm(forward)
    right = np.cross(forward, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(forward, np.array([0.0, 1.0, 0.0]))
    right = right / np.linalg.norm(right)
    true_up = np.cross(right, forward)
    # OpenGL: x right, y up, z backward (-forward).
    c2w = np.eye(4)
    c2w[:3, 0] = right
    c2w[:3, 1] = true_up
    c2w[:3, 2] = -forward
    c2w[:3, 3] = eye
    return c2w.astype(np.float32)


def orbit_cameras(
    n_cams: int,
    radius: float = 3.0,
    width: int = 128,
    height: int = 128,
    focal: float | None = None,
    elevation: float = 0.4,
    target=(0.0, 0.0, 0.0),
) -> List[Camera]:
    """Cameras orbiting the origin — the synthetic stand-in for SfM poses."""
    target = np.asarray(target, np.float64)
    focal = focal if focal is not None else 1.2 * max(width, height)
    cams = []
    for i in range(n_cams):
        ang = 2.0 * np.pi * i / max(n_cams, 1)
        eye = target + radius * np.array(
            [np.cos(ang), np.sin(ang), np.sin(elevation)]
        )
        c2w = look_at_c2w(eye, target)
        cams.append(
            make_camera(focal, focal, width / 2.0, height / 2.0, width, height, c2w)
        )
    return cams


def write_synthetic_dataset(
    out_dir,
    n_cams: int = 8,
    n_gaussians: int = 300,
    width: int = 64,
    height: int = 64,
    seed: int = 0,
):
    """Render a random Gaussian scene to a nerfstudio-format dataset.

    Produces ``transforms.json`` + ``images/*.png`` + ``sparse.ply`` — the
    exact contract the preprocessing stage (ns-process-data / COLMAP,
    SURVEY.md §2b N3) would produce, letting pipeline tests run with no SfM.

    Returns (out_dir, gt_params, cameras).
    """
    import json
    from pathlib import Path

    from PIL import Image

    from ..core.options import RenderOptions
    from ..models import rade_gs
    from .ply import write_ply

    out_dir = Path(out_dir)
    (out_dir / "images").mkdir(parents=True, exist_ok=True)
    key = jax.random.PRNGKey(seed)
    gt = random_gaussian_params(key, n_gaussians, extent=0.6,
                                scale_range=(0.02, 0.08))
    cams = orbit_cameras(n_cams, radius=2.5, width=width, height=height,
                         focal=1.1 * max(width, height))
    cfg = rade_gs.RadeGSConfig(
        sh_degree=0, background="black",
        render=RenderOptions(tile_capacity=256, max_intersections=1 << 16),
    )
    alive = jnp.ones(n_gaussians, bool)
    frames = []
    for i, cam in enumerate(cams):
        out, _ = rade_gs.get_outputs(gt, alive, cam, 0, cfg, training=False)
        img = np.asarray(jnp.clip(out["rgb"], 0, 1) * 255).astype(np.uint8)
        name = f"images/frame_{i:05d}.png"
        Image.fromarray(img).save(out_dir / name)
        frames.append({
            "file_path": name,
            "transform_matrix": np.asarray(cam.c2w, np.float64).tolist(),
        })
    focal = float(cams[0].K[0, 0])
    meta = {
        "fl_x": focal, "fl_y": focal,
        "cx": width / 2.0, "cy": height / 2.0,
        "w": width, "h": height,
        "camera_model": "OPENCV",
        "ply_file_path": "sparse.ply",
        "frames": frames,
    }
    with open(out_dir / "transforms.json", "w") as f:
        json.dump(meta, f)
    from ..core.sh import sh0_to_rgb

    write_ply(
        str(out_dir / "sparse.ply"),
        np.asarray(gt["means"]),
        colors=np.clip(np.asarray(sh0_to_rgb(gt["features_dc"])), 0, 1),
    )
    return out_dir, gt, cams


def flat_disk_gaussian(
    center=(0.0, 0.0, 0.0), normal=(0.0, 0.0, 1.0), radius=0.3, thickness=1e-3
) -> Dict[str, jax.Array]:
    """One flat disk Gaussian with a known geometric normal (for RaDe tests)."""
    normal = np.asarray(normal, np.float64)
    normal = normal / np.linalg.norm(normal)
    # Build rotation with z-axis = normal, convert to wxyz quaternion.
    helper = np.array([1.0, 0.0, 0.0])
    if abs(np.dot(helper, normal)) > 0.9:
        helper = np.array([0.0, 1.0, 0.0])
    x = np.cross(helper, normal)
    x = x / np.linalg.norm(x)
    y = np.cross(normal, x)
    R = np.stack([x, y, normal], axis=1)
    w = np.sqrt(max(1.0 + R[0, 0] + R[1, 1] + R[2, 2], 1e-12)) / 2.0
    quat = np.array(
        [
            w,
            (R[2, 1] - R[1, 2]) / (4 * w),
            (R[0, 2] - R[2, 0]) / (4 * w),
            (R[1, 0] - R[0, 1]) / (4 * w),
        ]
    )
    return {
        "means": jnp.array([center], jnp.float32),
        "scales": jnp.log(jnp.array([[radius, radius, thickness]], jnp.float32)),
        "quats": jnp.array([quat], jnp.float32),
        "opacities": jnp.array([[4.0]], jnp.float32),  # sigmoid(4) ~ 0.982
        "features_dc": rgb_to_sh0(jnp.array([[0.8, 0.2, 0.2]], jnp.float32)),
        "features_rest": jnp.zeros((1, 0, 3), jnp.float32),
    }
