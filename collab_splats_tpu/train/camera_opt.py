"""Camera-pose optimization: per-camera SO3xR3 adjustments.

Behavioral equivalent of nerfstudio's ``CameraOptimizer`` as the reference
trains it (the ``camera_opt`` Adam group, configs/rade_gs_method.py:72-77:
lr 1e-4 -> 5e-7 with sine warmup): a learned 6-DoF delta per training
camera, applied to the camera-to-world transform before rendering; the
rasterizer being differentiable w.r.t. the view matrix makes the poses
trainable for free.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from .optim import GroupSpec

CAMERA_OPT_GROUP = GroupSpec(
    lr=1e-4, lr_final=5e-7, max_steps=30000, warmup_steps=1000,
    lr_pre_warmup=0.0,
)


def exp_so3(omega: jax.Array) -> jax.Array:
    """Rodrigues: [3] axis-angle -> [3, 3] rotation (small-angle safe)."""
    theta = jnp.sqrt(jnp.sum(omega * omega) + 1e-20)
    k = omega / theta
    kx = jnp.array([
        [0.0, -k[2], k[1]],
        [k[2], 0.0, -k[0]],
        [-k[1], k[0], 0.0],
    ])
    s, c = jnp.sin(theta), jnp.cos(theta)
    r = jnp.eye(3) + s * kx + (1.0 - c) * (kx @ kx)
    # Taylor fallback at theta ~ 0 keeps gradients clean.
    small = theta < 1e-6
    ox = jnp.array([
        [0.0, -omega[2], omega[1]],
        [omega[2], 0.0, -omega[0]],
        [-omega[1], omega[0], 0.0],
    ])
    return jnp.where(small, jnp.eye(3) + ox, r)


def apply_pose_adjustment(camera: Camera, delta: jax.Array) -> Camera:
    """Apply a 6-DoF delta [omega(3), tau(3)] to the camera-to-world pose."""
    rot = exp_so3(delta[:3])
    c2w = camera.c2w
    new_r = rot @ c2w[:3, :3]
    new_t = rot @ c2w[:3, 3] + delta[3:]
    new_c2w = c2w.at[:3, :3].set(new_r).at[:3, 3].set(new_t)
    return dataclasses.replace(camera, c2w=new_c2w)


def init_camera_opt(num_cameras: int) -> jax.Array:
    return jnp.zeros((num_cameras, 6), jnp.float32)
