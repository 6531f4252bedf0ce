"""Per-image bilateral-grid appearance correction.

Behavioral equivalent of nerfstudio Splatfacto's bilateral grid (the
``bilateral_grid`` Adam group in the reference optimizer table,
configs/rade_gs_method.py:78-83, applied at rade_gs_model.py:232-234):
each training image owns a small 3D grid over (guidance-luminance, y, x)
of 3x4 affine color transforms, sliced trilinearly per pixel and applied to
the rendered RGB — absorbing per-frame exposure / white-balance so the
Gaussians learn consistent radiance.  A total-variation regularizer keeps
the grids smooth.

Dense trilinear slicing over [H, W] is pure VPU work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .optim import GroupSpec

BILATERAL_GROUP = GroupSpec(
    lr=2e-3, lr_final=1e-4, max_steps=30000, warmup_steps=1000,
    lr_pre_warmup=0.0,
)

_LUMA = jnp.array([0.299, 0.587, 0.114])


def init_bilateral_grids(
    num_images: int, grid_x: int = 16, grid_y: int = 16, grid_z: int = 8
) -> jax.Array:
    """[N, gz, gy, gx, 12] grids initialized to the identity transform."""
    ident = jnp.concatenate(
        [jnp.eye(3).reshape(-1), jnp.zeros(3)]
    )  # row-major 3x3 | bias
    return jnp.tile(
        ident, (num_images, grid_z, grid_y, grid_x, 1)
    ).astype(jnp.float32)


def apply_bilateral_grid(grid: jax.Array, rgb: jax.Array) -> jax.Array:
    """Slice one image's grid [gz, gy, gx, 12] at each pixel and apply the
    affine transform.  ``rgb`` is [H, W, 3] in [0, 1]."""
    gz, gy, gx, _ = grid.shape
    h, w = rgb.shape[:2]
    guide = jnp.clip(jnp.einsum("hwc,c->hw", rgb, _LUMA), 0.0, 1.0)

    fx = jnp.linspace(0.0, gx - 1.0, w)
    fy = jnp.linspace(0.0, gy - 1.0, h)
    fz = guide * (gz - 1.0)

    x0 = jnp.clip(jnp.floor(fx).astype(jnp.int32), 0, gx - 2)
    y0 = jnp.clip(jnp.floor(fy).astype(jnp.int32), 0, gy - 2)
    z0 = jnp.clip(jnp.floor(fz).astype(jnp.int32), 0, gz - 2)
    tx = (fx - x0)[None, :, None]
    ty = (fy - y0)[:, None, None]
    tz = (fz - z0)[..., None]

    x0g = x0[None, :]
    y0g = y0[:, None]

    def take(dz, dy, dx):
        return grid[z0 + dz, y0g + dy, x0g + dx]      # [H, W, 12]

    c = 0.0
    for dz in (0, 1):
        wz = tz if dz else 1.0 - tz
        for dy in (0, 1):
            wy = ty if dy else 1.0 - ty
            for dx in (0, 1):
                wx = tx if dx else 1.0 - tx
                c = c + wz * wy * wx * take(dz, dy, dx)
    mat = c[..., :9].reshape(h, w, 3, 3)
    bias = c[..., 9:]
    out = jnp.einsum("hwij,hwj->hwi", mat, rgb) + bias
    return jnp.clip(out, 0.0, 1.0)


def total_variation_loss(grids: jax.Array) -> jax.Array:
    """Mean squared difference between neighboring grid cells, all axes."""
    tv = 0.0
    for axis in (1, 2, 3):
        d = jnp.diff(grids, axis=axis)
        tv = tv + jnp.mean(d * d)
    return tv
