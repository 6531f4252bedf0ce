"""Camera containers and coordinate-convention math.

TPU-native re-derivation of the reference's camera handling
(`/root/reference/collab_splats/utils/camera_utils.py`):

* ``convert_to_colmap_camera`` (camera_utils.py:74-91): nerfstudio cameras are
  OpenGL convention (x right, y up, z backward); the rasterizer wants COLMAP
  (x right, y down, z forward).  The conversion flips the sign of the y and z
  columns of the camera-to-world rotation, then inverts to world-to-camera.
* ``depth_double_to_normal`` (camera_utils.py:176-279): back-project a pair of
  depth maps through K^-1 pixel rays and take central-difference cross
  products to get per-pixel normal maps (used by the depth-normal-consistency
  loss).

Everything here is pure JAX and differentiable.  Image width/height are static
Python ints (aux data of the pytree) so shapes stay static under ``jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Camera:
    """A single pinhole camera.

    Attributes:
        K: [3, 3] intrinsics ``[[fx, 0, cx], [0, fy, cy], [0, 0, 1]]`` in
            pixel units.
        c2w: [4, 4] camera-to-world transform in **OpenGL** convention
            (y up, z backward) — the nerfstudio/Blender convention used by
            ``transforms.json`` files.
        width, height: static image size in pixels.
    """

    K: jax.Array
    c2w: jax.Array
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    @property
    def fx(self) -> jax.Array:
        return self.K[0, 0]

    @property
    def fy(self) -> jax.Array:
        return self.K[1, 1]

    @property
    def cx(self) -> jax.Array:
        return self.K[0, 2]

    @property
    def cy(self) -> jax.Array:
        return self.K[1, 2]

    def viewmat(self) -> jax.Array:
        """World-to-camera [4, 4] in COLMAP convention (y down, z forward)."""
        return opengl_c2w_to_colmap_w2c(self.c2w)

    def camera_center(self) -> jax.Array:
        """Camera position in world coordinates, [3]."""
        return self.c2w[:3, 3]

    def resized(self, factor: float) -> "Camera":
        """Return a camera rendering at ``1/factor`` of the resolution."""
        scale = 1.0 / factor
        K = self.K.at[:2].multiply(scale)
        return dataclasses.replace(
            self,
            K=K,
            width=int(round(self.width * scale)),
            height=int(round(self.height * scale)),
        )

    def downscaled(self, factor: int) -> "Camera":
        """Integer-factor downscale with floor-division sizes.

        Matches the progressive-resolution semantics of Splatfacto's
        ``rescale_output_resolution`` as used by the reference's
        ``_get_downscale_factor`` (rade_gs_model.py:132): sizes floor-divide
        so the downscaled image (average-pooled with a ``factor``-wide
        kernel) and the camera agree exactly even for odd dimensions.
        """
        if factor <= 1:
            return self
        K = self.K.at[:2].multiply(1.0 / factor)
        return dataclasses.replace(
            self,
            K=K,
            width=self.width // factor,
            height=self.height // factor,
        )


def make_camera(
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    width: int,
    height: int,
    c2w: jax.Array,
) -> Camera:
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], jnp.float32)
    c2w = jnp.asarray(c2w, jnp.float32)
    if c2w.shape == (3, 4):
        c2w = jnp.concatenate(
            [c2w, jnp.array([[0.0, 0.0, 0.0, 1.0]], jnp.float32)], axis=0
        )
    return Camera(K=K, c2w=c2w, width=int(width), height=int(height))


# OpenGL (y up, z back) -> COLMAP/OpenCV (y down, z forward): negate y/z axes.
_GL_TO_CV_DIAG = np.array([1.0, -1.0, -1.0], dtype=np.float32)


def opengl_c2w_to_colmap_w2c(c2w_gl: jax.Array) -> jax.Array:
    """OpenGL camera-to-world -> COLMAP world-to-camera (viewmat).

    Matches the reference's ``c2w[:3, 1:3] *= -1`` followed by a 4x4 inverse
    (camera_utils.py:76-84), but uses the closed-form rigid inverse
    ``[R | t]^-1 = [R^T | -R^T t]`` instead of a general solve.
    """
    R = c2w_gl[:3, :3] * _GL_TO_CV_DIAG[None, :]  # flip y and z columns
    t = c2w_gl[:3, 3]
    R_inv = R.T
    t_inv = -R_inv @ t
    w2c = jnp.zeros((4, 4), dtype=c2w_gl.dtype)
    w2c = w2c.at[:3, :3].set(R_inv)
    w2c = w2c.at[:3, 3].set(t_inv)
    w2c = w2c.at[3, 3].set(1.0)
    return w2c


def focal2fov(focal: float, pixels: int) -> float:
    """Field of view from focal length (camera_utils.py:134-135)."""
    return 2.0 * float(np.arctan(pixels / (2.0 * focal)))


def fov2focal(fov: float, pixels: int) -> float:
    return pixels / (2.0 * float(np.tan(fov / 2.0)))


def pixel_centers(width: int, height: int) -> Tuple[jax.Array, jax.Array]:
    """Pixel-center coordinate grids ``(u, v)``, each [H, W]."""
    u = jnp.arange(width, dtype=jnp.float32) + 0.5
    v = jnp.arange(height, dtype=jnp.float32) + 0.5
    return jnp.broadcast_to(u[None, :], (height, width)), jnp.broadcast_to(
        v[:, None], (height, width)
    )


def camera_rays(camera: Camera) -> jax.Array:
    """Per-pixel camera-space ray directions ``K^-1 @ (u, v, 1)``, [H, W, 3].

    The z component is 1, so ``depth * ray`` gives camera-space points with z
    equal to the (z-)depth — the convention assumed by the reference's
    ``_depths_double_to_points`` (camera_utils.py:191-251).
    """
    u, v = pixel_centers(camera.width, camera.height)
    x = (u - camera.cx) / camera.fx
    y = (v - camera.cy) / camera.fy
    return jnp.stack([x, y, jnp.ones_like(x)], axis=-1)


def depth_to_points(camera: Camera, depth: jax.Array) -> jax.Array:
    """Back-project a z-depth map [H, W] to camera-space points [H, W, 3]."""
    depth = depth.reshape(camera.height, camera.width)
    return camera_rays(camera) * depth[..., None]


def points_to_normal(points: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normals from camera-space points via central differences, [H, W, 3].

    Matches ``_point_double_to_normal`` (camera_utils.py:254-279): the
    "row" derivative (along image height) crossed with the "column"
    derivative (along width), normalized; the one-pixel border is zero.  For
    a camera-facing surface the resulting normal has negative z (pointing
    toward the camera).
    """
    d_row = points[2:, 1:-1, :] - points[:-2, 1:-1, :]
    d_col = points[1:-1, 2:, :] - points[1:-1, :-2, :]
    n = jnp.cross(d_row, d_col)
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + eps)
    out = jnp.zeros_like(points)
    out = out.at[1:-1, 1:-1, :].set(n)
    return out


def depth_pair_to_normal(
    camera: Camera, depth1: jax.Array, depth2: jax.Array
) -> jax.Array:
    """Normal maps from two depth maps, stacked [2, H, W, 3].

    Behavioral equivalent of ``depth_double_to_normal``
    (camera_utils.py:176-189) used by the RaDe-GS depth-normal-consistency
    loss: index 0 derives from ``depth1`` (expected depth), index 1 from
    ``depth2`` (median depth).
    """
    n1 = points_to_normal(depth_to_points(camera, depth1))
    n2 = points_to_normal(depth_to_points(camera, depth2))
    return jnp.stack([n1, n2], axis=0)
