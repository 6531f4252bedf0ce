"""Dense TSDF fusion in JAX — the default mesh-extraction volume.

TPU-native replacement for Open3D's ``ScalableTSDFVolume`` as the reference
uses it (utils/mesh.py:1562-1630, the ``Open3DTSDFFusion`` default exporter:
voxel 0.01, sdf_trunc 0.03, depth_trunc 1.0, one ``volume.integrate(RGBD,
K, inv(c2w))`` per training frame with the model's median depth).  A dense
[X, Y, Z] grid replaces the sparse scalable volume: at the reference's
defaults over a normalized scene the grid is a few hundred MB of HBM, and
per-frame integration is a pure gather + elementwise update that `jit`s to
one fused TPU program (and shards trivially over the grid if needed).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera


@dataclasses.dataclass(frozen=True)
class TSDFConfig:
    """Defaults mirror docs/splats/configs/base.yaml:32-42."""

    voxel_size: float = 0.01
    sdf_trunc: float = 0.03
    depth_trunc: float = 1.0      # ignore depth beyond this (depth_trunc)
    origin: Tuple[float, float, float] = (-1.0, -1.0, -1.0)
    dims: Tuple[int, int, int] = (200, 200, 200)
    feature_dim: int = 0          # optional extra channels (latents)


class TSDFVolume(NamedTuple):
    tsdf: jax.Array      # [X, Y, Z] truncated signed distance in [-1, 1]
    weight: jax.Array    # [X, Y, Z]
    color: jax.Array     # [X, Y, Z, 3]
    features: Optional[jax.Array]  # [X, Y, Z, F] or None


def create_volume(config: TSDFConfig) -> TSDFVolume:
    dims = config.dims
    feats = (
        jnp.zeros(dims + (config.feature_dim,), jnp.float32)
        if config.feature_dim
        else None
    )
    return TSDFVolume(
        tsdf=jnp.ones(dims, jnp.float32),
        weight=jnp.zeros(dims, jnp.float32),
        color=jnp.zeros(dims + (3,), jnp.float32),
        features=feats,
    )


def volume_from_bounds(
    lo: np.ndarray, hi: np.ndarray, voxel_size: float = 0.01,
    sdf_trunc: float = 0.03, depth_trunc: float = 1.0, feature_dim: int = 0,
    max_dim: int = 384,
) -> Tuple[TSDFConfig, TSDFVolume]:
    """Build a config + volume covering [lo, hi] with bounded resolution."""
    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    dims = np.ceil((hi - lo) / voxel_size).astype(int) + 1
    scalef = max(dims.max() / max_dim, 1.0)
    voxel_size = float(voxel_size * scalef)
    dims = np.minimum(np.ceil((hi - lo) / voxel_size).astype(int) + 1, max_dim)
    cfg = TSDFConfig(
        voxel_size=voxel_size,
        sdf_trunc=max(sdf_trunc, 3 * voxel_size),
        depth_trunc=depth_trunc,
        origin=tuple(float(x) for x in lo),
        dims=tuple(int(d) for d in dims),
        feature_dim=feature_dim,
    )
    return cfg, create_volume(cfg)


def integrate(
    volume: TSDFVolume,
    depth: jax.Array,
    rgb: jax.Array,
    camera: Camera,
    config: TSDFConfig,
    features: Optional[jax.Array] = None,
    alpha: Optional[jax.Array] = None,
    alpha_thresh: float = 0.5,
) -> TSDFVolume:
    """Integrate one rendered (depth, rgb[, features]) frame.

    Standard Curless–Levoy weighted TSDF update: each voxel center is
    projected into the camera; voxels within ``sdf_trunc`` behind the
    observed surface along the ray update their running averages.
    """
    dims = config.dims
    xs = jnp.arange(dims[0]) * config.voxel_size + config.origin[0]
    ys = jnp.arange(dims[1]) * config.voxel_size + config.origin[1]
    zs = jnp.arange(dims[2]) * config.voxel_size + config.origin[2]
    grid = jnp.stack(jnp.meshgrid(xs, ys, zs, indexing="ij"), axis=-1)
    pts = grid.reshape(-1, 3)                                # [V, 3] world

    w2c = camera.viewmat()
    p_cam = pts @ w2c[:3, :3].T + w2c[:3, 3]
    z = p_cam[:, 2]
    u = camera.fx * p_cam[:, 0] / jnp.clip(z, 1e-6, None) + camera.cx
    v = camera.fy * p_cam[:, 1] / jnp.clip(z, 1e-6, None) + camera.cy

    ui = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, camera.width - 1)
    vi = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, camera.height - 1)
    in_image = (
        (z > 1e-6)
        & (u >= 0.0) & (u < camera.width)
        & (v >= 0.0) & (v < camera.height)
    )

    d_obs = depth.reshape(camera.height, camera.width)[vi, ui]
    valid_depth = (d_obs > 1e-6) & (d_obs < config.depth_trunc)
    if alpha is not None:
        valid_depth = valid_depth & (
            alpha.reshape(camera.height, camera.width)[vi, ui] > alpha_thresh
        )

    sdf = (d_obs - z) / config.sdf_trunc
    update = in_image & valid_depth & (sdf > -1.0)
    sdf = jnp.clip(sdf, -1.0, 1.0)

    w_old = volume.weight.reshape(-1)
    w_new = w_old + update.astype(jnp.float32)
    w_safe = jnp.clip(w_new, 1.0, None)
    pix = vi * camera.width + ui

    def running_avg(old_flat, obs):
        """Weighted running average on updated voxels; others unchanged."""
        upd = update.reshape(update.shape + (1,) * (obs.ndim - 1))
        wo = w_old.reshape(w_old.shape + (1,) * (obs.ndim - 1))
        ws = w_safe.reshape(w_safe.shape + (1,) * (obs.ndim - 1))
        return jnp.where(upd, (old_flat * wo + obs) / ws, old_flat)

    tsdf_new = running_avg(volume.tsdf.reshape(-1), sdf)
    color_new = running_avg(
        volume.color.reshape(-1, 3), rgb.reshape(-1, 3)[pix]
    )

    feats_new = volume.features
    if features is not None and volume.features is not None:
        f = features.shape[-1]
        feats_new = running_avg(
            volume.features.reshape(-1, f), features.reshape(-1, f)[pix]
        ).reshape(volume.features.shape)

    return TSDFVolume(
        tsdf=tsdf_new.reshape(dims),
        weight=w_new.reshape(dims),
        color=color_new.reshape(dims + (3,)),
        features=feats_new,
    )
