"""Gaussian parameter pytree: creation, activation, capacity padding.

The parameter layout follows the reference's ``gauss_params`` (nerfstudio
Splatfacto, inherited at rade_gs_model.py:58): ``means`` [C,3], ``scales``
[C,3] log-space, ``quats`` [C,4] wxyz, ``opacities`` [C,1] logit-space,
``features_dc`` [C,3], ``features_rest`` [C,K-1,3], optional
``distill_features`` [C,L] (rade_features_model.py:90-93).

TPU-native twist: arrays are allocated at a fixed *capacity* C >= N with an
``alive`` mask so densify/prune keeps static shapes under ``jit``
(SURVEY.md §7 hard part 3).  Dead rows have opacity forced to 0 and are
additionally culled by the projection mask.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.sh import num_sh_bases, rgb_to_sh0

GaussianParams = Dict[str, jax.Array]

# Parameter-dict entries that are NOT per-Gaussian capacity arrays (skipped
# by padding / refinement row machinery).
NON_GAUSSIAN_KEYS = ("decoder", "camera_opt", "bilateral_grid")


def init_from_points(
    points: jax.Array,
    colors: jax.Array,
    key: jax.Array,
    sh_degree: int = 3,
    capacity: int | None = None,
    init_opacity: float = 0.1,
    latent_dim: int = 0,
) -> tuple[GaussianParams, jax.Array]:
    """Splatfacto-style initialization from a (SfM) point cloud.

    Scales are the log of the mean distance to the 3 nearest neighbors;
    opacities start at logit(0.1); SH rest coefficients at zero.

    Returns:
        (params, alive) where arrays have leading dim ``capacity``
        (defaults to the point count).
    """
    n = points.shape[0]
    capacity = capacity or n
    assert capacity >= n

    # Mean distance to 3 nearest neighbors (O(N^2); init-time only).
    d2 = jnp.sum((points[:, None, :] - points[None, :, :]) ** 2, axis=-1)
    d2 = d2 + jnp.eye(n) * 1e10
    knn = jnp.sort(d2, axis=-1)[:, :3]
    avg_dist = jnp.mean(jnp.sqrt(jnp.clip(knn, 1e-12, None)), axis=-1)
    log_scales = jnp.log(avg_dist)[:, None].repeat(3, axis=1)

    quats = jax.random.normal(key, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)

    logit_op = float(jnp.log(init_opacity / (1 - init_opacity)))
    params = {
        "means": points.astype(jnp.float32),
        "scales": log_scales.astype(jnp.float32),
        "quats": quats.astype(jnp.float32),
        "opacities": jnp.full((n, 1), logit_op, jnp.float32),
        "features_dc": rgb_to_sh0(colors).astype(jnp.float32),
        "features_rest": jnp.zeros(
            (n, num_sh_bases(sh_degree) - 1, 3), jnp.float32
        ),
    }
    if latent_dim:
        params["distill_features"] = jnp.zeros((n, latent_dim), jnp.float32)

    alive = jnp.arange(capacity) < n
    params = pad_to_capacity(params, capacity)
    return params, alive


def pad_to_capacity(params: GaussianParams, capacity: int) -> GaussianParams:
    """Pad every per-Gaussian array's leading dim to ``capacity``.

    Non-array entries (e.g. the nested ``decoder`` parameter subtree of the
    rade-features model) pass through untouched.
    """

    def pad(name, x):
        if not hasattr(x, "shape"):
            return x
        n = x.shape[0]
        if n == capacity:
            return x
        pad_width = [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1)
        if name == "quats":
            fill = jnp.zeros((capacity - n,) + x.shape[1:], x.dtype)
            fill = fill.at[:, 0].set(1.0)
            return jnp.concatenate([x, fill], axis=0)
        if name == "opacities":
            return jnp.pad(x, pad_width, constant_values=-10.0)
        if name == "scales":
            # Log-scale 0 would make dead rows UNIT-size Gaussians: invisible
            # (opacity ~0) but binned over dozens of tiles each, flooding the
            # intersection buffer and evicting real splats from tile windows
            # at scale.  exp(-15) ~ 3e-7 keeps them sub-pixel; binning also
            # culls dead rows explicitly via the alive mask (ops/rasterize).
            return jnp.pad(x, pad_width, constant_values=-15.0)
        return jnp.pad(x, pad_width)

    return {
        k: (v if isinstance(v, dict) or k in NON_GAUSSIAN_KEYS else pad(k, v))
        for k, v in params.items()
    }


def grow_capacity(
    params: GaussianParams, alive: jax.Array, new_capacity: int
) -> tuple[GaussianParams, jax.Array]:
    """Host-side capacity growth (forces one recompile downstream)."""
    out = pad_to_capacity(params, new_capacity)
    alive = jnp.pad(alive, (0, new_capacity - alive.shape[0]))
    return out, alive


def activated_opacity(params: GaussianParams, alive: jax.Array) -> jax.Array:
    """Sigmoid opacity, zeroed on dead rows."""
    return jax.nn.sigmoid(params["opacities"][:, 0]) * alive.astype(jnp.float32)


def activated_scales(params: GaussianParams) -> jax.Array:
    return jnp.exp(params["scales"])


def num_alive(alive: jax.Array) -> jax.Array:
    return jnp.sum(alive.astype(jnp.int32))
