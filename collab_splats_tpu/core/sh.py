"""Real spherical-harmonics evaluation for Gaussian-splat colors.

TPU-native replacement for ``gsplat.cuda._wrapper.spherical_harmonics``
(used at /root/reference/collab_splats/models/rade_features_model.py:430-434
and inside the reference rasterization call).  Standard real SH basis up to
degree 3 with the constants used across the 3DGS family.

Everything is dense ``jnp`` math — the per-degree masking is a multiply, so
the same compiled program serves every active degree (the degree schedule
changes a traced scalar, not a shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Basis constants (degree 0..3) of the real spherical harmonics.
_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
       -1.0925484305920792, 0.5462742152960396)
_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
       0.3731763325901154, -0.4570457994644658, 1.445305721320277,
       -0.5900435899266435)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh_basis(dirs: jax.Array, num_bases: int) -> jax.Array:
    """Evaluate the SH basis functions for unit directions.

    Args:
        dirs: [..., 3] unit view directions.
        num_bases: static number of bases (1, 4, 9 or 16).

    Returns:
        [..., num_bases] basis values.
    """
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    basis = [_C0 * one]
    if num_bases > 1:
        basis += [-_C1 * y, _C1 * z, -_C1 * x]
    if num_bases > 4:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [
            _C2[0] * xy,
            _C2[1] * yz,
            _C2[2] * (2.0 * zz - xx - yy),
            _C2[3] * xz,
            _C2[4] * (xx - yy),
        ]
    if num_bases > 9:
        xx, yy, zz = x * x, y * y, z * z
        basis += [
            _C3[0] * y * (3.0 * xx - yy),
            _C3[1] * x * y * z,
            _C3[2] * y * (4.0 * zz - xx - yy),
            _C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x * (4.0 * zz - xx - yy),
            _C3[5] * z * (xx - yy),
            _C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(basis, axis=-1)


def degree_mask(num_bases: int, active_degree: jax.Array) -> jax.Array:
    """[num_bases] 0/1 mask enabling bases of degree <= active_degree.

    ``active_degree`` may be a traced scalar (the SH warm-up schedule
    ``step // sh_degree_interval`` from rade_gs_model.py:158-161), keeping the
    compiled train step degree-agnostic.
    """
    idx = jnp.arange(num_bases)
    # Degree of basis b is floor(sqrt(b)).
    degs = jnp.floor(jnp.sqrt(idx.astype(jnp.float32) + 1e-6)).astype(jnp.int32)
    degs = degs.at[0].set(0)
    return (degs <= active_degree).astype(jnp.float32)


def eval_sh(
    coeffs: jax.Array,
    dirs: jax.Array,
    active_degree: jax.Array | int,
) -> jax.Array:
    """Evaluate SH colors.

    Args:
        coeffs: [N, K, 3] SH coefficients (K = (max_degree+1)^2); slot 0 is
            the DC term.
        dirs: [N, 3] (not necessarily unit) directions from the camera center
            to each Gaussian.
        active_degree: scalar active degree (static or traced).

    Returns:
        [N, 3] raw SH colors (no +0.5 shift, no clamping — callers apply
        ``clamp(color + 0.5, min=0)`` like the reference does at
        rade_features_model.py:438).
    """
    num_bases = coeffs.shape[-2]
    norm = jnp.sqrt(jnp.sum(dirs * dirs, axis=-1, keepdims=True) + 1e-12)
    dirs = dirs / norm
    basis = eval_sh_basis(dirs, num_bases)  # [N, K]
    mask = degree_mask(num_bases, jnp.asarray(active_degree))
    return jnp.einsum("nk,nkc->nc", basis * mask[None, :], coeffs)


def rgb_to_sh0(rgb: jax.Array) -> jax.Array:
    """Inverse of the DC-term shift: color = C0 * sh0 + 0.5."""
    return (rgb - 0.5) / _C0


def sh0_to_rgb(sh0: jax.Array) -> jax.Array:
    return sh0 * _C0 + 0.5
