"""EWA projection of 3D Gaussians with RaDe-GS ray-plane depth and normals.

TPU-native replacement for the gsplat-rade ``fully_fused_projection`` CUDA
kernel (consumed at /root/reference/collab_splats/models/rade_gs_model.py:373-394,
returning ``radii, means2d, depths, conics, compensations, ray_ts, ray_planes,
normals``).  Pure, differentiable ``jnp`` math over dense [N, ...] arrays —
XLA maps the small per-Gaussian matrix algebra onto the VPU and fuses it; no
scalar loops, no dynamic shapes.

RaDe-GS math (re-derived, not ported):

The 3D Gaussian with camera-space mean ``p = (x, y, z)`` and covariance
``Sigma_c`` is mapped to *ray space* ``(u, v, t)`` (pixel coordinates plus
z-depth) via the local affine approximation with Jacobian

    J3 = [[fx/z, 0, -fx*x/z^2],
          [0, fy/z, -fy*y/z^2],
          [0,    0,         1]]

giving ray-space covariance ``Sigma' = J3 Sigma_c J3^T``.  Its top-left 2x2
block is the classic EWA screen-space covariance.  The density maximum along
the ray through pixel offset ``d = (du, dv)`` from the projected center sits
at depth

    t(d) = t_c + plane . d,   plane = Sigma'_{uv,uv}^{-1} Sigma'_{uv,t}

(the conditional-mean / Schur-complement identity), and the maximum value is
the usual 2D Gaussian with covariance ``Sigma'_{uv,uv}`` — i.e. RaDe-GS
evaluates exactly the EWA splat but additionally rasterizes the per-pixel
depth plane ``t(d)`` and a per-Gaussian normal.  The camera-space normal of
the depth-plane surface, derived by differentiating
``X(u, v) = t(u, v) * K^-1 (u, v, 1)``, is

    n ∝ (-plane_u * fx, -plane_v * fy,
         plane_u * (u_c - cx) + plane_v * (v_c - cy) + t_c)

sign-flipped to face the camera.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Projection(NamedTuple):
    """Per-Gaussian projection results (all leading dim N)."""

    mean2d: jax.Array        # [N, 2] pixel coords of the projected center
    depth: jax.Array         # [N] camera-space z-depth of the center
    conic: jax.Array         # [N, 3] inverse 2D covariance (a, b, c), blurred
    radius: jax.Array        # [N] screen-space bounding radius in pixels
    compensation: jax.Array  # [N] antialias opacity compensation factor
    plane: jax.Array         # [N, 2] RaDe depth-plane gradient (d t / d pixel)
    normal: jax.Array        # [N, 3] camera-space unit normal, camera-facing
    valid: jax.Array         # [N] bool visibility mask
    radius_xy: jax.Array     # [N, 2] per-axis bbox half-extents (<= radius)


def quat_to_rotmat(quats: jax.Array) -> jax.Array:
    """Unit-normalize wxyz quaternions and convert to rotation matrices.

    Behavioral equivalent of ``build_rotation``
    (/root/reference/collab_splats/utils/camera_utils.py:138-168).

    Args:
        quats: [N, 4] in (w, x, y, z) order (not necessarily normalized).

    Returns:
        [N, 3, 3] rotation matrices.
    """
    q = quats / jnp.sqrt(jnp.sum(quats * quats, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - w * z)
    r02 = 2.0 * (x * z + w * y)
    r10 = 2.0 * (x * y + w * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - w * x)
    r20 = 2.0 * (x * z - w * y)
    r21 = 2.0 * (y * z + w * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        axis=-2,
    )


def covariance3d(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """3D covariance ``R diag(s^2) R^T`` from quaternions and (linear) scales."""
    R = quat_to_rotmat(quats)                       # [N, 3, 3]
    M = R * scales[..., None, :]                    # R @ diag(s)
    # HIGHEST: TPU matmuls default to one-pass bf16; an 8-bit-mantissa
    # covariance (and its gradient) measurably degrades training vs the
    # identical run on CPU f32.  These [N,3,3] contractions are FLOP-free
    # next to compositing.
    return jax.lax.dot_general(
        M, M, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
    )


def min_axis_normal(quats: jax.Array, scales: jax.Array) -> jax.Array:
    """World-space unit normal = rotated axis of the smallest scale.

    Behavioral equivalent of the reference ``RadegsModel.normals`` property
    (rade_gs_model.py:65-78).  Differentiable except at scale ties (argmin is
    treated as constant, like the reference's one_hot(argmin)).
    """
    R = quat_to_rotmat(quats)
    idx = jnp.argmin(scales, axis=-1)
    onehot = jax.nn.one_hot(idx, 3, dtype=scales.dtype)
    n = jnp.einsum("nij,nj->ni", R, onehot,
                   precision=jax.lax.Precision.HIGHEST)
    return n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)


def project_gaussians(
    means: jax.Array,
    quats: jax.Array,
    scales: jax.Array,
    viewmat: jax.Array,
    K: jax.Array,
    width: int,
    height: int,
    eps2d: float = 0.3,
    near_plane: float = 0.01,
    far_plane: float = 1e10,
    radius_clip: float = 0.0,
    opacities: jax.Array | None = None,
) -> Projection:
    """Project N Gaussians into one camera.

    Args:
        means: [N, 3] world-space centers.
        quats: [N, 4] wxyz orientations (need not be normalized).
        scales: [N, 3] *linear* (already exponentiated) scales.
        viewmat: [4, 4] world-to-camera (COLMAP convention, z forward).
        K: [3, 3] intrinsics.
        width, height: static image size.
        eps2d: screen-space low-pass blur added to the 2D covariance
            (gsplat's default 0.3, cf. rade_gs_model.py:382 ``eps2d=0.3``).
        near_plane, far_plane: depth culling range (reference uses 0.01/1e10,
            rade_gs_model.py:450-451).
        radius_clip: cull Gaussians whose screen radius is below this.
        opacities: optional [N] *activated* opacities (pre-compensation);
            tightens the per-axis bbox ``radius_xy`` to the exact
            alpha >= 1/255 extent sqrt(2 ln(255 o)) sigma — low-opacity
            splats generate proportionally fewer tile intersections, and
            o <= 1/255 splats none at all, with bit-identical rendering
            (``splat_alpha`` zeroes everything outside).  The antialias
            compensation only ever shrinks alpha, so the bound stays valid
            in "antialiased" mode.

    Returns:
        A :class:`Projection`; entries with ``valid == False`` carry safe
        (finite) placeholder values.
    """
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    R_wc = viewmat[:3, :3]
    t_wc = viewmat[:3, 3]

    # HIGHEST: bf16 world->camera positions quantize means to ~1e-2 of the
    # scene extent, a visible training-quality hit (see covariance3d note).
    p_cam = jnp.einsum("ni,ji->nj", means, R_wc,
                       precision=jax.lax.Precision.HIGHEST) + t_wc  # [N, 3]
    x, y, z = p_cam[..., 0], p_cam[..., 1], p_cam[..., 2]
    in_depth = (z > near_plane) & (z < far_plane)
    zs = jnp.where(in_depth, z, 1.0)                 # safe z for division

    # Camera-space covariance.
    cov_w = covariance3d(quats, scales)              # [N, 3, 3]
    cov_c = jnp.einsum("ij,njk,lk->nil", R_wc, cov_w, R_wc,
                       precision=jax.lax.Precision.HIGHEST)

    # Perspective Jacobian rows (the 2x3 block of J3).
    rz = 1.0 / zs
    rz2 = rz * rz
    # J row for u: (fx/z, 0, -fx x / z^2); for v: (0, fy/z, -fy y / z^2).
    j00 = fx * rz
    j02 = -fx * x * rz2
    j11 = fy * rz
    j12 = -fy * y * rz2

    c00, c01, c02 = cov_c[..., 0, 0], cov_c[..., 0, 1], cov_c[..., 0, 2]
    c11, c12, c22 = cov_c[..., 1, 1], cov_c[..., 1, 2], cov_c[..., 2, 2]

    # Sigma2D = J Sigma_c J^T (2x2 symmetric: a, b, c).
    # Row-products J @ Sigma_c first (2x3), then times J^T.
    ju = jnp.stack([j00 * c00 + j02 * c02,
                    j00 * c01 + j02 * c12,
                    j00 * c02 + j02 * c22], axis=-1)   # [N, 3] = (J_u . Sigma)
    jv = jnp.stack([j11 * c01 + j12 * c02,
                    j11 * c11 + j12 * c12,
                    j11 * c12 + j12 * c22], axis=-1)
    a_raw = ju[..., 0] * j00 + ju[..., 2] * j02
    b_raw = jv[..., 0] * j00 + jv[..., 2] * j02
    c_raw = jv[..., 1] * j11 + jv[..., 2] * j12

    det_raw = a_raw * c_raw - b_raw * b_raw
    a = a_raw + eps2d
    c = c_raw + eps2d
    b = b_raw
    det = a * c - b * b
    det_safe = jnp.where(det > 1e-12, det, 1.0)
    ok_det = det > 1e-12

    # Antialiasing compensation: sqrt(det(raw) / det(blurred)).  det_raw is
    # PSD-nonnegative in exact math but goes numerically negative for
    # needle-thin splats; sqrt(clip(x, 0)) then yields a NaN *gradient*
    # (sqrt'(0) = inf times the clip's zero tangent).  One such splat
    # poisons the Adam moments of every parameter — observed as a one-step
    # training collapse at 26k gaussians (runs/scale_r4).  The double-where
    # keeps the forward identical and pins the gradient to 0 at the clamp.
    ratio = det_raw / det_safe
    ratio_pos = ratio > 1e-12
    compensation = jnp.where(
        ratio_pos,
        jnp.sqrt(jnp.where(ratio_pos, ratio, 1.0)),
        0.0,
    )

    inv_det = 1.0 / det_safe
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], axis=-1)

    mean2d = jnp.stack([fx * x * rz + cx, fy * y * rz + cy], axis=-1)

    # Screen radius from the larger eigenvalue of the blurred covariance
    # (gsplat's square-bbox radius, kept for strategy statistics and
    # screen-size culling parity).
    mid = 0.5 * (a + c)
    eig_max = mid + jnp.sqrt(jnp.clip(mid * mid - det, 0.01, None))
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.clip(eig_max, 0.0, None)))
    # Per-axis bbox half-extents for tile binning: the alpha-cutoff region
    # {alpha >= 1/255} is the ellipse sigma <= ln(255); its exact axis-
    # aligned extents are sqrt(2 ln 255) * sqrt(cov_uu | cov_vv) ~= 3.33
    # standard deviations per axis.  Everything outside contributes exactly
    # 0 (splat_alpha's cutoff), so binning with (rx, ry) instead of the
    # max-eigenvalue square renders bit-identically while generating far
    # fewer tile intersections for anisotropic splats.  min() with the
    # square radius keeps the kept-set a subset of gsplat's (3-sigma) bbox.
    if opacities is None:
        cut = 3.3291  # sqrt(2 ln 255)
    else:
        # Exact per-gaussian cutoff extent: alpha = o exp(-sigma) >= 1/255
        # iff sigma <= ln(255 o); o <= 1/255 never contributes at all.
        cut = jnp.sqrt(2.0 * jnp.clip(
            jnp.log(255.0 * jnp.clip(
                jax.lax.stop_gradient(opacities), 0.0, 1.0)),
            0.0, None,
        ))
    rx = jnp.ceil(jnp.minimum(cut * jnp.sqrt(jnp.clip(a, 0.0, None)), radius))
    ry = jnp.ceil(jnp.minimum(cut * jnp.sqrt(jnp.clip(c, 0.0, None)), radius))
    radius_xy = jnp.stack([rx, ry], axis=-1)

    # RaDe depth plane: Sigma'_{uv,t} = J @ (Sigma_c e_z); plane = conic_raw @ it.
    # Use the *blurred* inverse for numerical stability — the blur flattens
    # the plane slightly, consistently with the blurred footprint it is
    # rasterized with.
    s_ut = j00 * c02 + j02 * c22
    s_vt = j11 * c12 + j12 * c22
    plane_u = conic[..., 0] * s_ut + conic[..., 1] * s_vt
    plane_v = conic[..., 1] * s_ut + conic[..., 2] * s_vt
    plane = jnp.stack([plane_u, plane_v], axis=-1)

    # Camera-space normal of the depth-plane surface (see module docstring).
    nz = plane_u * (mean2d[..., 0] - cx) + plane_v * (mean2d[..., 1] - cy) + zs
    n = jnp.stack([-plane_u * fx, -plane_v * fy, nz], axis=-1)
    n = n / jnp.sqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-12)
    # Face the camera: in COLMAP camera space the view direction to the
    # Gaussian is p_cam, so require n . p_cam < 0.
    facing = jnp.sum(n * p_cam, axis=-1, keepdims=True)
    n = jnp.where(facing > 0.0, -n, n)

    # Visibility: in depth range, invertible covariance, on-screen bbox.
    u0, v0 = mean2d[..., 0], mean2d[..., 1]
    on_screen = (
        (u0 + radius > 0)
        & (u0 - radius < width)
        & (v0 + radius > 0)
        & (v0 - radius < height)
    )
    valid = in_depth & ok_det & on_screen & (radius > radius_clip)

    radius = jnp.where(valid, radius, 0.0)
    radius_xy = jnp.where(valid[:, None], radius_xy, 0.0)
    return Projection(
        mean2d=mean2d,
        depth=z,
        conic=conic,
        radius=radius,
        compensation=compensation,
        plane=plane,
        normal=n,
        valid=valid,
        radius_xy=radius_xy,
    )
