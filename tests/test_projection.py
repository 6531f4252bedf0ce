"""Unit tests for camera math and EWA/RaDe projection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.core.cameras import (
    depth_pair_to_normal,
    make_camera,
    opengl_c2w_to_colmap_w2c,
)
from collab_splats_tpu.core.projection import (
    covariance3d,
    min_axis_normal,
    project_gaussians,
    quat_to_rotmat,
)
from collab_splats_tpu.data.synthetic import flat_disk_gaussian, look_at_c2w


def _front_camera(width=64, height=64, dist=2.0, focal=100.0):
    """Camera at (0,0,dist) looking at the origin along -z (world)."""
    c2w = look_at_c2w(np.array([0.0, 0.0, dist]), np.zeros(3))
    return make_camera(focal, focal, width / 2, height / 2, width, height, c2w)


class TestQuatRotmat:
    def test_identity(self):
        R = quat_to_rotmat(jnp.array([[1.0, 0, 0, 0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_orthonormal(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
        R = quat_to_rotmat(q)
        eye = jnp.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-5)

    def test_unnormalized_input(self):
        q = jnp.array([[2.0, 0, 0, 0]])
        np.testing.assert_allclose(quat_to_rotmat(q)[0], np.eye(3), atol=1e-6)


class TestCovariance:
    def test_psd_and_eigvals(self):
        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (16, 4))
        s = jnp.abs(jax.random.normal(key, (16, 3))) + 0.01
        cov = covariance3d(q, s)
        np.testing.assert_allclose(cov, np.swapaxes(np.asarray(cov), 1, 2), atol=1e-6)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        expected = np.sort(np.asarray(s) ** 2, axis=-1)
        np.testing.assert_allclose(eig, expected, rtol=1e-4, atol=1e-7)


class TestViewmat:
    def test_inverse_roundtrip(self):
        c2w = jnp.asarray(look_at_c2w(np.array([1.0, 2.0, 3.0]), np.zeros(3)))
        w2c = opengl_c2w_to_colmap_w2c(c2w)
        # Camera center maps to origin.
        center_h = jnp.concatenate([c2w[:3, 3], jnp.ones(1)])
        np.testing.assert_allclose(w2c @ center_h, [0, 0, 0, 1], atol=1e-5)

    def test_target_on_positive_z(self):
        # COLMAP convention: the look-at target must project to +z.
        c2w = jnp.asarray(look_at_c2w(np.array([0.0, 0.0, 2.0]), np.zeros(3)))
        w2c = opengl_c2w_to_colmap_w2c(c2w)
        target = w2c @ jnp.array([0.0, 0.0, 0.0, 1.0])
        assert target[2] > 0
        np.testing.assert_allclose(target[:3], [0, 0, 2.0], atol=1e-5)


class TestProjection:
    def test_center_projection(self):
        cam = _front_camera()
        means = jnp.array([[0.0, 0.0, 0.0]])
        quats = jnp.array([[1.0, 0, 0, 0]])
        scales = jnp.full((1, 3), 0.05)
        proj = project_gaussians(
            means, quats, scales, cam.viewmat(), cam.K, cam.width, cam.height
        )
        np.testing.assert_allclose(proj.mean2d[0], [32.0, 32.0], atol=1e-4)
        np.testing.assert_allclose(proj.depth[0], 2.0, atol=1e-5)
        assert bool(proj.valid[0])
        assert float(proj.radius[0]) > 0

    def test_culling(self):
        cam = _front_camera()
        means = jnp.array([
            [0.0, 0.0, 5.0],     # behind the camera (z_cam < 0)
            [100.0, 0.0, 0.0],   # far off screen
            [0.0, 0.0, 1.5],     # z_cam = 0.5, in front and on screen
        ])
        quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (3, 1))
        scales = jnp.full((3, 3), 0.01)
        proj = project_gaussians(
            means, quats, scales, cam.viewmat(), cam.K, cam.width, cam.height
        )
        assert not bool(proj.valid[0])
        assert not bool(proj.valid[1])
        assert bool(proj.valid[2])

    def test_near_plane_cull(self):
        cam = _front_camera()
        means = jnp.array([[0.0, 0.0, 1.995]])  # z_cam = 0.005 < 0.01
        quats = jnp.array([[1.0, 0, 0, 0]])
        scales = jnp.full((1, 3), 0.01)
        proj = project_gaussians(
            means, quats, scales, cam.viewmat(), cam.K, cam.width, cam.height
        )
        assert not bool(proj.valid[0])

    def test_isotropic_conic(self):
        # An isotropic Gaussian at the optical axis projects to an isotropic
        # 2D covariance (focal*scale/z)^2 + eps2d on the diagonal.
        cam = _front_camera(focal=100.0, dist=2.0)
        s = 0.1
        proj = project_gaussians(
            jnp.zeros((1, 3)),
            jnp.array([[1.0, 0, 0, 0]]),
            jnp.full((1, 3), s),
            cam.viewmat(), cam.K, cam.width, cam.height, eps2d=0.3,
        )
        var = (100.0 * s / 2.0) ** 2 + 0.3
        np.testing.assert_allclose(
            proj.conic[0], [1 / var, 0.0, 1 / var], rtol=1e-4, atol=1e-6
        )

    def test_plane_normal_matches_min_axis_for_disk(self):
        # A thin disk's RaDe plane-derived camera normal must agree with the
        # geometric smallest-axis normal (rade_gs_model.py:65-78 property).
        cam = _front_camera()
        for world_n in ([0.0, 0.0, 1.0], [0.3, 0.2, 0.9], [0.5, -0.5, 0.7]):
            disk = flat_disk_gaussian(
                center=(0.1, -0.05, 0.0), normal=world_n, radius=0.2
            )
            scales = jnp.exp(disk["scales"])
            proj = project_gaussians(
                disk["means"], disk["quats"], scales,
                cam.viewmat(), cam.K, cam.width, cam.height, eps2d=0.0,
            )
            n_geo_world = min_axis_normal(disk["quats"], scales)
            R = cam.viewmat()[:3, :3]
            n_geo_cam = n_geo_world @ R.T
            # Orient toward the camera like the projection does.
            p_cam = disk["means"] @ R.T + cam.viewmat()[:3, 3]
            flip = jnp.sum(n_geo_cam * p_cam, -1, keepdims=True) > 0
            n_geo_cam = jnp.where(flip, -n_geo_cam, n_geo_cam)
            dot = float(jnp.sum(proj.normal[0] * n_geo_cam[0]))
            assert dot > 0.999, f"normal mismatch for {world_n}: dot={dot}"

    def test_projection_gradients_finite(self):
        cam = _front_camera()
        key = jax.random.PRNGKey(3)
        means = jax.random.uniform(key, (8, 3), minval=-0.5, maxval=0.5)
        quats = jax.random.normal(key, (8, 4))
        scales = jnp.full((8, 3), 0.05)

        def loss(m, q, s):
            p = project_gaussians(
                m, q, s, cam.viewmat(), cam.K, cam.width, cam.height
            )
            return (
                jnp.sum(p.mean2d)
                + jnp.sum(p.conic)
                + jnp.sum(p.plane)
                + jnp.sum(p.normal)
                + jnp.sum(p.depth)
            )

        grads = jax.grad(loss, argnums=(0, 1, 2))(means, quats, scales)
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g)))


class TestDepthToNormal:
    def test_flat_wall_normal(self):
        cam = _front_camera(width=32, height=32)
        depth = jnp.full((32, 32), 2.0)
        normals = depth_pair_to_normal(cam, depth, depth)
        inner = np.asarray(normals[0, 8:-8, 8:-8])
        # Constant z-depth wall faces the camera: normal (0, 0, -1).
        np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-5)
        np.testing.assert_allclose(inner[..., :2], 0.0, atol=1e-5)

    def test_border_zero(self):
        cam = _front_camera(width=16, height=16)
        depth = jnp.ones((16, 16))
        normals = depth_pair_to_normal(cam, depth, depth)
        np.testing.assert_allclose(normals[:, 0, :, :], 0.0)
        np.testing.assert_allclose(normals[:, :, 0, :], 0.0)

    def test_slanted_plane(self):
        # Depth increasing with +x: camera-facing normal ~ (+a, 0, -1).
        cam = _front_camera(width=32, height=32, focal=32.0)
        u = (jnp.arange(32) + 0.5 - 16.0) / 32.0
        depth = 2.0 + 0.3 * jnp.broadcast_to(u[None, :], (32, 32))
        normals = np.asarray(depth_pair_to_normal(cam, depth, depth)[0])
        inner = normals[12:-12, 12:-12]
        assert np.all(inner[..., 2] < 0)
        assert np.all(inner[..., 0] > 0)
