"""Meshing subsystem tests: TSDF, marching tetrahedra, repair, transfer,
floor alignment, and the end-to-end TSDF exporter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.meshing import align, repair, transfer
from collab_splats_tpu.meshing.marching import marching_tetrahedra, trilinear_sample
from collab_splats_tpu.meshing.tsdf import (
    TSDFConfig,
    create_volume,
    integrate,
    volume_from_bounds,
)


class TestMarchingTetrahedra:
    def test_sphere_surface(self):
        n = 48
        g = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
        center = (n - 1) / 2
        r = n / 4
        sdf = np.sqrt(((g - center) ** 2).sum(0)) - r
        verts, faces = marching_tetrahedra(sdf)
        assert len(verts) > 100 and len(faces) > 100
        # All vertices near the sphere.
        d = np.abs(np.linalg.norm(verts - center, axis=-1) - r)
        assert d.max() < 1.0
        # Normals point outward (positive sdf = outside).
        fn = np.cross(
            verts[faces[:, 1]] - verts[faces[:, 0]],
            verts[faces[:, 2]] - verts[faces[:, 0]],
        )
        centers = verts[faces].mean(1) - center
        agree = (fn * centers).sum(-1) > 0
        assert agree.mean() > 0.99

    def test_empty_field(self):
        sdf = np.ones((8, 8, 8), np.float32)
        verts, faces = marching_tetrahedra(sdf)
        assert len(verts) == 0 and len(faces) == 0

    def test_watertight_plane(self):
        # A half-space: z < 5 inside. Surface must be a flat sheet at z=5.
        sdf = np.tile(
            (np.arange(16, dtype=np.float32) - 5.0)[None, None, :], (16, 16, 1)
        )
        verts, faces = marching_tetrahedra(sdf)
        assert np.allclose(verts[:, 2], 5.0, atol=1e-5)
        # No boundary edges except at the volume border.
        loops = repair.boundary_loops(faces)
        for loop in loops:
            vs = verts[loop]
            on_border = (
                (vs[:, 0] < 0.5) | (vs[:, 0] > 14.5)
                | (vs[:, 1] < 0.5) | (vs[:, 1] > 14.5)
            )
            assert on_border.all()

    def test_trilinear_sample(self):
        grid = np.zeros((4, 4, 4, 1), np.float32)
        grid[..., 0] = np.arange(4)[None, None, :]  # value == z coordinate
        pts = np.array([[1.0, 1.0, 1.5], [2.0, 3.0, 0.25]])
        out = trilinear_sample(grid, pts)
        np.testing.assert_allclose(out[:, 0], [1.5, 0.25], atol=1e-6)


class TestTSDF:
    def test_integrate_wall(self):
        from collab_splats_tpu.data.synthetic import look_at_c2w
        from collab_splats_tpu.core.cameras import make_camera

        cfg = TSDFConfig(
            voxel_size=0.05, sdf_trunc=0.15, depth_trunc=5.0,
            origin=(-1.0, -1.0, -1.0), dims=(40, 40, 40),
        )
        vol = create_volume(cfg)
        # Camera at z=+2 looking at origin; a wall at z=0 (depth 2.0).
        c2w = look_at_c2w(np.array([0.0, 0.0, 2.0]), np.zeros(3))
        cam = make_camera(60.0, 60.0, 32.0, 32.0, 64, 64, c2w)
        depth = jnp.full((64, 64), 2.0)
        rgb = jnp.ones((64, 64, 3)) * jnp.array([1.0, 0.0, 0.0])
        vol = integrate(vol, depth, rgb, cam, cfg)
        tsdf = np.asarray(vol.tsdf)
        w = np.asarray(vol.weight)
        assert w.sum() > 0
        # Voxels in front of the wall (z>0 world, toward camera) positive,
        # just behind negative.  z index 20 is world z=0.
        zi = 20
        seen = w[:, :, zi + 2] > 0
        assert np.all(tsdf[:, :, zi + 2][seen] > 0)
        behind = w[:, :, zi - 1] > 0
        assert behind.sum() > 0
        assert np.all(tsdf[:, :, zi - 1][behind] < 0.5)
        # Extract surface: should lie near z index 20.
        verts, faces = marching_tetrahedra(tsdf, mask=w > 0)
        assert len(verts) > 0
        assert np.abs(verts[:, 2] - zi).max() < 2.0
        # Color transferred.
        cols = trilinear_sample(np.asarray(vol.color), verts)
        assert cols[:, 0].mean() > 0.5 and cols[:, 1].mean() < 0.2

    def test_volume_from_bounds_caps_resolution(self):
        cfg, vol = volume_from_bounds(
            np.array([-1.0, -1, -1]), np.array([1.0, 1, 1]),
            voxel_size=0.001, max_dim=64,
        )
        assert max(cfg.dims) <= 64
        assert cfg.voxel_size > 0.001


class TestRepair:
    def _two_triangles_far_apart(self):
        verts = np.array([
            [0, 0, 0], [1, 0, 0], [0, 1, 0],        # big comp (subdivided)
            [5, 5, 5], [6, 5, 5], [5, 6, 5],        # small comp
            [0.5, 0.5, 0], [1, 1, 0],
        ], np.float32)
        faces = np.array([
            [0, 1, 2], [1, 7, 2], [2, 7, 6], [1, 6, 7],
            [3, 4, 5],
        ], np.int32)
        return verts, faces

    def test_remove_small_components(self):
        verts, faces = self._two_triangles_far_apart()
        v2, f2 = repair.remove_small_components(verts, faces, min_fraction=0.5)
        assert len(f2) == 4
        assert len(v2) == 5  # the 3 far vertices dropped

    def test_fill_holes_closes_fan(self):
        # An open square (two triangles missing one): boundary loop of 4.
        verts = np.array(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        faces = np.array([[0, 1, 2]], np.int32)  # leaves open boundary
        loops = repair.boundary_loops(faces)
        assert len(loops) == 1 and len(loops[0]) == 3
        v2, f2 = repair.fill_holes(verts, faces, max_hole_edges=8)
        # Triangle boundary filled with a 3-fan around its centroid.
        assert len(f2) == 1 + 3

    def test_components_labels(self):
        verts, faces = self._two_triangles_far_apart()
        labels = repair.face_components(verts, faces)
        assert len(np.unique(labels)) == 2


class TestTransfer:
    def test_exact_at_source_points(self):
        src = jnp.asarray(np.random.RandomState(0).randn(50, 3))
        vals = jnp.asarray(np.random.RandomState(1).randn(50, 4))
        out = transfer.knn_weighted_transfer(src, src, vals, k=3)
        # Nearest neighbor of a source point is itself with d=0 -> weight
        # dominated by 1/eps.
        np.testing.assert_allclose(np.asarray(out), np.asarray(vals), atol=1e-3)

    def test_interpolation_between(self):
        src = jnp.array([[0.0, 0, 0], [1.0, 0, 0]])
        vals = jnp.array([[0.0], [10.0]])
        q = jnp.array([[0.5, 0.0, 0.0]])
        out = transfer.knn_weighted_transfer(q, src, vals, k=2)
        assert float(out[0, 0]) == pytest.approx(5.0, abs=1e-4)


class TestFloorAlign:
    def test_tilted_floor(self):
        rng = np.random.RandomState(0)
        # Points on a tilted plane + a blob above it.
        n_floor = 2000
        xy = rng.uniform(-1, 1, (n_floor, 2))
        plane_pts = np.stack(
            [xy[:, 0], xy[:, 1], 0.3 * xy[:, 0] + 0.1 * xy[:, 1] + 0.5], -1
        )
        blob = rng.normal(0, 0.1, (500, 3)) + np.array(
            [0, 0, 1.5]
        )
        pts = np.concatenate([plane_pts, blob])
        T = align.floor_alignment_transform(pts, distance_threshold=0.02)
        out = align.apply_transform(pts, T)
        floor_z = out[:n_floor, 2]
        assert np.abs(floor_z).max() < 0.05          # floor at z=0
        assert out[n_floor:, 2].mean() > 0.5          # blob above


class TestTSDFExporter:
    def test_end_to_end_synthetic(self):
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.data.synthetic import (
            flat_disk_gaussian, orbit_cameras,
        )
        from collab_splats_tpu.meshing.exporters import (
            TSDFExporterConfig, TSDFFusionExporter,
        )
        from collab_splats_tpu.models import rade_gs

        # A large opaque disk at the origin: a well-defined surface.
        disk = flat_disk_gaussian(normal=(0, 0, 1), radius=0.5,
                                  thickness=0.005)
        disk["opacities"] = jnp.full((1, 1), 8.0)
        cams = orbit_cameras(6, radius=2.0, width=64, height=64, focal=80.0,
                             elevation=0.9)
        mcfg = rade_gs.RadeGSConfig(
            sh_degree=0, background="black",
            render=RenderOptions(tile_capacity=64, max_intersections=1 << 12),
        )
        exporter = TSDFFusionExporter(
            disk, jnp.ones(1, bool), mcfg,
            TSDFExporterConfig(
                voxel_size=0.04, sdf_trunc=0.12, depth_trunc=4.0,
                align_floor=False, max_dim=64, clean_repair=True,
            ),
        )
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            result = exporter.main(cams, output_dir=d)
            from pathlib import Path

            assert (Path(d) / "mesh.ply").exists()
            assert (Path(d) / "splats.ply").exists()
        verts = result["vertices"]
        assert len(verts) > 20
        # The reconstructed surface hugs the disk plane z ~ 0.
        assert np.abs(verts[:, 2]).mean() < 0.1
        assert result["colors"].shape == (len(verts), 3)
        assert result["normals"].shape == (len(verts), 3)


class TestDensityExporters:
    def _disk_setup(self):
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.data.synthetic import flat_disk_gaussian
        from collab_splats_tpu.models import rade_gs

        disk = flat_disk_gaussian(normal=(0, 0, 1), radius=0.4,
                                  thickness=0.02)
        disk["opacities"] = jnp.full((1, 1), 8.0)
        mcfg = rade_gs.RadeGSConfig(
            sh_degree=0, background="black",
            render=RenderOptions(tile_capacity=64, max_intersections=1 << 12),
        )
        return disk, jnp.ones(1, bool), mcfg

    def test_level_set_extractor(self):
        from collab_splats_tpu.meshing.exporters import LevelSetExtractor

        disk, alive, mcfg = self._disk_setup()
        res = LevelSetExtractor(disk, alive, mcfg, level=0.3,
                                resolution=48).main()
        verts = res["vertices"]
        assert len(verts) > 20
        # The level set of a flat disk hugs z ~ 0 and r <~ 0.5.
        assert np.abs(verts[:, 2]).max() < 0.1
        assert np.linalg.norm(verts[:, :2], axis=-1).max() < 0.6

    def test_depth_normal_poisson_exporter(self):
        from collab_splats_tpu.data.synthetic import orbit_cameras
        from collab_splats_tpu.meshing.exporters import (
            DepthAndNormalMapsPoissonExporter,
        )

        disk, alive, mcfg = self._disk_setup()
        cams = orbit_cameras(4, radius=2.0, width=48, height=48, focal=60.0,
                             elevation=0.9)
        res = DepthAndNormalMapsPoissonExporter(
            disk, alive, mcfg, alpha_thresh=0.5, stride=2
        ).main(cams)
        pts = res["points"]
        assert len(pts) > 50
        # Back-projected points lie on the disk plane (z ~ 0 world).
        assert np.abs(pts[:, 2]).mean() < 0.08
        # Normals are unit and roughly +-z.
        n = res["normals"]
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-4)
        assert np.abs(n[:, 2]).mean() > 0.8
