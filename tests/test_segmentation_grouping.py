"""Segmentation utilities, offline segmenter, metrics, pointcloud, grouping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.features import segmentation as seg
from collab_splats_tpu.features.grouping import GroupingClassifier, GroupingParams
from collab_splats_tpu.utils import metrics, pointcloud


class TestMaskUtils:
    def test_patch_mask_partition(self):
        img = np.zeros((64, 48, 3))
        pm = seg.create_patch_mask(img, num_patches=8)
        assert pm.shape == (8, 8, 64 * 48)
        # Every pixel in exactly one patch.
        assert np.all(pm.sum(axis=(0, 1)) == 1)

    def test_composite_and_binary_roundtrip(self):
        a = np.zeros((16, 16), np.uint8)
        a[:8, :8] = 1
        b = np.zeros((16, 16), np.uint8)
        b[8:, 8:] = 1
        results = [
            {"segmentation": a, "predicted_iou": 0.95},
            {"segmentation": b, "predicted_iou": 0.9},
            {"segmentation": b, "predicted_iou": 0.5},   # below threshold
        ]
        comp = seg.create_composite_mask(results)
        assert set(np.unique(comp)) == {0, 1, 2}
        binm = seg.mask_id_to_binary_mask(comp)
        assert binm.shape[0] == 2
        assert binm.sum() == comp.astype(bool).sum()

    def test_convert_matched_mask(self):
        masks = np.array([[0, 1], [2, 2]], np.uint8)
        out = seg.convert_matched_mask(np.array([4, 7]), masks)
        np.testing.assert_array_equal(out, [[0, 5], [8, 8]])

    def test_aggregate_masked_features_pools(self):
        # Two disjoint masks; features constant within each half.
        feats = jnp.zeros((4, 8, 8))
        feats = feats.at[:, :, :4].set(1.0).at[:, :, 4:].set(3.0)
        masks = jnp.zeros((2, 8, 8))
        masks = masks.at[0, :, :4].set(1).at[1, :, 4:].set(1)
        out = seg.aggregate_masked_features(feats, masks, (8, 8), (8, 8))
        np.testing.assert_allclose(np.asarray(out[:, :, :4]), 1.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[:, :, 4:]), 3.0, atol=1e-5)


class TestSegmenter:
    def test_distinct_regions(self):
        img = np.zeros((40, 40, 3), np.float32)
        img[:, :20] = [1.0, 0.1, 0.1]
        img[:, 20:] = [0.1, 0.1, 1.0]
        s = seg.Segmentation()
        results = s.auto_segment_image(img)
        assert len(results) >= 2
        comp = s.composite(img)
        assert len(np.unique(comp)) >= 2


class TestMetrics:
    def test_accuracy_completeness(self):
        ref = np.random.RandomState(0).rand(500, 3)
        rec = ref + 0.001
        assert metrics.calculate_accuracy(rec, ref) < 0.01
        assert metrics.calculate_completeness(rec, ref, threshold=0.01) > 99.0
        far = ref + 1.0
        assert metrics.calculate_completeness(far, ref, threshold=0.01) < 1.0

    def test_mean_angular_error(self):
        a = jnp.array([[0.0, 0, 1]])
        b = jnp.array([[0.0, 1, 0]])
        assert float(metrics.mean_angular_error(a, a)[0]) == pytest.approx(0.0, abs=1e-3)
        assert float(metrics.mean_angular_error(a, b)[0]) == pytest.approx(
            np.pi / 2, abs=1e-3
        )


class TestPointcloud:
    def test_voxel_downsample_traces_indices(self):
        pts = np.array([[0, 0, 0], [0.001, 0, 0], [1, 1, 1]], np.float64)
        out, idx = pointcloud.voxel_downsample(pts, 0.1)
        assert len(out) == 2
        np.testing.assert_array_equal(pts[idx], out)

    def test_outlier_removal(self):
        rng = np.random.RandomState(0)
        pts = rng.normal(0, 0.05, (300, 3))
        pts = np.vstack([pts, [[5.0, 5.0, 5.0]]])
        keep = pointcloud.statistical_outlier_removal(pts)
        assert 300 not in keep

    def test_clean_pcd_pipeline(self):
        rng = np.random.RandomState(1)
        pts = rng.normal(0, 0.2, (2000, 3))
        out, idx = pointcloud.clean_pcd(pts, voxel_size=0.05, max_distance=1.0)
        assert len(out) == len(idx)
        assert len(out) < 2000
        np.testing.assert_allclose(out, pts[idx].astype(np.float32), atol=1e-6)


class TestGrouping:
    def test_two_object_association(self):
        # Render-free synthetic: build a fake RenderMeta-like projection via
        # the real renderer on two separated blobs.
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.data.synthetic import (
            orbit_cameras, random_gaussian_params,
        )
        from collab_splats_tpu.models import rade_gs
        from collab_splats_tpu.models.gaussians import pad_to_capacity

        key = jax.random.PRNGKey(0)
        left = random_gaussian_params(key, 60, extent=0.2)
        right = random_gaussian_params(jax.random.PRNGKey(1), 60, extent=0.2)
        left["means"] = left["means"] - jnp.array([0.7, 0.0, 0.0])
        right["means"] = right["means"] + jnp.array([0.7, 0.0, 0.0])
        params = {k: jnp.concatenate([left[k], right[k]]) for k in left}
        n = 120
        alive = jnp.ones(n, bool)
        cfg = rade_gs.RadeGSConfig(
            sh_degree=0, background="black",
            render=RenderOptions(tile_capacity=128, max_intersections=1 << 13),
        )
        gc = GroupingClassifier(n, GroupingParams(min_gaussians_per_mask=3))
        for cam in orbit_cameras(4, radius=3.0, width=64, height=64,
                                 focal=70.0):
            out, meta = rade_gs.get_outputs(
                params, alive, cam, 0, cfg, training=False
            )
            # Ground-truth-ish masks: left half vs right half of the image
            # wherever alpha > 0.3.
            a = np.asarray(out["accumulation"]) > 0.3
            comp = np.zeros((64, 64), np.uint8)
            comp[:, :32][a[:, :32]] = 1
            comp[:, 32:][a[:, 32:]] = 2
            gc.associate(np.asarray(out["rgb"]), meta, composite_mask=comp)

        labels = gc.gaussian_labels(min_votes=2)
        # Objects discovered and consistent across views.
        assert gc.num_objects >= 2
        left_labels = labels[:60][labels[:60] >= 0]
        right_labels = labels[60:][labels[60:] >= 0]
        assert len(left_labels) > 10 and len(right_labels) > 10
        # Dominant label on each side differs.
        lmode = np.bincount(left_labels).argmax()
        rmode = np.bincount(right_labels).argmax()
        assert lmode != rmode
