"""Data-layer tests: PLY I/O, transforms.json parsing, datamanager, ckpt."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.data.datamanager import FullImageDatamanager
from collab_splats_tpu.data.dataparser import parse_transforms_json
from collab_splats_tpu.data.ply import read_ply, write_ply
from collab_splats_tpu.data.synthetic import write_synthetic_dataset


class TestPly:
    def test_roundtrip_points_colors(self, tmp_path):
        pts = np.random.RandomState(0).randn(100, 3).astype(np.float32)
        cols = np.random.RandomState(1).rand(100, 3).astype(np.float32)
        p = tmp_path / "t.ply"
        write_ply(str(p), pts, colors=cols)
        out = read_ply(str(p))
        np.testing.assert_allclose(out["points"], pts, atol=1e-6)
        np.testing.assert_allclose(out["colors"], cols, atol=1 / 255.0)

    def test_roundtrip_mesh(self, tmp_path):
        pts = np.eye(3, dtype=np.float32)
        faces = np.array([[0, 1, 2]], np.int32)
        normals = np.tile([[0.0, 0, 1]], (3, 1)).astype(np.float32)
        p = tmp_path / "m.ply"
        write_ply(str(p), pts, normals=normals, faces=faces)
        out = read_ply(str(p))
        np.testing.assert_array_equal(out["faces"], faces)
        np.testing.assert_allclose(out["normals"], normals)


class TestDataparser:
    @pytest.fixture(scope="class")
    def dataset(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("scene")
        out_dir, gt, cams = write_synthetic_dataset(
            d, n_cams=10, n_gaussians=100, width=48, height=48
        )
        return out_dir, gt, cams

    def test_parse(self, dataset):
        out_dir, gt, cams = dataset
        scene = parse_transforms_json(out_dir / "transforms.json")
        assert len(scene.train_cameras) == 9
        assert len(scene.eval_cameras) == 1
        assert scene.points is not None and scene.points.shape[1] == 3
        assert scene.point_colors is not None
        # Normalized poses are inside the unit box.
        pos = np.stack([np.asarray(c.c2w[:3, 3]) for c in scene.train_cameras])
        assert np.abs(pos).max() <= 1.0 + 1e-5

    def test_points_move_with_cameras(self, dataset):
        # The same world transform must apply to points and cameras: the
        # point centroid must stay at the same position relative to the rig.
        out_dir, gt, cams = dataset
        scene = parse_transforms_json(out_dir / "transforms.json")
        # Ground truth: points centered at origin, cameras orbit around it.
        centroid = scene.points.mean(axis=0)
        pos = np.stack([np.asarray(c.c2w[:3, 3]) for c in scene.train_cameras])
        d = np.linalg.norm(pos - centroid, axis=-1)
        assert d.std() / d.mean() < 0.05  # still an orbit around the points

    def test_no_orient(self, dataset):
        out_dir, *_ = dataset
        scene = parse_transforms_json(
            out_dir / "transforms.json", auto_scale=False, orient_center=False
        )
        np.testing.assert_allclose(scene.transform, np.eye(4))
        assert scene.scale == 1.0

    def test_downscale(self, dataset):
        out_dir, *_ = dataset
        scene = parse_transforms_json(out_dir / "transforms.json",
                                      downscale_factor=2)
        cam = scene.train_cameras[0]
        assert cam.width == 24 and cam.height == 24


class TestDatamanager:
    def test_loading_and_iteration(self, tmp_path):
        write_synthetic_dataset(tmp_path, n_cams=6, n_gaussians=80,
                                width=32, height=32)
        dm = FullImageDatamanager.from_transforms_json(
            tmp_path / "transforms.json"
        )
        assert len(dm.train_images) == 6  # ceil(6*0.9)=6 -> no eval? check
        rng = np.random.RandomState(0)
        cam, batch, idx = dm.next_train(0, rng)
        assert batch["image"].shape == (32, 32, 3)
        assert batch["image"].dtype == np.float32
        assert 0.0 <= batch["image"].max() <= 1.0


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        from collab_splats_tpu.data.synthetic import random_gaussian_params
        from collab_splats_tpu.train import checkpoint, optim, strategy

        params = random_gaussian_params(jax.random.PRNGKey(0), 32)
        alive = jnp.ones(32, bool)
        opt = optim.make_optimizer(
            optim.RADE_GS_GROUPS, optim.default_labels(params)
        )
        st = opt.init(params)
        strat = strategy.init_state(32)
        p = checkpoint.save_checkpoint(
            tmp_path / "ckpt", 1234, params, alive, st, strat,
            metadata={"method": "rade-gs"},
        )
        assert checkpoint.latest_checkpoint(tmp_path / "ckpt") == p
        step, params2, alive2, extras = checkpoint.load_checkpoint(p)
        assert step == 1234
        for k in params:
            np.testing.assert_array_equal(params2[k], params[k])
        np.testing.assert_array_equal(alive2, alive)
        assert any(k.startswith("opt/") for k in extras)
        meta = json.loads((tmp_path / "ckpt" / "metadata.json").read_text())
        assert meta["method"] == "rade-gs"


class TestCheckpointNestedParams:
    def test_decoder_subtree_roundtrip(self, tmp_path):
        from collab_splats_tpu.data.synthetic import random_gaussian_params
        from collab_splats_tpu.features import decoder as dec
        from collab_splats_tpu.train import checkpoint

        params = random_gaussian_params(jax.random.PRNGKey(0), 16)
        params["decoder"] = dec.init_decoder(
            jax.random.PRNGKey(1), 13, 8, {"clip-vit": (4, 2, 2)}
        )
        p = checkpoint.save_checkpoint(
            tmp_path, 7, params, jnp.ones(16, bool)
        )
        # Must load WITHOUT pickle (object arrays would need allow_pickle).
        step, params2, alive, _ = checkpoint.load_checkpoint(p)
        assert isinstance(params2["decoder"], dict)
        np.testing.assert_array_equal(
            params2["decoder"]["hidden_w"], params["decoder"]["hidden_w"]
        )


def test_odd_dimensions_downscale_consistency(tmp_path):
    """Camera size must floor-divide exactly like load_image's resize —
    odd dimensions with downscale previously produced a camera/image
    shape mismatch that aborted training."""
    import json

    import numpy as np
    from PIL import Image

    from collab_splats_tpu.data.dataparser import (
        load_image,
        parse_transforms_json,
    )

    w, h = 99, 77
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    frames = []
    for i in range(3):
        name = f"im{i}.png"
        Image.fromarray(
            np.random.RandomState(i).randint(0, 255, (h, w, 3), np.uint8)
        ).save(img_dir / name)
        frames.append({
            "file_path": f"images/{name}",
            "transform_matrix": np.eye(4).tolist(),
            "w": w, "h": h, "fl_x": 80.0, "fl_y": 80.0,
            "cx": w / 2, "cy": h / 2,
        })
    with open(tmp_path / "transforms.json", "w") as f:
        json.dump({"frames": frames}, f)

    scene = parse_transforms_json(tmp_path / "transforms.json",
                                  downscale_factor=2)
    img = load_image(scene.train_image_paths[0], downscale_factor=2)
    cam = scene.train_cameras[0]
    assert (cam.height, cam.width) == img.shape[:2], (
        (cam.height, cam.width), img.shape)
