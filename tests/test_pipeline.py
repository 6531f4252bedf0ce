"""End-to-end pipeline tests: config system, Splatter stages, CLI, resume."""

import json
from pathlib import Path

import numpy as np
import pytest

from collab_splats_tpu.data.synthetic import write_synthetic_dataset
from collab_splats_tpu.pipeline.config import (
    ConfigLoader,
    deep_merge,
    parse_cli_overrides,
)
from collab_splats_tpu.pipeline.splatter import Splatter, ValidationError


class TestConfig:
    def test_deep_merge(self):
        base = {"a": 1, "b": {"c": 2, "d": 3}}
        out = deep_merge(base, {"b": {"c": 9}, "e": 5})
        assert out == {"a": 1, "b": {"c": 9, "d": 3}, "e": 5}
        assert base["b"]["c"] == 2  # base unchanged

    def test_parse_overrides(self):
        out = parse_cli_overrides(
            ["method=rade-gs", "preprocess.sfm_tool=colmap",
             "training.max_iterations=100", "meshing.voxel_size=0.02",
             "flag=true"]
        )
        assert out["method"] == "rade-gs"
        assert out["preprocess"]["sfm_tool"] == "colmap"
        assert out["training"]["max_iterations"] == 100
        assert out["meshing"]["voxel_size"] == 0.02
        assert out["flag"] is True

    def test_loader_hierarchy(self, tmp_path):
        (tmp_path / "datasets").mkdir()
        (tmp_path / "base.yaml").write_text(
            "method: rade-features\ntraining:\n  max_iterations: 30000\n"
        )
        (tmp_path / "datasets" / "ants.yaml").write_text(
            "file_path: /data/ants.mp4\ntraining:\n  max_iterations: 100\n"
        )
        loader = ConfigLoader(tmp_path)
        assert loader.list_datasets() == ["ants"]
        cfg = loader.load("ants", overrides={"method": "rade-gs"})
        assert cfg["method"] == "rade-gs"
        assert cfg["training"]["max_iterations"] == 100
        with pytest.raises(ValueError):
            loader.load("nonexistent")


class TestSplatterValidation:
    def test_missing_fields(self):
        with pytest.raises(ValidationError):
            Splatter({"method": "rade-gs"})

    def test_bad_method(self, tmp_path):
        with pytest.raises(ValidationError):
            Splatter({"file_path": str(tmp_path), "method": "nerf"})

    def test_default_output_path(self, tmp_path):
        d = tmp_path / "videos" / "scene"
        d.mkdir(parents=True)
        s = Splatter({"file_path": str(d), "method": "rade-gs"})
        assert s.config["output_path"] == tmp_path / "environment" / "scene"


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pipeline_scene")
    write_synthetic_dataset(d / "input", n_cams=8, n_gaussians=120,
                            width=48, height=48)
    return d


class TestEndToEnd:
    def test_full_pipeline(self, scene_dir):
        s = Splatter({
            "file_path": str(scene_dir / "input"),
            "method": "rade-gs",
            "output_path": str(scene_dir / "out"),
        })
        s._training_config = {
            "max_iterations": 30, "capacity": 512, "sh_degree": 0,
        }
        s._meshing_config = {
            "voxel_size": 0.05, "depth_trunc": 4.0, "align_floor": False,
            "max_dim": 64,
        }
        s.run_pipeline()
        assert (s.preproc_dir / "transforms.json").exists()
        assert s._runs(), "no training run recorded"
        assert (s.mesh_dir / "mesh.ply").exists()
        assert (s.mesh_dir / "splats.ply").exists()

        # Resume semantics: stages skip when outputs exist.
        run_before = s._runs()[-1]
        s.run_pipeline(overwrite=False)
        assert s._runs()[-1] == run_before

    def test_load_model_roundtrip(self, scene_dir):
        s = Splatter({
            "file_path": str(scene_dir / "input"),
            "method": "rade-gs",
            "output_path": str(scene_dir / "out"),
        })
        s._loaded = None
        step, params, alive, spec, model_cfg = s.load_model()
        assert step > 0
        assert params["means"].shape[0] == alive.shape[0]

    def test_features_pipeline_with_query(self, scene_dir):
        s = Splatter({
            "file_path": str(scene_dir / "input"),
            "method": "rade-features",
            "output_path": str(scene_dir / "out_features"),
        })
        s._training_config = {
            "max_iterations": 25, "capacity": 512,
            "extractors": ("hash-proj",), "feature_type": "hash-proj",
            "final_resolution": 16,
        }
        s._meshing_config = {
            "voxel_size": 0.05, "depth_trunc": 4.0, "align_floor": False,
            "max_dim": 64,
        }
        s.run_pipeline()
        assert (s.mesh_dir / "mesh_features.npz").exists()
        data = np.load(s.mesh_dir / "mesh_features.npz")
        assert data["features"].shape[1] == 13
        sims = s.query_mesh(["red disk"], ["object"],
                            output_fn=s.mesh_dir / "queried.ply")
        assert sims.shape[0] == data["features"].shape[0]
        assert np.isfinite(sims).all()
        assert (s.mesh_dir / "queried.ply").exists()


class TestCLI:
    def test_list_methods(self, capsys):
        from collab_splats_tpu.pipeline.cli import main

        assert main(["--list-methods"]) == 0
        out = capsys.readouterr().out
        assert "rade-gs" in out and "rade-features" in out

    def test_cli_pipeline(self, scene_dir, capsys):
        from collab_splats_tpu.pipeline.cli import main

        rc = main([
            "--input", str(scene_dir / "input"),
            "--method", "splatfacto",
            "--output", str(scene_dir / "out_cli"),
            "--set", "training.max_iterations=15",
            "--set", "training.capacity=512",
            "--set", "training.sh_degree=0",
            "--set", "meshing.voxel_size=0.06",
            "--set", "meshing.align_floor=false",
            "--set", "meshing.max_dim=48",
        ])
        assert rc == 0
        assert (Path(scene_dir) / "out_cli" / "mesh" / "mesh.ply").exists()


class TestViewer:
    def test_serve_and_render(self):
        import urllib.request

        import jax
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.data.synthetic import random_gaussian_params
        from collab_splats_tpu.models import rade_gs
        from collab_splats_tpu.pipeline.viewer import SplatViewer

        params = random_gaussian_params(jax.random.PRNGKey(0), 80, extent=0.5)
        import jax.numpy as jnp

        viewer = SplatViewer(
            params, jnp.ones(80, bool),
            rade_gs.RadeGSConfig(
                sh_degree=0, background="black",
                render=RenderOptions(tile_capacity=128,
                                     max_intersections=1 << 13),
            ),
            width=64, height=48,
        )
        port = viewer.serve(port=0, blocking=False)
        try:
            html = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/", timeout=30
            ).read()
            assert b"viewer" in html
            png = urllib.request.urlopen(
                f"http://127.0.0.1:{port}/render?theta=0.5&phi=0.4&r=3"
                "&mode=rgb",
                timeout=120,
            ).read()
            assert png[:8] == b"\x89PNG\r\n\x1a\n"
            from io import BytesIO

            from PIL import Image

            img = Image.open(BytesIO(png))
            assert img.size == (64, 48)
            import json as _json

            info = _json.loads(urllib.request.urlopen(
                f"http://127.0.0.1:{port}/info", timeout=30
            ).read())
            assert info["num_gaussians"] == 80
        finally:
            viewer.shutdown()


class TestMeshUtilities:
    def test_plot_mesh_and_aligned_cameras(self, scene_dir):
        s = Splatter({
            "file_path": str(scene_dir / "input"),
            "method": "rade-gs",
            "output_path": str(scene_dir / "out"),
        })
        if not (s.mesh_dir / "mesh.ply").exists():
            s._training_config = {"max_iterations": 20, "capacity": 512,
                                  "sh_degree": 0}
            s._meshing_config = {"voxel_size": 0.05, "depth_trunc": 4.0,
                                 "align_floor": False, "max_dim": 64}
            s.run_pipeline()
        img = s.plot_mesh()
        assert img.shape == (600, 800, 3)
        assert np.isfinite(img).all()
        cams = s.load_aligned_cameras()
        assert len(cams) > 0
        assert cams[0].c2w.shape == (4, 4)


class TestFeatureCache:
    def test_cache_roundtrip_and_invalidation(self, tmp_path):
        from collab_splats_tpu.data.datamanager import FullImageDatamanager
        from collab_splats_tpu.data.synthetic import write_synthetic_dataset
        from collab_splats_tpu.features.datamanager import (
            FeatureDatamanager,
            FeatureDatamanagerConfig,
        )

        write_synthetic_dataset(tmp_path / "in", n_cams=4, n_gaussians=60,
                                width=32, height=32)
        base = FullImageDatamanager.from_transforms_json(
            tmp_path / "in" / "transforms.json"
        )
        cfg = FeatureDatamanagerConfig(
            feature_type="hash-proj", extractors=("hash-proj",),
            final_resolution=8, cache_dir=str(tmp_path / "cache"),
        )
        names = [f"img{i}" for i in range(len(base.train_images))]
        dm1 = FeatureDatamanager(base, cfg, image_names=names)
        cache_files = list((tmp_path / "cache").glob("*.npz"))
        assert len(cache_files) == 1
        # Second load hits the cache and yields identical features.
        dm2 = FeatureDatamanager(base, cfg, image_names=names)
        np.testing.assert_array_equal(
            dm1.train_features[0]["hash-proj"],
            dm2.train_features[0]["hash-proj"],
        )
        # Different filename list -> different cache key (invalidation,
        # reference features_datamanager.py:99-123 semantics).
        dm3 = FeatureDatamanager(base, cfg,
                                 image_names=[n + "_v2" for n in names])
        assert len(list((tmp_path / "cache").glob("*.npz"))) == 2


class TestTrainingResume:
    def test_interrupted_run_continues(self, tmp_path):
        from collab_splats_tpu.data.synthetic import write_synthetic_dataset

        write_synthetic_dataset(tmp_path / "in", n_cams=6, n_gaussians=80,
                                width=32, height=32)
        cfg = {
            "file_path": str(tmp_path / "in"),
            "method": "splatfacto",
            "output_path": str(tmp_path / "out"),
        }
        tc = {"max_iterations": 12, "capacity": 256, "sh_degree": 0}
        s = Splatter(cfg)
        s.preprocess()
        run = s.train(**tc)
        # Simulate an interruption: delete the final checkpoint, keep an
        # earlier one by writing a mid-step snapshot.
        from collab_splats_tpu.train import checkpoint as ck

        final = ck.latest_checkpoint(run)
        step, params, alive, _ = ck.load_checkpoint(final)
        assert step == 12
        final.unlink()
        ck.save_checkpoint(run, 5, params, alive)
        # A fresh Splatter resumes and completes to max_iterations.
        s2 = Splatter(cfg)
        run2 = s2.train(**tc)
        assert run2 == run
        assert ck.latest_checkpoint(run).name == "step-00000012.ckpt.npz"
        # And a third call skips (complete).
        s3 = Splatter(cfg)
        run3 = s3.train(**tc)
        assert run3 == run


class TestSelectRun:
    """Interactive run selection (reference splatter.py:380-414): headless
    picks most-recent; a TTY prompt accepts an index, Enter, and rejects
    junk before a valid pick."""

    def _splatter(self, tmp_path):
        from collab_splats_tpu.pipeline.splatter import Splatter

        (tmp_path / "in").mkdir(exist_ok=True)
        return Splatter({
            "file_path": str(tmp_path / "in"),
            "method": "rade-gs",
            "output_path": str(tmp_path / "out"),
        })

    def test_headless_picks_latest(self, tmp_path, monkeypatch):
        import sys

        s = self._splatter(tmp_path)
        monkeypatch.setattr(sys.stdin, "isatty", lambda: False)
        runs = [tmp_path / "run_a", tmp_path / "run_b"]
        assert s._select_run(runs) == runs[-1]

    def test_tty_prompt_sequence(self, tmp_path, monkeypatch):
        import sys

        s = self._splatter(tmp_path)
        monkeypatch.setattr(sys.stdin, "isatty", lambda: True)
        answers = iter(["junk", "7", "0"])
        monkeypatch.setattr("builtins.input", lambda *_: next(answers))
        runs = [tmp_path / "run_a", tmp_path / "run_b"]
        assert s._select_run(runs) == runs[0]

    def test_tty_enter_means_latest(self, tmp_path, monkeypatch):
        import sys

        s = self._splatter(tmp_path)
        monkeypatch.setattr(sys.stdin, "isatty", lambda: True)
        monkeypatch.setattr("builtins.input", lambda *_: "")
        runs = [tmp_path / "a", tmp_path / "b", tmp_path / "c"]
        assert s._select_run(runs) == runs[-1]
