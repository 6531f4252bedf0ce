"""Metric sinks (utils/writers.py): JSONL + tfevents round trip."""

import json

import numpy as np
import pytest

from collab_splats_tpu.utils import writers as W


class TestJsonl:
    def test_appends_records(self, tmp_path):
        w = W.JsonlWriter(tmp_path)
        w.write(1, {"loss": 0.5, "psnr": np.float32(20.0)})
        w.write(2, {"loss": 0.25})
        w.close()
        lines = [json.loads(ln) for ln in
                 (tmp_path / "metrics.jsonl").read_text().splitlines()]
        assert lines[0]["step"] == 1 and lines[0]["psnr"] == 20.0
        assert lines[1]["loss"] == 0.25


class TestTensorboard:
    def test_event_file_round_trip(self, tmp_path):
        w = W.TensorboardWriter(tmp_path)
        w.write(10, {"loss": 1.5, "psnr": 22.5})
        w.write(20, {"loss": 0.75})
        w.close()
        events = W.read_tfevents_scalars(w.path)
        by = {(e["step"], e["tag"]): e["value"] for e in events}
        assert by[(10, "loss")] == pytest.approx(1.5)
        assert by[(10, "psnr")] == pytest.approx(22.5)
        assert by[(20, "loss")] == pytest.approx(0.75)

    def test_crc32c_known_vector(self):
        # RFC 3720 test vector: 32 zero bytes -> 0x8A9136AA.
        assert W._crc32c(b"\x00" * 32) == 0x8A9136AA
        assert W._crc32c(b"123456789") == 0xE3069283


class TestSelector:
    def test_make_writers(self, tmp_path):
        out = W.make_writers("jsonl,tensorboard", tmp_path)
        assert len(out) == 2
        for w in out:
            w.write(1, {"x": 1.0})
            w.close()

    def test_unknown_sink(self, tmp_path):
        with pytest.raises(ValueError):
            W.make_writers("mystery", tmp_path)


class TestTrainerIntegration:
    def test_trainer_writes_metrics(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.data.synthetic import (
            orbit_cameras, random_gaussian_params,
        )
        from collab_splats_tpu.models import rade_gs
        from collab_splats_tpu.train.trainer import Trainer, TrainerConfig

        n = 64
        params = random_gaussian_params(jax.random.PRNGKey(0), n, extent=0.5)
        cams = orbit_cameras(2, radius=2.5, width=32, height=32, focal=35.0)
        cfg = rade_gs.RadeGSConfig(
            sh_degree=0, background="black",
            render=RenderOptions(tile_capacity=64, max_intersections=1 << 11),
            use_depth_normal_loss=False,
        )
        alive = jnp.ones(n, bool)
        images = [np.zeros((32, 32, 3), np.float32)] * 2
        tr = Trainer(TrainerConfig(model=cfg), cams, images, params, alive,
                     writers=W.make_writers("jsonl", tmp_path))
        tr.train(num_steps=3, log_every=100)
        lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
        assert len(lines) == 3
        assert "loss" in json.loads(lines[0])
