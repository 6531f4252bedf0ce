"""Loss-stack unit tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.train import losses


class TestSSIM:
    def test_identical_is_one(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(losses.ssim(img, img)) == pytest.approx(1.0, abs=1e-5)

    def test_noise_lowers(self):
        key = jax.random.PRNGKey(1)
        img = jax.random.uniform(key, (32, 32, 3))
        noisy = jnp.clip(img + 0.3 * jax.random.normal(key, img.shape), 0, 1)
        assert float(losses.ssim(img, noisy)) < 0.95

    def test_differentiable(self):
        img = jax.random.uniform(jax.random.PRNGKey(2), (24, 24, 3))
        tgt = jax.random.uniform(jax.random.PRNGKey(3), (24, 24, 3))
        g = jax.grad(lambda x: 1.0 - losses.ssim(x, tgt))(img)
        assert np.all(np.isfinite(np.asarray(g)))
        assert float(jnp.sum(jnp.abs(g))) > 0


class TestRGBLoss:
    def test_zero_at_identity(self):
        img = jax.random.uniform(jax.random.PRNGKey(0), (16, 16, 3))
        assert float(losses.rgb_loss(img, img)) == pytest.approx(0.0, abs=1e-5)

    def test_mixture_weights(self):
        # Pure-L1 sanity: constant offset c gives (1-l)*c + l*(1-ssim).
        img = jnp.zeros((32, 32, 3)) + 0.5
        pred = img + 0.1
        val = float(losses.rgb_loss(pred, img, ssim_lambda=0.0))
        assert val == pytest.approx(0.1, abs=1e-5)


class TestPSNR:
    def test_known_value(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        assert float(losses.psnr(a, b)) == pytest.approx(20.0, abs=1e-3)


class TestScaleReg:
    def test_isotropic_zero(self):
        s = jnp.zeros((10, 3))  # ratio 1 < 10
        assert float(
            losses.scale_regularization(s, jnp.ones(10))
        ) == pytest.approx(0.0)

    def test_anisotropic_positive(self):
        s = jnp.log(jnp.array([[1.0, 1.0, 100.0]]))
        assert float(losses.scale_regularization(s, jnp.ones(1))) > 0


class TestCosine:
    def test_identical_zero(self):
        f = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4))
        assert float(losses.cosine_distillation_loss(f, f)) == pytest.approx(
            0.0, abs=1e-5
        )

    def test_opposite_two(self):
        f = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4))
        assert float(losses.cosine_distillation_loss(f, -f)) == pytest.approx(
            2.0, abs=1e-5
        )

    def test_depth_normal_weighting(self):
        e1 = jnp.full((4, 4, 1), 1.0)
        e2 = jnp.full((4, 4, 1), 2.0)
        v = float(losses.depth_normal_loss(e1, e2, depth_ratio=0.6,
                                           depth_normal_lambda=0.05))
        assert v == pytest.approx(0.05 * (0.4 * 1.0 + 0.6 * 2.0), abs=1e-6)


class TestProfiling:
    def test_timed_measures_work(self):
        from collab_splats_tpu.utils.profiling import timed

        x = jnp.ones((512, 512))

        def body(x):
            return jnp.sum(x @ x)

        t = timed(body, x, reps=(2, 6))
        assert t >= 0.0

    def test_trace_writes(self, tmp_path):
        from collab_splats_tpu.utils.profiling import trace

        with trace(str(tmp_path)) as d:
            jnp.ones((64, 64)).sum().block_until_ready()
        import os

        assert any(os.scandir(d))


class TestFilterBackends:
    """The banded-matmul SSIM filter (TPU default: the grouped-conv
    TRANSPOSE miscompiles on the TPU backend, scripts/grad_bisect.py)
    must match the conv path in value and gradient."""

    def test_matmul_filter_matches_conv(self, monkeypatch):
        import numpy as np
        import jax
        import jax.numpy as jnp

        from collab_splats_tpu.train import losses as L

        k = jax.random.PRNGKey(0)
        a = jax.random.uniform(k, (37, 53, 3))
        b = jax.random.uniform(jax.random.PRNGKey(1), (37, 53, 3))

        monkeypatch.setenv("COLLAB_SPLATS_SSIM_FILTER", "conv")
        v_c = float(L.ssim(a, b))
        g_c = np.asarray(jax.grad(lambda x: L.ssim(x, b))(a))
        monkeypatch.setenv("COLLAB_SPLATS_SSIM_FILTER", "matmul")
        v_m = float(L.ssim(a, b))
        g_m = np.asarray(jax.grad(lambda x: L.ssim(x, b))(a))

        assert abs(v_c - v_m) < 1e-5
        rel = np.linalg.norm(g_m - g_c) / np.linalg.norm(g_c)
        assert rel < 1e-4, rel
