"""NaN hardening: degenerate-splat gradients and the trainer's skip guard.

Regression for the runs/scale_r4 collapse: a needle-thin splat whose raw 2D
covariance determinant goes numerically negative made the antialiasing
compensation's sqrt(clip(x, 0)) emit a NaN *gradient* (inf * 0), which
poisoned every Adam moment in one step.  projection.py now pins that
gradient to zero with a double-where, and the trainer skips (and counts)
any step whose gradients are non-finite.
"""

import jax
import jax.numpy as jnp
import numpy as np

from collab_splats_tpu.core.cameras import Camera
from collab_splats_tpu.core.options import RenderOptions
from collab_splats_tpu.core.projection import project_gaussians
from collab_splats_tpu.data.synthetic import orbit_cameras


def _cam(width=64, height=64):
    return orbit_cameras(1, radius=3.0, width=width, height=height,
                         focal=80.0)[0]


class TestCompensationGradient:
    def test_needle_splat_grad_finite(self):
        """Gradients through the antialias compensation stay finite for
        splats degenerate enough that det(cov2d_raw) underflows/negates."""
        cam: Camera = _cam()
        n = 8
        means = jnp.concatenate([
            jnp.zeros((n // 2, 3)),
            jnp.array([[0.3, -0.2, 0.1]] * (n // 2)),
        ])
        quats = jnp.tile(jnp.array([[1.0, 0.2, -0.3, 0.05]]), (n, 1))
        # Needle splats: two axes collapsed to ~1e-12 so the raw 2D
        # covariance determinant is at or below f32 noise.
        scales = jnp.tile(jnp.array([[1e-12, 1e-12, 0.5]]), (n, 1))

        def comp_sum(means, quats, scales):
            proj = project_gaussians(
                means, quats, scales, cam.viewmat(), cam.K,
                cam.width, cam.height,
            )
            return jnp.sum(proj.compensation)

        val, grads = jax.value_and_grad(comp_sum, argnums=(0, 1, 2))(
            means, quats, scales
        )
        assert np.isfinite(float(val))
        for g in grads:
            assert np.all(np.isfinite(np.asarray(g))), g

    def test_healthy_splat_compensation_and_grad_unchanged(self):
        """The double-where is the identity for healthy covariances."""
        cam = _cam()
        means = jnp.array([[0.0, 0.0, 0.0]])
        quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        scales = jnp.full((1, 3), 0.05)

        def comp(scales):
            proj = project_gaussians(
                means, quats, scales, cam.viewmat(), cam.K,
                cam.width, cam.height,
            )
            return jnp.sum(proj.compensation)

        c = float(comp(scales))
        assert 0.0 < c <= 1.0
        g = np.asarray(jax.grad(comp)(scales))
        assert np.all(np.isfinite(g)) and np.any(g != 0)


class TestNonFiniteGradGuard:
    def test_nan_image_step_is_skipped(self):
        """A NaN in the GT image makes the loss/grads NaN; the trainer must
        keep params, opt state, and strategy state unchanged and count it."""
        from collab_splats_tpu.data.synthetic import random_gaussian_params
        from collab_splats_tpu.models.gaussians import pad_to_capacity
        from collab_splats_tpu.train import strategy
        from collab_splats_tpu.train.trainer import Trainer, TrainerConfig
        from collab_splats_tpu.models import rade_gs

        cams = orbit_cameras(2, radius=3.0, width=32, height=32, focal=40.0)
        n, cap = 50, 64
        params = random_gaussian_params(jax.random.PRNGKey(0), n)
        params = pad_to_capacity(params, cap)
        alive = jnp.arange(cap) < n

        good = np.full((32, 32, 3), 0.5, np.float32)
        bad = good.copy()
        bad[5, 5, 0] = np.nan
        tconf = TrainerConfig(
            model=rade_gs.RadeGSConfig(sh_degree=0),
            strategy=strategy.StrategyConfig(warmup_length=10_000),
            max_iterations=10,
            seed=0,
        )

        # Both cameras NaN: every step must be skipped.
        tr = Trainer(tconf, cams, [bad, bad], params, alive)
        p0 = jax.tree_util.tree_map(np.asarray, tr.params)
        m = tr.train_one_step()
        assert m["nonfinite_grad"] == 1
        for k in p0:
            np.testing.assert_array_equal(np.asarray(tr.params[k]), p0[k])

        # Both cameras clean: steps must apply and report 0.
        tr2 = Trainer(tconf, cams, [good, good], params, alive)
        m2 = tr2.train_one_step()
        assert m2["nonfinite_grad"] == 0
        changed = any(
            not np.array_equal(np.asarray(tr2.params[k]), p0[k])
            for k in p0
        )
        assert changed
