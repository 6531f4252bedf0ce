"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates the (data, gauss) shard_map train step: it must run on a real
mesh, keep everything finite, and — the strong check — produce the same
numbers as the same program on a trivial 1x1 mesh (collective correctness).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.core.options import RenderOptions
from collab_splats_tpu.data.synthetic import orbit_cameras, random_gaussian_params
from collab_splats_tpu.models import rade_gs
from collab_splats_tpu.models.gaussians import pad_to_capacity
from collab_splats_tpu.parallel import mesh as pmesh
from collab_splats_tpu.parallel.train import CameraBatch, make_sharded_train_step
from collab_splats_tpu.train import optim, strategy


def _scene(capacity=256, n=200, n_cams=4, size=32):
    key = jax.random.PRNGKey(0)
    params = random_gaussian_params(key, n, extent=0.6)
    params = pad_to_capacity(params, capacity)
    alive = jnp.arange(capacity) < n
    cams = orbit_cameras(n_cams, radius=2.5, width=size, height=size,
                         focal=1.1 * size)
    cfg = rade_gs.RadeGSConfig(
        sh_degree=0, background="black",
        render=RenderOptions(tile_capacity=128, max_intersections=1 << 13),
        use_depth_normal_loss=True, regularization_from_iter=0,
    )
    gt = random_gaussian_params(jax.random.PRNGKey(1), n, extent=0.6)
    images = []
    for cam in cams:
        out, _ = rade_gs.get_outputs(
            gt, jnp.ones(n, bool), cam, 0, cfg, training=False
        )
        images.append(np.asarray(out["rgb"]))
    cam_batch = CameraBatch(
        K=jnp.stack([c.K for c in cams]),
        c2w=jnp.stack([c.c2w for c in cams]),
    )
    images = jnp.stack([jnp.asarray(im) for im in images])
    return params, alive, cams, cam_batch, images, cfg


def _run(mesh, params, alive, cam_batch, images, cfg, capacity, steps=2,
         tile_sharded=False, send_cap=None):
    opt = optim.make_optimizer(optim.RADE_GS_GROUPS, optim.default_labels(params))
    opt_state = opt.init(params)
    strat = strategy.init_state(capacity)
    step_fn = make_sharded_train_step(
        mesh, opt, cfg, int(images.shape[2]), int(images.shape[1]),
        capacity, jax.eval_shape(lambda: opt_state), reg_active=True,
        tile_sharded=tile_sharded, send_cap=send_cap,
    )
    key = jax.random.PRNGKey(5)
    metrics = None
    for i in range(steps):
        params, opt_state, strat, metrics = step_fn(
            params, alive, opt_state, strat, cam_batch, images, i, key
        )
    return params, strat, metrics


class TestShardedTraining:
    def test_runs_on_8_device_mesh(self):
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        capacity = 256
        params, alive, cams, cam_batch, images, cfg = _scene(capacity)
        mesh = pmesh.make_mesh(n_data=4, n_gauss=2)
        p2, strat, metrics = _run(
            mesh, params, alive, cam_batch, images, cfg, capacity
        )
        assert np.isfinite(float(metrics["loss"]))
        assert float(metrics["psnr"]) > 0
        # Parameters actually moved.
        delta = float(jnp.max(jnp.abs(p2["means"] - params["means"])))
        assert delta > 0
        # Densification stats accumulated.
        assert float(jnp.sum(strat.count)) > 0

    def test_sharded_matches_single_device(self):
        capacity = 256
        params, alive, cams, cam_batch, images, cfg = _scene(capacity)
        # 4 cameras on the data axis in both runs; only the device layout
        # changes, so results must agree to float tolerance.
        mesh_multi = pmesh.make_mesh(n_data=4, n_gauss=2)
        mesh_single = pmesh.make_mesh(
            n_data=1, n_gauss=1, devices=jax.devices()[:1]
        )
        # The single mesh still needs the batch axis: reshape to B=1? No —
        # shard_map over a 1-sized data axis processes only camera 0, which
        # is a different computation.  Instead compare 4x2 against 4x1 and
        # 2x4 layouts (same math, different sharding).
        p_a, strat_a, m_a = _run(
            pmesh.make_mesh(n_data=4, n_gauss=2), params, alive, cam_batch,
            images, cfg, capacity,
        )
        p_b, strat_b, m_b = _run(
            pmesh.make_mesh(n_data=4, n_gauss=1, devices=jax.devices()[:4]),
            params, alive, cam_batch, images, cfg, capacity,
        )
        assert float(m_a["loss"]) == pytest.approx(
            float(m_b["loss"]), rel=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(p_a["means"]), np.asarray(p_b["means"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(strat_a.grad_accum), np.asarray(strat_b.grad_accum),
            rtol=1e-3, atol=1e-7,
        )

    def test_tile_sharded_step_matches_allgather(self):
        """The routed (all_to_all band) training step is a pure layout
        change: losses, updated parameters, AND densification statistics
        must match the all-gather step on the same mesh (VERDICT r2 #4)."""
        capacity = 256
        params, alive, cams, cam_batch, images, cfg = _scene(capacity)
        mesh = pmesh.make_mesh(n_data=4, n_gauss=2)
        p_a, strat_a, m_a = _run(
            mesh, params, alive, cam_batch, images, cfg, capacity
        )
        p_b, strat_b, m_b = _run(
            mesh, params, alive, cam_batch, images, cfg, capacity,
            tile_sharded=True,
        )
        assert float(m_a["loss"]) == pytest.approx(
            float(m_b["loss"]), rel=1e-4
        )
        assert int(m_b["spilled"]) == int(m_a["spilled"])
        np.testing.assert_allclose(
            np.asarray(p_a["means"]), np.asarray(p_b["means"]),
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(strat_a.grad_accum), np.asarray(strat_b.grad_accum),
            rtol=1e-3, atol=1e-7,
        )
        np.testing.assert_array_equal(
            np.asarray(strat_a.count), np.asarray(strat_b.count)
        )

    def test_tile_sharded_buffers_scale_with_send_cap(self):
        """Training-path memory claim: with send_cap=S the routed step's
        per-device candidate set is G*S rows independent of capacity; a
        small S still trains (overflow -> spilled metric, finite loss)."""
        capacity = 256
        params, alive, cams, cam_batch, images, cfg = _scene(capacity)
        mesh = pmesh.make_mesh(n_data=4, n_gauss=2)
        p, strat, m = _run(
            mesh, params, alive, cam_batch, images, cfg, capacity,
            tile_sharded=True, send_cap=32,
        )
        assert np.isfinite(float(m["loss"]))
        delta = float(jnp.max(jnp.abs(p["means"] - params["means"])))
        assert delta > 0


class TestShardedRefinement:
    """Sharded densify/prune (VERDICT #5): refine on gauss-sharded state
    must reproduce the single-layout trajectory."""

    def _run_with_refine(self, mesh, steps=4, refine_at=(2,)):
        capacity = 256
        params, alive, cams, cam_batch, images, cfg = _scene(capacity)
        from collab_splats_tpu.parallel.train import make_sharded_refine_step
        from collab_splats_tpu.train.strategy import StrategyConfig

        scfg = StrategyConfig(
            warmup_length=0, refine_every=1,
            densify_grad_thresh=1e-6,  # low threshold: force dup/splits
            cull_alpha_thresh=0.05,
        )
        opt = optim.make_optimizer(
            optim.RADE_GS_GROUPS, optim.default_labels(params)
        )
        opt_state = opt.init(params)
        strat = strategy.init_state(capacity)
        step_fn = make_sharded_train_step(
            mesh, opt, cfg, int(images.shape[2]), int(images.shape[1]),
            capacity, jax.eval_shape(lambda: opt_state), reg_active=True,
        )
        refine_fn = make_sharded_refine_step(scfg, scene_scale=1.0)
        key = jax.random.PRNGKey(5)
        counts = None
        for i in range(steps):
            params, opt_state, strat, metrics = step_fn(
                params, alive, opt_state, strat, cam_batch, images, i, key
            )
            if i in refine_at:
                params, alive, opt_state, strat, counts = refine_fn(
                    params, alive, opt_state, strat,
                    jax.random.fold_in(key, 1000 + i),
                )
        return params, alive, counts, metrics

    def test_refine_layout_invariance(self):
        p_a, alive_a, counts_a, m_a = self._run_with_refine(
            pmesh.make_mesh(n_data=4, n_gauss=2)
        )
        p_b, alive_b, counts_b, m_b = self._run_with_refine(
            pmesh.make_mesh(n_data=4, n_gauss=1, devices=jax.devices()[:4])
        )
        # Refinement actually happened and identically so.
        assert int(counts_a[0]) + int(counts_a[1]) > 0
        for ca, cb in zip(counts_a, counts_b):
            assert int(ca) == int(cb)
        np.testing.assert_array_equal(np.asarray(alive_a), np.asarray(alive_b))
        np.testing.assert_allclose(
            np.asarray(p_a["means"]), np.asarray(p_b["means"]),
            rtol=1e-4, atol=1e-6,
        )
        assert float(m_a["loss"]) == pytest.approx(float(m_b["loss"]), rel=1e-4)
