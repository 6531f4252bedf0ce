"""Densification-strategy state-machine tests (fixed-capacity semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from collab_splats_tpu.data.synthetic import random_gaussian_params
from collab_splats_tpu.train import strategy


def _setup(n=16, capacity=64):
    params = random_gaussian_params(jax.random.PRNGKey(0), n, extent=0.5)
    params = {
        k: jnp.pad(v, [(0, capacity - n)] + [(0, 0)] * (v.ndim - 1))
        for k, v in params.items()
    }
    alive = jnp.arange(capacity) < n
    state = strategy.init_state(capacity)
    return params, alive, state


class TestRefine:
    def test_noop_when_no_signal(self):
        params, alive, state = _setup()
        cfg = strategy.StrategyConfig()
        res = strategy.refine(params, alive, state, jax.random.PRNGKey(1), cfg)
        # No grads accumulated, opacities ~ sigmoid(0.5..3) > 0.1: no change.
        assert int(res.n_dup) == 0 and int(res.n_split) == 0
        np.testing.assert_array_equal(np.asarray(res.alive), np.asarray(alive))

    def test_cull_transparent(self):
        params, alive, state = _setup()
        params["opacities"] = params["opacities"].at[:4].set(-5.0)  # ~0.007
        cfg = strategy.StrategyConfig()
        res = strategy.refine(params, alive, state, jax.random.PRNGKey(1), cfg)
        assert int(res.n_cull) == 4
        assert not bool(res.alive[0])
        assert int(jnp.sum(res.alive)) == 12

    def test_duplicate_small_high_grad(self):
        params, alive, state = _setup()
        params["scales"] = jnp.full_like(params["scales"], jnp.log(0.001))
        state = state._replace(
            grad_accum=state.grad_accum.at[2].set(10.0),
            count=state.count.at[2].set(1.0),
        )
        cfg = strategy.StrategyConfig()
        res = strategy.refine(params, alive, state, jax.random.PRNGKey(1), cfg)
        assert int(res.n_dup) == 1 and int(res.n_split) == 0
        assert int(jnp.sum(res.alive)) == 17
        # The copy landed on a previously free slot with identical params.
        new_rows = np.asarray(res.written)
        (slots,) = np.nonzero(new_rows)
        assert len(slots) == 1
        np.testing.assert_allclose(
            res.params["means"][slots[0]], params["means"][2]
        )

    def test_split_large_high_grad(self):
        params, alive, state = _setup()
        params["scales"] = params["scales"].at[3].set(jnp.log(0.5))  # big
        state = state._replace(
            grad_accum=state.grad_accum.at[3].set(10.0),
            count=state.count.at[3].set(1.0),
        )
        cfg = strategy.StrategyConfig()
        res = strategy.refine(params, alive, state, jax.random.PRNGKey(1), cfg)
        assert int(res.n_split) == 1
        # Original removed, 2 children added: net +1.
        assert int(jnp.sum(res.alive)) == 17
        assert not bool(res.alive[3]) or bool(res.written[3])
        # Children have shrunk scales.
        (slots,) = np.nonzero(np.asarray(res.written))
        for s in slots:
            np.testing.assert_allclose(
                np.exp(res.params["scales"][s]),
                np.exp(params["scales"][3]) / 1.6,
                rtol=1e-5,
            )

    def test_capacity_overflow_drops(self):
        params, alive, state = _setup(n=60, capacity=64)
        params["scales"] = jnp.full_like(params["scales"], jnp.log(0.001))
        state = state._replace(
            grad_accum=jnp.full_like(state.grad_accum, 10.0),
            count=jnp.ones_like(state.count),
        )
        cfg = strategy.StrategyConfig()
        res = strategy.refine(params, alive, state, jax.random.PRNGKey(1), cfg)
        # 60 dups wanted, only 4 free slots.
        assert int(res.dropped) == 56
        assert int(jnp.sum(res.alive)) == 64

    def test_split_disabled(self):
        params, alive, state = _setup()
        params["scales"] = params["scales"].at[3].set(jnp.log(0.5))
        state = state._replace(
            grad_accum=state.grad_accum.at[3].set(10.0),
            count=state.count.at[3].set(1.0),
        )
        cfg = strategy.StrategyConfig()
        res = strategy.refine(
            params, alive, state, jax.random.PRNGKey(1), cfg, allow_split=False
        )
        assert int(res.n_split) == 0

    def test_scale_cull(self):
        params, alive, state = _setup()
        params["scales"] = params["scales"].at[5].set(jnp.log(2.0))
        cfg = strategy.StrategyConfig()
        res = strategy.refine(
            params, alive, state, jax.random.PRNGKey(1), cfg, scale_cull=True
        )
        assert not bool(res.alive[5])

    def test_reset_opacity(self):
        params, alive, state = _setup()
        params["opacities"] = params["opacities"].at[:].set(5.0)
        cfg = strategy.StrategyConfig()
        out = strategy.reset_opacity(params, cfg)
        new_op = jax.nn.sigmoid(out["opacities"])
        assert float(new_op.max()) <= 2 * cfg.cull_alpha_thresh + 1e-5


class TestSchedule:
    def test_refine_steps(self):
        cfg = strategy.StrategyConfig()
        assert not cfg.is_refine_step(100)   # warmup
        assert cfg.is_refine_step(600)
        assert not cfg.is_refine_step(650)
        # Splatfacto resets refine_every steps AFTER the interval boundary.
        assert cfg.is_reset_step(3100)
        assert not cfg.is_reset_step(3000)
        assert not cfg.is_reset_step(3200)
        assert cfg.splits_allowed(14999) and not cfg.splits_allowed(15000)
        # Densification pauses for num_train_data + refine_every steps
        # after each reset, and stops entirely at stop_split_at.
        n_data = 100
        assert not cfg.densify_active(3200, n_data)   # inside the pause
        assert cfg.densify_active(3300, n_data)       # past it
        assert cfg.densify_active(1000, n_data)
        assert not cfg.densify_active(15000, n_data)


class TestZeroOptRows:
    def test_zeroing(self):
        import optax

        from collab_splats_tpu.train import optim

        params, alive, _ = _setup()
        opt = optim.make_optimizer(
            optim.RADE_GS_GROUPS, optim.default_labels(params)
        )
        st = opt.init(params)
        # Make moments nonzero.
        g = jax.tree_util.tree_map(jnp.ones_like, params)
        _, st = opt.update(g, st, params)
        written = jnp.zeros(64, bool).at[7].set(True)
        st2 = strategy.zero_opt_rows(st, written)
        leaves = [
            x for x in jax.tree_util.tree_leaves(st2)
            if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == 64
            and x.size > 0
        ]
        assert leaves, "no capacity-shaped leaves found in optimizer state"
        for leaf in leaves:
            assert float(jnp.sum(jnp.abs(leaf[7]))) == 0.0
            assert float(jnp.sum(jnp.abs(leaf[6]))) > 0.0


class TestCapacityFullSplits:
    def test_split_sources_survive_when_children_cannot_fit(self):
        """A full table must never net-delete high-gradient Gaussians: if a
        split's children can't be placed, the source stays alive."""
        c = 16
        key = jax.random.PRNGKey(0)
        params = {
            "means": jax.random.normal(key, (c, 3)),
            "scales": jnp.full((c, 3), jnp.log(0.5)),     # big -> split
            "quats": jnp.tile(jnp.array([1.0, 0, 0, 0]), (c, 1)),
            "opacities": jnp.full((c, 1), 3.0),           # high alpha
            "features_dc": jnp.zeros((c, 3)),
            "features_rest": jnp.zeros((c, 0, 3)),
        }
        alive = jnp.ones((c,), bool)                      # table FULL
        state = strategy.StrategyState(
            grad_accum=jnp.full((c,), 10.0),              # all high-grad
            count=jnp.ones((c,)),
            max_radii=jnp.zeros((c,)),
        )
        cfg = strategy.StrategyConfig()
        res = strategy.refine(params, alive, state, key, cfg,
                              scene_scale=1.0)
        # No free slots, nothing culled -> nothing written, nobody removed.
        assert int(jnp.sum(res.alive)) == c
        assert int(jnp.sum(res.written)) == 0
        assert int(res.dropped) > 0


class TestCheckpointStratState:
    def test_strategy_state_round_trips(self, tmp_path):
        from collab_splats_tpu.train import checkpoint as ckpt
        c = 8
        params = {"means": jnp.zeros((c, 3)),
                  "scales": jnp.zeros((c, 3)),
                  "quats": jnp.tile(jnp.array([1.0, 0, 0, 0]), (c, 1)),
                  "opacities": jnp.zeros((c, 1)),
                  "features_dc": jnp.zeros((c, 3)),
                  "features_rest": jnp.zeros((c, 0, 3))}
        alive = jnp.ones((c,), bool)
        st = strategy.StrategyState(
            grad_accum=jnp.arange(c, dtype=jnp.float32),
            count=jnp.full((c,), 2.0),
            max_radii=jnp.full((c,), 0.25),
        )
        ckpt.save_checkpoint(tmp_path, 7, params, alive, strat_state=st)
        # Restore through the Trainer path (the naming of NamedTuple
        # keypaths bit once: 'strat/.grad_accum' vs 'strat/grad_accum').
        from collab_splats_tpu.core.cameras import Camera
        from collab_splats_tpu.train.trainer import Trainer, TrainerConfig
        cam = Camera(K=jnp.eye(3), c2w=jnp.eye(4), width=8, height=8)
        img = np.zeros((8, 8, 3), np.float32)
        tr = Trainer(TrainerConfig(), [cam], [img], params, alive)
        import glob
        path = sorted(glob.glob(str(tmp_path / "*.npz")))[-1]
        tr.restore(path)
        np.testing.assert_allclose(tr.strat_state.grad_accum,
                                   np.arange(c, dtype=np.float32))
        np.testing.assert_allclose(tr.strat_state.count, 2.0)
        np.testing.assert_allclose(tr.strat_state.max_radii, 0.25)
