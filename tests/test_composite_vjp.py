"""The analytic compositing VJP must match autodiff of the naive form.

``composite_chunk`` (core/compositing.py) carries a hand-derived backward
(suffix-sum recurrence).  These tests check both the primal outputs and the
gradients against a straight differentiable-JAX reference implementation of
front-to-back compositing, on random alphas including fully-masked rows and
saturating (alpha ~ ALPHA_MAX) splats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.core.compositing import (
    ALPHA_MAX,
    composite_chunk,
    median_select,
    transmittance_weights,
)


def naive(alphas, tpix, values):
    w = transmittance_weights(alphas)
    out_v = jnp.einsum("tpk,tkv->tpv", w, values)
    alpha_out = 1.0 - jnp.prod(1.0 - alphas, axis=-1)
    depth_acc = jnp.sum(w * tpix, axis=-1)
    median = median_select(w, tpix)
    median = jnp.where(alpha_out > 0.0, median, 0.0)
    return out_v, alpha_out, depth_acc, median


def _rand_inputs(key, t=2, p=5, k=16, v=4, saturate=False):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = jax.random.uniform(k1, (t, p, k), minval=0.0, maxval=0.9)
    if saturate:
        a = a.at[:, :, 1].set(ALPHA_MAX)
    # Zero some entries exactly (masked splats) like splat_alpha does.
    drop = jax.random.bernoulli(k2, 0.3, (t, p, k))
    a = jnp.where(drop, 0.0, a)
    a = a.at[-1].set(0.0)  # one fully-empty tile
    tpix = jax.random.uniform(k3, (t, p, k), minval=0.5, maxval=5.0)
    values = jax.random.normal(k4, (t, k, v))
    return a, tpix, values


class TestCompositeChunk:
    @pytest.mark.parametrize("saturate", [False, True])
    def test_primal_matches_naive(self, saturate):
        a, tpix, values = _rand_inputs(jax.random.PRNGKey(0), saturate=saturate)
        got = composite_chunk(a, tpix, values)
        want = naive(a, tpix, values)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("saturate", [False, True])
    def test_grads_match_naive(self, saturate):
        a, tpix, values = _rand_inputs(jax.random.PRNGKey(1), saturate=saturate)
        key = jax.random.PRNGKey(2)
        # Random cotangent projection -> scalar, so grad covers all outputs.
        cots = [jax.random.normal(jax.random.fold_in(key, i), s.shape)
                for i, s in enumerate(composite_chunk(a, tpix, values))]

        def scal(fn):
            def f(a, tpix, values):
                outs = fn(a, tpix, values)
                return sum(jnp.sum(o * c) for o, c in zip(outs, cots))
            return f

        g_ana = jax.grad(scal(composite_chunk), argnums=(0, 1, 2))(a, tpix, values)
        g_ad = jax.grad(scal(naive), argnums=(0, 1, 2))(a, tpix, values)
        for ga, gb, name in zip(g_ana, g_ad, ["alphas", "tpix", "values"]):
            # Median gradients flow through a piecewise-constant selection in
            # both paths; identical index => identical gradient.  Tolerance
            # covers the log-space transmittance formulation (exp(cumsum
            # (log1p))): near-saturated alphas shift t_excl by ~5e-4 rel
            # against the naive cumprod reference.
            np.testing.assert_allclose(
                np.asarray(ga), np.asarray(gb), rtol=1e-3, atol=2e-5,
                err_msg=f"grad mismatch for {name}",
            )

    def test_grads_under_checkpoint_and_map(self):
        """The production call pattern: checkpoint(chunk) under lax.map."""
        a, tpix, values = _rand_inputs(jax.random.PRNGKey(3), t=4)

        def loss(a, tpix, values):
            @jax.checkpoint
            def body(i):
                outs = composite_chunk(a[i][None], tpix[i][None], values[i][None])
                return sum(jnp.sum(o) for o in outs)

            return jnp.sum(jax.lax.map(body, jnp.arange(4)))

        def loss_naive(a, tpix, values):
            outs = naive(a, tpix, values)
            return sum(jnp.sum(o) for o in outs)

        g1 = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(a, tpix, values)
        g2 = jax.grad(loss_naive, argnums=(0, 1, 2))(a, tpix, values)
        for ga, gb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                       rtol=2e-4, atol=2e-5)

    def test_finite_differences_spot(self):
        a, tpix, values = _rand_inputs(jax.random.PRNGKey(4), t=1, p=2, k=6, v=2)

        def f(a):
            outs = composite_chunk(a, tpix, values)
            return jnp.sum(outs[0]) + jnp.sum(outs[1]) + jnp.sum(outs[2])

        g = jax.grad(f)(a)
        eps = 1e-4
        for i in range(6):
            da = jnp.zeros_like(a).at[0, 1, i].set(eps)
            fd = (f(a + da) - f(a - da)) / (2 * eps)
            np.testing.assert_allclose(float(g[0, 1, i]), float(fd),
                                       rtol=5e-3, atol=1e-4)


class TestCumsumMxu:
    def test_matches_plain_cumsum(self):
        from collab_splats_tpu.core.compositing import cumsum_mxu
        x = jax.random.normal(jax.random.PRNGKey(7), (3, 5, 512))
        np.testing.assert_allclose(
            np.asarray(cumsum_mxu(x)), np.asarray(jnp.cumsum(x, axis=-1)),
            rtol=1e-5, atol=1e-5)
        rev = jnp.flip(jnp.cumsum(jnp.flip(x, -1), -1), -1)
        np.testing.assert_allclose(
            np.asarray(cumsum_mxu(x, reverse=True)), np.asarray(rev),
            rtol=1e-5, atol=1e-5)

    def test_small_and_odd_sizes(self):
        from collab_splats_tpu.core.compositing import cumsum_mxu
        for k in (8, 24, 100, 130):
            x = jax.random.normal(jax.random.PRNGKey(k), (4, k))
            np.testing.assert_allclose(
                np.asarray(cumsum_mxu(x)), np.asarray(jnp.cumsum(x, axis=-1)),
                rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(cumsum_mxu(x, reverse=True)),
                np.asarray(jnp.flip(jnp.cumsum(jnp.flip(x, -1), -1), -1)),
                rtol=1e-5, atol=1e-5)
