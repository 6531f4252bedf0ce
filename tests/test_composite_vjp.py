"""The analytic compositing VJP must match autodiff of the naive form.

``composite_chunk`` (core/compositing.py) carries a hand-derived backward
(suffix-sum recurrence).  These tests check both the primal outputs and the
gradients against a straight differentiable-JAX reference implementation of
front-to-back compositing, on random alphas including fully-masked rows and
saturating (alpha ~ ALPHA_MAX) splats.
"""

import functools

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


class TestFusedCompositor:
    """The fused g->maps VJP (fused_compositor) against the legacy
    composite_chunk path through the full tiled renderer."""

    def _scene(self, n=400, size=64):
        from collab_splats_tpu.core.sh import sh0_to_rgb
        from collab_splats_tpu.data.synthetic import (
            orbit_cameras, random_gaussian_params,
        )

        p = random_gaussian_params(jax.random.PRNGKey(3), n)
        cam = orbit_cameras(3, radius=2.5, width=size, height=size,
                            focal=1.1 * size)[0]
        m = p["means"]
        q = p["quats"]
        s = jnp.exp(p["scales"])
        o = jax.nn.sigmoid(p["opacities"][:, 0])
        c = sh0_to_rgb(p["features_dc"])
        return m, q, s, o, c, cam

    def test_forward_matches_legacy(self):
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.ops.rasterize import render_tiled

        m, q, s, o, c, cam = self._scene()
        opts_f = RenderOptions(tile_capacity=64, max_intersections=1 << 13,
                               fused_vjp=True)
        opts_l = RenderOptions(tile_capacity=64, max_intersections=1 << 13,
                               fused_vjp=False)
        a, _ = render_tiled(m, q, s, o, c, cam, opts_f)
        b, _ = render_tiled(m, q, s, o, c, cam, opts_l)
        # w is computed as t_excl * -expm1(log1p(-alpha)) in the fused path
        # vs alpha * t_excl in the legacy one: equal to ~1 ulp.
        np.testing.assert_allclose(np.asarray(a.color), np.asarray(b.color),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.alpha), np.asarray(b.alpha),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.depth), np.asarray(b.depth),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.median_depth),
                                   np.asarray(b.median_depth),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(a.normal), np.asarray(b.normal),
                                   rtol=1e-5, atol=1e-6)

    def test_gradients_match_legacy(self):
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.ops.rasterize import render_tiled

        m, q, s, o, c, cam = self._scene()

        def loss(fused, m, q, s, o, c):
            opts = RenderOptions(tile_capacity=64,
                                 max_intersections=1 << 13,
                                 fused_vjp=fused)
            out, _ = render_tiled(m, q, s, o, c, cam, opts)
            # Touch every output head.
            return (jnp.sum(out.color * jnp.cos(out.color))
                    + jnp.sum(out.depth) + 0.5 * jnp.sum(out.alpha)
                    + jnp.sum(out.median_depth) + jnp.sum(out.normal))

        gf = jax.grad(functools.partial(loss, True), argnums=(0, 1, 2, 3, 4))(
            m, q, s, o, c)
        gl = jax.grad(functools.partial(loss, False), argnums=(0, 1, 2, 3, 4))(
            m, q, s, o, c)
        for a, b, name in zip(gf, gl, ("means", "quats", "scales",
                                       "opac", "colors")):
            a = np.asarray(a)
            b = np.asarray(b)
            # The two formulations accumulate in different orders (analytic
            # recurrence vs autodiff transposes); agreement is relative to
            # the gradient's scale, not absolute.
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(
                a, b, rtol=5e-4, atol=5e-5 * scale,
                err_msg=f"gradient mismatch for {name}")

    def test_sink_gradient_matches_legacy(self):
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.ops.rasterize import (
            absgrad_sink_shape, render_tiled,
        )

        m, q, s, o, c, cam = self._scene()

        def loss(fused, sink):
            opts = RenderOptions(tile_capacity=64,
                                 max_intersections=1 << 13,
                                 fused_vjp=fused)
            out, _ = render_tiled(m, q, s, o, c, cam, opts,
                                  absgrad_sink=sink)
            return jnp.sum(out.color ** 2) + jnp.sum(out.depth)

        opts0 = RenderOptions(tile_capacity=64, max_intersections=1 << 13)
        sink = jnp.zeros(absgrad_sink_shape(cam.width, cam.height,
                                            m.shape[0], opts0))
        gf = jax.grad(functools.partial(loss, True))(sink)
        gl = jax.grad(functools.partial(loss, False))(sink)
        assert float(jnp.abs(gf).max()) > 0
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gl),
                                   rtol=5e-4, atol=2e-5)

    def test_analytic_bwd_exact_vs_autodiff_f64(self):
        """The hand-derived backward is *exact* (not just close): compared in
        f64 against autodiff of the identical forward math, so f32
        accumulation-order noise cannot mask a derivation error."""
        from collab_splats_tpu.core.compositing import (
            _fused_fwd_common, _fused_outputs, fused_compositor,
        )

        near = 0.01
        with jax.enable_x64():
            T, P, K, V = 2, 6, 16, 5
            ks = jax.random.split(jax.random.PRNGKey(0), 8)
            g = jnp.concatenate([
                jax.random.uniform(ks[0], (T, K, 2), minval=0., maxval=40.),
                jnp.stack([
                    jax.random.uniform(ks[1], (T, K), minval=.05, maxval=.3),
                    jax.random.uniform(ks[2], (T, K), minval=-.05, maxval=.05),
                    jax.random.uniform(ks[3], (T, K), minval=.05, maxval=.3),
                ], -1),
                jax.random.uniform(ks[4], (T, K, 1), minval=.5, maxval=3.),
                jax.random.uniform(ks[5], (T, K, 2), minval=-.1, maxval=.1),
                jax.random.uniform(ks[6], (T, K, 1), minval=.05, maxval=.999),
                jax.random.normal(ks[7], (T, K, V)),
            ], -1).astype(jnp.float64)
            msk = (jax.random.uniform(jax.random.PRNGKey(9), (T, K)) > 0.2
                   ).astype(jnp.float64)
            up = jnp.tile(jnp.arange(P, dtype=jnp.float64)[None] * 5. + 2.,
                          (T, 1))
            vp = jnp.tile(jnp.arange(P, dtype=jnp.float64)[None] * 5. + 3.,
                          (T, 1))
            snk = jnp.zeros((T, K, 2), jnp.float64)

            f = fused_compositor(near)

            def f_nocustom(g, snk, msk, up, vp):
                (du, dv, sigma, alpha_raw, keep, log1m, cum, t_excl, w,
                 tpix) = _fused_fwd_common(g, snk, msk, up, vp, near)
                out_v, alpha_out, depth_acc, median, _, _ = _fused_outputs(
                    g, w, cum, log1m, tpix, differentiable=True)
                return out_v, alpha_out, depth_acc, median

            def loss(fn, g, snk):
                o, a, d, m = fn(g, snk, msk, up, vp)
                return (jnp.sum(o * jnp.cos(o)) + jnp.sum(d)
                        + 0.5 * jnp.sum(a) + jnp.sum(m))

            ga = jax.grad(lambda g, s: loss(f, g, s), argnums=(0, 1))(g, snk)
            gb = jax.grad(lambda g, s: loss(f_nocustom, g, s),
                          argnums=(0, 1))(g, snk)
            for x, y in zip(ga, gb):
                np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                           rtol=1e-12, atol=1e-12)
