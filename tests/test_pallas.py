"""Pallas kernel tests (interpret mode on CPU): pixel + gradient parity
against the XLA tiled path, which itself matches the golden renderer."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.core.options import RenderOptions
from collab_splats_tpu.core.sh import sh0_to_rgb
from collab_splats_tpu.data.synthetic import orbit_cameras, random_gaussian_params
from collab_splats_tpu.ops.rasterize import render_tiled, render_tiled_pallas


def _scene(n=200, w=48, h=48, key=2):
    cam = orbit_cameras(1, radius=2.5, width=w, height=h, focal=1.4 * w)[0]
    p = random_gaussian_params(jax.random.PRNGKey(key), n, extent=0.7)
    return cam, (
        p["means"], p["scales"], p["quats"], p["opacities"], p["features_dc"]
    )


OPTS = RenderOptions(tile_capacity=256, max_intersections=1 << 14)


class TestPallasForward:
    @pytest.mark.parametrize("mode", ["classic", "antialiased"])
    def test_exact_pixel_parity(self, mode):
        cam, (m, ls, q, op, dc) = _scene()
        opts = RenderOptions(rasterize_mode=mode, tile_capacity=256,
                             max_intersections=1 << 14)
        s, o, c = jnp.exp(ls), jax.nn.sigmoid(op[:, 0]), sh0_to_rgb(dc)
        ref, _ = render_tiled(m, q, s, o, c, cam, opts)
        out, _ = render_tiled_pallas(
            m, q, s, o, c, cam, opts, stop_threshold=0.0, interpret=True
        )
        # ulp-level differences come from the kernel's matmul-based lane
        # cumsum (vs XLA's scan) and 1-exp vs expm1 for alpha; the
        # alpha-normalized expected depth amplifies them at low-alpha pixels.
        tols = {"color": 2e-6, "alpha": 2e-6, "normal": 2e-6,
                "median_depth": 2e-6, "depth": 1e-4}
        for name, atol in tols.items():
            np.testing.assert_allclose(
                np.asarray(getattr(out, name)), np.asarray(getattr(ref, name)),
                atol=atol, err_msg=f"pallas/{name} != xla/{name}",
            )

    def test_early_exit_close(self):
        # With the saturation early-exit enabled, outputs may differ only
        # below the stop threshold.
        cam, (m, ls, q, op, dc) = _scene(n=400)
        s, o, c = jnp.exp(ls), jax.nn.sigmoid(op[:, 0] + 3.0), sh0_to_rgb(dc)
        ref, _ = render_tiled(m, q, s, o, c, cam, OPTS)
        out, _ = render_tiled_pallas(
            m, q, s, o, c, cam, OPTS, stop_threshold=1e-4, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(out.color), np.asarray(ref.color), atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(out.alpha), np.asarray(ref.alpha), atol=2e-4
        )

    def test_nd_features_channels(self):
        cam, (m, ls, q, op, dc) = _scene(n=100)
        s, o = jnp.exp(ls), jax.nn.sigmoid(op[:, 0])
        c16 = jnp.concatenate(
            [sh0_to_rgb(dc),
             jax.random.normal(jax.random.PRNGKey(7), (100, 13))], axis=1
        )
        ref, _ = render_tiled(m, q, s, o, c16, cam, OPTS)
        out, _ = render_tiled_pallas(
            m, q, s, o, c16, cam, OPTS, stop_threshold=0.0, interpret=True
        )
        assert out.color.shape[-1] == 16
        np.testing.assert_allclose(np.asarray(out.color),
                                   np.asarray(ref.color), atol=2e-6)


class TestPallasBackward:
    def test_gradient_parity(self):
        cam, (m, ls, q, op, dc) = _scene(n=150, key=4)
        target = jax.random.uniform(jax.random.PRNGKey(5), (48, 48, 3))

        def mk_loss(render_fn):
            def loss(means, log_scales, quats, opac_raw, dcc):
                out = render_fn(
                    means, quats, jnp.exp(log_scales),
                    jax.nn.sigmoid(opac_raw[:, 0]), sh0_to_rgb(dcc),
                )
                return (
                    jnp.mean((out.color - target) ** 2)
                    + 0.05 * jnp.mean(out.depth * target[..., 0])
                    + 0.05 * jnp.mean(out.normal * target)
                    + 0.05 * jnp.mean(out.alpha)
                    + 0.02 * jnp.mean(out.median_depth * target[..., 1])
                )
            return loss

        # Compare against the legacy composite_chunk path: the per-tile
        # Pallas kernel's VJP mirrors that recurrence term-for-term, while
        # the fused-VJP default reduces pixel moments via tile-local matmul
        # recombination that differs by a few f32 ulps (pinned against the
        # legacy path separately in test_composite_vjp.py).
        legacy = dataclasses.replace(OPTS, fused_vjp=False)
        ref_fn = lambda *a: render_tiled(*a, cam, legacy)[0]
        pal_fn = lambda *a: render_tiled_pallas(
            *a, cam, OPTS, stop_threshold=0.0, interpret=True
        )[0]
        args = (m, ls, q, op, dc)
        g_ref = jax.grad(mk_loss(ref_fn), argnums=tuple(range(5)))(*args)
        g_pal = jax.grad(mk_loss(pal_fn), argnums=tuple(range(5)))(*args)
        for gr, gp, name in zip(
            g_ref, g_pal, ("means", "scales", "quats", "opac", "dc")
        ):
            scale = np.abs(np.asarray(gr)).max() + 1e-12
            np.testing.assert_allclose(
                np.asarray(gp) / scale, np.asarray(gr) / scale,
                atol=1e-5, err_msg=f"gradient mismatch on {name}",
            )


class TestBatchedCompositor:
    """The batched Pallas forward (ops/pallas/batched.py, interpret mode on
    CPU) against the XLA fused path, forward and gradients."""

    def _scene(self, n=500):
        from collab_splats_tpu.core.sh import sh0_to_rgb
        from collab_splats_tpu.data.synthetic import (
            orbit_cameras, random_gaussian_params,
        )

        p = random_gaussian_params(jax.random.PRNGKey(5), n)
        # 64x64 at ts=16 -> 16 tiles; padded to TC=32 chunks internally.
        cam = orbit_cameras(2, radius=2.5, width=128, height=128,
                            focal=1.3 * 128)[0]
        m = p["means"]
        q = p["quats"]
        s = jnp.exp(p["scales"])
        o = jax.nn.sigmoid(p["opacities"][:, 0])
        c = sh0_to_rgb(p["features_dc"])
        return m, q, s, o, c, cam

    def _opts(self, pallas):
        from collab_splats_tpu.core.options import RenderOptions

        return RenderOptions(tile_capacity=128, max_intersections=1 << 14,
                             pallas_batched=pallas, pallas_interpret=pallas,
                             tile_size=16)

    def test_forward_matches_xla_fused(self):
        from collab_splats_tpu.ops.rasterize import render_tiled

        m, q, s, o, c, cam = self._scene()
        a, _ = render_tiled(m, q, s, o, c, cam, self._opts(True),
                            tile_chunk=32)
        b, _ = render_tiled(m, q, s, o, c, cam, self._opts(False),
                            tile_chunk=32)
        for name in ("color", "alpha", "depth", "median_depth", "normal"):
            np.testing.assert_allclose(
                np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
                rtol=1e-5, atol=1e-5, err_msg=name)

    def test_features_channels_match_xla_fused(self):
        # 16-channel values (3 rgb + 13 latents) exercise the in-kernel
        # fused value reduction at the rade-features channel width
        # (n_vals = 3 normal + 16 = 19 per-channel FMA passes).
        from collab_splats_tpu.ops.rasterize import render_tiled

        m, q, s, o, c, cam = self._scene()
        c16 = jnp.concatenate(
            [c, jax.random.normal(jax.random.PRNGKey(9),
                                  (c.shape[0], 13))], axis=1)
        a, _ = render_tiled(m, q, s, o, c16, cam, self._opts(True),
                            tile_chunk=32)
        b, _ = render_tiled(m, q, s, o, c16, cam, self._opts(False),
                            tile_chunk=32)
        assert a.color.shape[-1] == 16
        np.testing.assert_allclose(
            np.asarray(a.color), np.asarray(b.color), rtol=1e-5, atol=1e-5)

    def test_gradients_match_xla_fused(self):
        import functools

        from collab_splats_tpu.ops.rasterize import render_tiled

        m, q, s, o, c, cam = self._scene()

        def loss(pallas, m, o, c):
            out, _ = render_tiled(m, q, s, o, c, cam, self._opts(pallas),
                                  tile_chunk=32)
            return (jnp.sum(out.color ** 2) + jnp.sum(out.depth)
                    + jnp.sum(out.alpha) + jnp.sum(out.median_depth)
                    + jnp.sum(out.normal))

        gp = jax.grad(functools.partial(loss, True), argnums=(0, 1, 2))(
            m, o, c)
        gx = jax.grad(functools.partial(loss, False), argnums=(0, 1, 2))(
            m, o, c)
        for a, b, name in zip(gp, gx, ("means", "opac", "colors")):
            a = np.asarray(a)
            b = np.asarray(b)
            scale = max(np.abs(b).max(), 1.0)
            np.testing.assert_allclose(a, b, rtol=5e-4, atol=5e-5 * scale,
                                       err_msg=name)
