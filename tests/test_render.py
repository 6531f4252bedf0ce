"""Golden-renderer sanity tests and tiled-vs-golden parity (pixels + grads).

This is the kernel-level golden-test layer the reference lacks entirely
(SURVEY.md §4): the naive O(N*pixels) renderer is the semantic spec; the
production tiled rasterizer must match it on every output map and on
parameter gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.core.cameras import depth_pair_to_normal, make_camera
from collab_splats_tpu.core.golden import render_golden
from collab_splats_tpu.core.options import RenderOptions
from collab_splats_tpu.core.sh import sh0_to_rgb
from collab_splats_tpu.data.synthetic import (
    flat_disk_gaussian,
    look_at_c2w,
    orbit_cameras,
    random_gaussian_params,
)
from collab_splats_tpu.ops.rasterize import render_tiled


def _activated(params):
    return (
        params["means"],
        params["quats"],
        jnp.exp(params["scales"]),
        jax.nn.sigmoid(params["opacities"][:, 0]),
        sh0_to_rgb(params["features_dc"]),
    )


def _front_camera(width=64, height=64, dist=2.0, focal=100.0):
    c2w = look_at_c2w(np.array([0.0, 0.0, dist]), np.zeros(3))
    return make_camera(focal, focal, width / 2, height / 2, width, height, c2w)


class TestGolden:
    def test_single_gaussian_peak(self):
        cam = _front_camera()
        disk = flat_disk_gaussian(radius=0.1, thickness=0.01)
        m, q, s, o, c = _activated(disk)
        out = render_golden(m, q, s, o, c, None, cam)
        img = np.asarray(out.color)
        # Peak at image center; red-dominant color.
        peak = np.unravel_index(img[..., 0].argmax(), img[..., 0].shape)
        assert abs(peak[0] - 32) <= 1 and abs(peak[1] - 32) <= 1
        assert img[32, 32, 0] > 0.5 * 0.8
        assert img[32, 32, 0] > img[32, 32, 1]
        # Alpha bounded, depth near 2 at center.
        assert 0.0 <= float(out.alpha.max()) <= 1.0
        assert abs(float(out.depth[32, 32]) - 2.0) < 0.05
        # Corners empty.
        assert float(out.alpha[0, 0]) == 0.0

    def test_disk_normal_consistency(self):
        # Rendered normal of a camera-facing disk ~ (0, 0, -1) and the
        # depth-derived normal from the rendered depth map agrees with it.
        cam = _front_camera(width=96, height=96, focal=200.0)
        disk = flat_disk_gaussian(normal=(0.2, 0.1, 0.95), radius=0.25)
        m, q, s, o, c = _activated(disk)
        out = render_golden(m, q, s, o, c, None, cam)
        center = np.asarray(out.normal[44:52, 44:52])
        alpha_c = np.asarray(out.alpha[44:52, 44:52])
        n = center / np.clip(alpha_c[..., None], 1e-6, None)
        assert np.all(n[..., 2] < 0)  # camera-facing
        # Depth-derived normal map (from the rendered expected depth).
        dn = np.asarray(
            depth_pair_to_normal(cam, out.depth, out.median_depth)[0]
        )
        dots = np.sum(dn[44:52, 44:52] * n / np.linalg.norm(n, axis=-1, keepdims=True), -1)
        assert dots.mean() > 0.95, f"mean normal agreement {dots.mean()}"

    def test_median_vs_expected_two_walls(self):
        # Two stacked semi-transparent walls: expected depth blends; median
        # picks the crossing wall.
        cam = _front_camera(focal=60.0)
        front = flat_disk_gaussian(center=(0, 0, 0.5), radius=0.8, thickness=1e-3)
        back = flat_disk_gaussian(center=(0, 0, -0.5), radius=0.8, thickness=1e-3)
        params = {
            k: jnp.concatenate([front[k], back[k]]) for k in front
        }
        # Opacity ~0.6 each: front alone doesn't cross 0.5, but nearly.
        params["opacities"] = jnp.full((2, 1), 0.4055)  # sigmoid -> 0.6
        m, q, s, o, c = _activated(params)
        out = render_golden(m, q, s, o, c, None, cam)
        d_exp = float(out.depth[32, 32])
        d_med = float(out.median_depth[32, 32])
        # Front wall at z_cam=1.5, back at 2.5.
        assert d_med == pytest.approx(1.5, abs=0.05)
        assert 1.55 < d_exp < 2.2  # blend of both

    def test_gradcheck_finite_difference(self):
        # Finite-difference gradcheck of the full golden render pipeline
        # (BASELINE.md CPU-toy anchor).
        cam = _front_camera(width=24, height=24, focal=40.0)
        key = jax.random.PRNGKey(0)
        params = random_gaussian_params(key, 12, extent=0.4)
        target = jax.random.uniform(jax.random.PRNGKey(9), (24, 24, 3))

        def loss(means, log_scales, opac_raw, dc):
            out = render_golden(
                means,
                params["quats"],
                jnp.exp(log_scales),
                jax.nn.sigmoid(opac_raw[:, 0]),
                sh0_to_rgb(dc),
                None,
                cam,
            )
            return jnp.mean((out.color - target) ** 2) + 0.1 * jnp.mean(out.depth)

        args = (params["means"], params["scales"], params["opacities"],
                params["features_dc"])
        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(*args)
        eps = 3e-3
        rng = np.random.RandomState(0)
        for ai, g in enumerate(grads):
            g = np.asarray(g)
            assert np.all(np.isfinite(g))
            # Probe a few coordinates with central differences.
            for _ in range(3):
                idx = tuple(rng.randint(0, d) for d in g.shape)
                pert = [jnp.asarray(a) for a in args]
                bump = np.zeros(g.shape, np.float32)
                bump[idx] = eps
                fd = (
                    float(loss(*(a + (jnp.asarray(bump) if i == ai else 0)
                                 for i, a in enumerate(pert))))
                    - float(loss(*(a - (jnp.asarray(bump) if i == ai else 0)
                                   for i, a in enumerate(pert))))
                ) / (2 * eps)
                assert fd == pytest.approx(g[idx], rel=0.08, abs=2e-3), (
                    f"arg {ai} idx {idx}: fd={fd} ad={g[idx]}"
                )


class TestTiledVsGolden:
    @pytest.mark.parametrize("mode", ["classic", "antialiased"])
    def test_pixel_parity(self, mode):
        cam = orbit_cameras(1, radius=2.5, width=72, height=56, focal=90.0)[0]
        params = random_gaussian_params(jax.random.PRNGKey(2), 300, extent=0.8)
        m, q, s, o, c = _activated(params)
        opts = RenderOptions(rasterize_mode=mode, tile_capacity=512,
                             max_intersections=1 << 15)
        gold = render_golden(m, q, s, o, c, None, cam, opts)
        tiled, meta = render_tiled(m, q, s, o, c, cam, opts)
        assert int(tiled.spilled) == 0
        np.testing.assert_allclose(tiled.color, gold.color, atol=2e-5)
        np.testing.assert_allclose(tiled.alpha, gold.alpha, atol=2e-5)
        np.testing.assert_allclose(tiled.normal, gold.normal, atol=2e-5)
        np.testing.assert_allclose(tiled.depth, gold.depth, atol=2e-4)
        np.testing.assert_allclose(
            tiled.median_depth, gold.median_depth, atol=2e-4
        )

    def test_gradient_parity(self):
        cam = orbit_cameras(1, radius=2.5, width=48, height=48, focal=70.0)[0]
        params = random_gaussian_params(jax.random.PRNGKey(4), 150, extent=0.7)
        target = jax.random.uniform(jax.random.PRNGKey(5), (48, 48, 3))
        opts = RenderOptions(tile_capacity=256, max_intersections=1 << 14)

        def mk_loss(render_fn):
            def loss(means, log_scales, quats, opac_raw, dc):
                out = render_fn(
                    means, quats, jnp.exp(log_scales),
                    jax.nn.sigmoid(opac_raw[:, 0]), sh0_to_rgb(dc),
                )
                return (
                    jnp.mean((out.color - target) ** 2)
                    + 0.05 * jnp.mean(out.depth * target[..., 0])
                    + 0.05 * jnp.mean(out.normal * target)
                    + 0.05 * jnp.mean(out.alpha)
                )
            return loss

        def golden_fn(m, q, s, o, c):
            return render_golden(m, q, s, o, c, None, cam, opts)

        def tiled_fn(m, q, s, o, c):
            return render_tiled(m, q, s, o, c, cam, opts)[0]

        args = (params["means"], params["scales"], params["quats"],
                params["opacities"], params["features_dc"])
        g_gold = jax.grad(mk_loss(golden_fn), argnums=tuple(range(5)))(*args)
        g_tile = jax.grad(mk_loss(tiled_fn), argnums=tuple(range(5)))(*args)
        for gg, gt, name in zip(
            g_gold, g_tile, ["means", "scales", "quats", "opac", "dc"]
        ):
            np.testing.assert_allclose(
                np.asarray(gt), np.asarray(gg), rtol=1e-4, atol=1e-5,
                err_msg=f"gradient mismatch on {name}",
            )

    def test_absgrad_sink(self):
        from collab_splats_tpu.ops.rasterize import absgrad_sink_shape

        cam = orbit_cameras(1, radius=2.5, width=48, height=48, focal=70.0)[0]
        params = random_gaussian_params(jax.random.PRNGKey(6), 80, extent=0.6)
        m, q, s, o, c = _activated(params)
        opts = RenderOptions(tile_capacity=128, max_intersections=1 << 13)
        sink = jnp.zeros(absgrad_sink_shape(cam.width, cam.height, 80, opts))

        def loss(means, sink):
            out, _ = render_tiled(
                m if means is None else means, q, s, o, c, cam, opts,
                absgrad_sink=sink,
            )
            return jnp.sum(out.color ** 2)

        g_means, g_sink = jax.grad(loss, argnums=(0, 1))(m, sink)
        # The sink cotangent distributes the means2d gradient per
        # intersection; its per-gaussian scatter-sum relates to the d mean2d
        # signed gradient.  Check it is finite and non-trivial.
        assert np.all(np.isfinite(np.asarray(g_sink)))
        assert float(jnp.sum(jnp.abs(g_sink))) > 0


class TestApproxBinning:
    def test_quantized_depth_ordering_close(self):
        # exact_binning=False: same render up to reordering of near-equal
        # depths -> compare loosely against the exact path.
        cam = orbit_cameras(1, radius=2.5, width=64, height=48, focal=80.0)[0]
        params = random_gaussian_params(jax.random.PRNGKey(8), 300, extent=0.8)
        m, q, s, o, c = _activated(params)
        exact = RenderOptions(tile_capacity=512, max_intersections=1 << 15)
        approx = RenderOptions(tile_capacity=512, max_intersections=1 << 15,
                               exact_binning=False)
        a, _ = render_tiled(m, q, s, o, c, cam, exact)
        b, _ = render_tiled(m, q, s, o, c, cam, approx)
        assert int(b.spilled) == 0
        np.testing.assert_allclose(np.asarray(b.color), np.asarray(a.color),
                                   atol=5e-3)
        np.testing.assert_allclose(np.asarray(b.alpha), np.asarray(a.alpha),
                                   atol=5e-3)


class TestBatchedRender:
    def test_vmap_matches_loop(self):
        from collab_splats_tpu.core.cameras import Camera
        from collab_splats_tpu.ops.rasterize import render_tiled_batch

        cams = orbit_cameras(3, radius=2.5, width=48, height=48, focal=60.0)
        params = random_gaussian_params(jax.random.PRNGKey(1), 120, extent=0.6)
        m, q, s, o, c = _activated(params)
        opts = RenderOptions(tile_capacity=128, max_intersections=1 << 13)
        stacked = Camera(
            K=jnp.stack([cc.K for cc in cams]),
            c2w=jnp.stack([cc.c2w for cc in cams]),
            width=48, height=48,
        )
        batch = render_tiled_batch(m, q, s, o, c, stacked, opts)
        assert batch.color.shape == (3, 48, 48, 3)
        for i, cam in enumerate(cams):
            single, _ = render_tiled(m, q, s, o, c, cam, opts)
            # vmapped ops may fuse differently: ulp-level tolerance.
            np.testing.assert_allclose(
                np.asarray(batch.color[i]), np.asarray(single.color),
                atol=5e-6,
            )
            # alpha-normalized depth amplifies scan-order ulp differences
            # at low-alpha pixels.
            np.testing.assert_allclose(
                np.asarray(batch.depth[i]), np.asarray(single.depth),
                atol=1e-4,
            )


class TestRematPolicies:
    def test_no_remat_compositing_gradient_parity(self):
        """remat_compositing=False (store analytic-VJP residuals across the
        chunk loop) must produce identical gradients to the remat default —
        it is a memory/speed trade only (queued for a TPU A/B)."""
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.core.sh import sh0_to_rgb
        from collab_splats_tpu.data.synthetic import (
            orbit_cameras,
            random_gaussian_params,
        )
        from collab_splats_tpu.ops.rasterize import render_tiled

        cam = orbit_cameras(1, radius=2.5, width=64, height=64,
                            focal=70.0)[0]
        p = random_gaussian_params(jax.random.PRNGKey(3), 500)
        m = p["means"]; q = p["quats"]
        s = jnp.exp(p["scales"])
        o = jax.nn.sigmoid(p["opacities"][:, 0])
        c = sh0_to_rgb(p["features_dc"])

        def loss(mm, opts):
            out, _ = render_tiled(mm, q, s, o, c, cam, opts)
            return (jnp.sum(out.color ** 2) + jnp.sum(out.depth)
                    + jnp.sum(out.normal) + jnp.sum(out.median_depth))

        opts_a = RenderOptions(tile_capacity=64, max_intersections=1 << 13)
        import dataclasses
        opts_b = dataclasses.replace(opts_a, remat_compositing=False)
        ga = jax.jit(jax.grad(lambda mm: loss(mm, opts_a)))(m)
        gb = jax.jit(jax.grad(lambda mm: loss(mm, opts_b)))(m)
        np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


class TestCropBox:
    """Eval-time crop box (reference rade_gs_model.py:95-100): gaussians
    outside the [2,3] min/max box must not render; inside-only renders
    match a manually masked render exactly."""

    def test_crop_box_masks_outside(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.data.synthetic import (
            orbit_cameras, random_gaussian_params,
        )
        from collab_splats_tpu.models import rade_gs

        cam = orbit_cameras(1, radius=2.5, width=64, height=64,
                            focal=70.0)[0]
        p = random_gaussian_params(jax.random.PRNGKey(0), 500, extent=0.8)
        alive = jnp.ones(500, bool)
        cfg = rade_gs.RadeGSConfig(sh_degree=0, background="black",
                                   render=RenderOptions())
        box = jnp.array([[-0.4, -0.4, -0.4], [0.4, 0.4, 0.4]])
        out_crop, _ = rade_gs.get_outputs(
            p, alive, cam, 0, cfg, training=False, crop_box=box
        )
        inside = jnp.all((p["means"] >= box[0]) & (p["means"] <= box[1]),
                         axis=-1)
        out_mask, _ = rade_gs.get_outputs(
            p, alive & inside, cam, 0, cfg, training=False
        )
        np.testing.assert_allclose(np.asarray(out_crop["rgb"]),
                                   np.asarray(out_mask["rgb"]), atol=1e-6)
        # And it differs from the uncropped render (the box actually cuts).
        out_full, _ = rade_gs.get_outputs(p, alive, cam, 0, cfg,
                                          training=False)
        assert float(jnp.abs(out_full["rgb"] - out_crop["rgb"]).max()) > 0.01

    def test_prefilter_voxel_flag_accepted(self):
        from collab_splats_tpu.models import rade_gs

        cfg = rade_gs.RadeGSConfig(prefilter_voxel=True)
        assert cfg.prefilter_voxel


class TestEllipseCull:
    """The exact ellipse-vs-tile cull is output-preserving: culled entries
    have alpha < 1/255 at every pixel of their tile, which splat_alpha
    zeroes anyway.  With no tile-window overflow the images must match
    exactly; with a tight window the cull can only reduce spill."""

    def _scene(self):
        from collab_splats_tpu.core.sh import sh0_to_rgb
        from collab_splats_tpu.data.synthetic import (
            orbit_cameras, random_gaussian_params,
        )

        p = random_gaussian_params(jax.random.PRNGKey(11), 600)
        cam = orbit_cameras(2, radius=2.5, width=80, height=64,
                            focal=1.2 * 80)[0]
        m = p["means"]
        q = p["quats"]
        s = jnp.exp(p["scales"]) * 3.0   # fat splats: corner tiles abound
        o = jax.nn.sigmoid(p["opacities"][:, 0])
        c = sh0_to_rgb(p["features_dc"])
        return m, q, s, o, c, cam

    def test_output_preserving_with_ample_window(self):
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.ops.rasterize import render_tiled

        m, q, s, o, c, cam = self._scene()
        outs = {}
        for cull in (True, False):
            opts = RenderOptions(tile_capacity=1024,
                                 max_intersections=1 << 15,
                                 ellipse_cull=cull)
            out, _ = render_tiled(m, q, s, o, c, cam, opts)
            outs[cull] = out
        assert int(outs[True].spilled) == 0
        for name in ("color", "alpha", "depth", "median_depth", "normal"):
            # Culled (zero-alpha) entries shift later splats across
            # scan-block boundaries, regrouping the blocked-matmul
            # transmittance sums by ~1 ulp — allclose, not array_equal.
            np.testing.assert_allclose(
                np.asarray(getattr(outs[True], name)),
                np.asarray(getattr(outs[False], name)),
                rtol=1e-5, atol=1e-6)

    def test_cull_reduces_window_spill(self):
        from collab_splats_tpu.core.options import RenderOptions
        from collab_splats_tpu.ops.rasterize import render_tiled

        m, q, s, o, c, cam = self._scene()
        spills = {}
        for cull in (True, False):
            opts = RenderOptions(tile_capacity=16,
                                 max_intersections=1 << 15,
                                 ellipse_cull=cull)
            out, _ = render_tiled(m, q, s, o, c, cam, opts)
            spills[cull] = int(out.spilled)
        assert spills[True] <= spills[False]
        # The scene's fat anisotropic splats make the cull strictly
        # effective (measured ~10-30% of bbox entries are spurious).
        assert spills[True] < spills[False]
