"""Feature-splatting tests: decoder, similarity, rade-features training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.core.options import RenderOptions
from collab_splats_tpu.data.synthetic import orbit_cameras, random_gaussian_params
from collab_splats_tpu.features import decoder as dec
from collab_splats_tpu.features.similarity import compute_similarity
from collab_splats_tpu.models import rade_features
from collab_splats_tpu.models.gaussians import pad_to_capacity

FEATURE_DIMS = (("clip-vit", (8, 6, 6)), ("dinov2", (4, 5, 5)))


class TestDecoder:
    def test_shapes_and_branches(self):
        p = dec.init_decoder(jax.random.PRNGKey(0), 13, 64, dict(FEATURE_DIMS))
        x = jax.random.normal(jax.random.PRNGKey(1), (6, 6, 13))
        out = dec.decode(p, x)
        assert set(out) == {"clip-vit", "dinov2"}
        assert out["clip-vit"].shape == (6, 6, 8)
        assert out["dinov2"].shape == (6, 6, 4)

    def test_per_pixel_equals_per_vertex(self):
        # The same function serves maps and flat arrays (reference needed
        # two code paths, features.py:444-478).
        p = dec.init_decoder(jax.random.PRNGKey(0), 13, 32, dict(FEATURE_DIMS))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, 4, 13))
        out_map = dec.decode(p, x)["clip-vit"]
        out_flat = dec.decode(p, x.reshape(-1, 13))["clip-vit"]
        np.testing.assert_allclose(
            out_map.reshape(-1, 8), out_flat, rtol=1e-6
        )

    def test_decode_rendered_features(self):
        p = dec.init_decoder(jax.random.PRNGKey(0), 13, 32, dict(FEATURE_DIMS))
        feat_map = jax.random.normal(jax.random.PRNGKey(2), (24, 24, 13))
        out = dec.decode_rendered_features(
            p, feat_map, dict(FEATURE_DIMS), "clip-vit"
        )
        # Reference layout: [C, H, W]; non-main branch at its native dims.
        assert out["clip-vit"].shape == (8, 6, 6)
        assert out["dinov2"].shape == (4, 5, 5)


class TestSimilarity:
    def _feats(self):
        emb = jax.random.normal(jax.random.PRNGKey(0), (3, 8))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        # Feature map equal to embedding 0 on the left half, 1 on the right.
        fmap = jnp.zeros((8, 4, 4))
        fmap = fmap.at[:, :, :2].set(emb[0][:, None, None])
        fmap = fmap.at[:, :, 2:].set(emb[1][:, None, None])
        return fmap, emb

    @pytest.mark.parametrize("method", ["standard", "pairwise"])
    def test_positive_region_scores_high(self, method):
        fmap, emb = self._feats()
        sim = compute_similarity(fmap, emb, num_positive=1, method=method)
        assert sim.shape == (4, 4, 1)
        left = float(sim[:, :2].mean())
        right = float(sim[:, 2:].mean())
        # Note: the reference's "pairwise" softmax normalizes over all
        # 2*Nn rows (features.py:302-307), capping the score at 1/Nn —
        # matched here, so assert separation rather than an absolute level.
        assert left > 0.4 and right < 0.1 and left > 4 * right

    def test_probabilities_bounded(self):
        fmap, emb = self._feats()
        for method in ("standard", "pairwise"):
            sim = compute_similarity(fmap, emb, 2, method=method)
            assert 0.0 <= float(sim.min()) and float(sim.max()) <= 1.0


class TestRadeFeaturesModel:
    def _setup(self):
        cfg = rade_features.RadeFeaturesConfig(
            background="black",
            render=RenderOptions(tile_capacity=128, max_intersections=1 << 13),
            feature_dims=FEATURE_DIMS,
            use_depth_normal_loss=False,
        )
        capacity = 128
        params = random_gaussian_params(jax.random.PRNGKey(0), 100, extent=0.5)
        params = pad_to_capacity(params, capacity)
        params = rade_features.init_feature_params(
            jax.random.PRNGKey(1), params, cfg
        )
        alive = jnp.arange(capacity) < 100
        cam = orbit_cameras(1, radius=2.5, width=48, height=48, focal=55.0)[0]
        return cfg, params, alive, cam

    def test_forward_has_features(self):
        cfg, params, alive, cam = self._setup()
        out, _ = rade_features.get_outputs(
            params, alive, cam, 0, cfg, training=False
        )
        assert out["features"].shape == (48, 48, 13)
        assert out["rgb"].shape == (48, 48, 3)

    def test_distillation_reduces_loss(self):
        cfg, params, alive, cam = self._setup()
        key = jax.random.PRNGKey(3)
        gt_feats = {
            "clip-vit": jax.random.normal(key, (8, 6, 6)),
            "dinov2": jax.random.normal(key, (4, 5, 5)),
        }
        image = jnp.zeros((48, 48, 3))

        def loss_fn(p):
            out, _ = rade_features.get_outputs(
                p, alive, cam, 0, cfg, training=False
            )
            total, ld = rade_features.get_loss(
                out, image, gt_feats, p, alive, 0, cfg
            )
            return ld["features_loss"]

        g = jax.grad(
            lambda p: loss_fn(p)
        )(params)
        # Gradients flow into latents and decoder (hidden_w has zero grad at
        # the zero-latent init since dL/dW1 = x * delta with x == 0; the
        # bias and head weights carry the signal initially).
        assert float(jnp.sum(jnp.abs(g["distill_features"]))) > 0
        assert float(jnp.sum(jnp.abs(g["decoder"]["hidden_b"]))) > 0
        assert float(jnp.sum(jnp.abs(g["decoder"]["branch_clip-vit_w"]))) > 0

        # A few SGD steps must reduce the distillation loss.
        p = params
        l0 = float(loss_fn(p))
        for _ in range(20):
            g = jax.grad(loss_fn)(p)
            p = jax.tree_util.tree_map(lambda a, b: a - 20.0 * b, p, g)
        l1 = float(loss_fn(p))
        assert l1 < l0, f"distillation loss did not drop: {l0} -> {l1}"

    def test_similarity_map(self):
        cfg, params, alive, cam = self._setup()
        out, _ = rade_features.get_outputs(
            params, alive, cam, 0, cfg, training=False
        )
        emb = jax.random.normal(jax.random.PRNGKey(9), (2, 8))
        emb = emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)
        sim = rade_features.similarity_map(params, out, emb, 1, cfg)
        assert sim.shape == (48, 48, 1)
        assert np.all(np.isfinite(np.asarray(sim)))
