"""RaDe-Features model: RaDe-GS + distilled ANN feature splatting.

TPU-native re-derivation of the reference ``RadegsFeaturesModel``
(/root/reference/collab_splats/models/rade_features_model.py):

* per-Gaussian 13-dim latents rasterized fused with RGB (SH precomputed to
  colors, :427-441 — our rasterizer natively renders N-D channels, so the
  reference's "hack" is simply the normal path here);
* a TwoLayerMLP decoder to each ANN feature space, trained with weighted
  cosine distillation (:545-584: weight 1.0 on the main branch, 0.1 on
  regularization branches, everything scaled by 1e-3);
* text-query similarity maps at eval time (:493-539).

The decoder's parameters live under ``params["decoder"]`` so the same
optimizer/refinement machinery applies (refinement skips non-Gaussian
subtrees; the optimizer labels the subtree "decoder" for its 1e-3 Adam
group, configs/rade_features_method.py:79-81).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.cameras import Camera
from ..features import decoder as decoder_lib
from ..features.similarity import compute_similarity
from ..ops.rasterize import RenderMeta
from ..train import losses
from .gaussians import GaussianParams
from . import rade_gs


@dataclasses.dataclass(frozen=True)
class RadeFeaturesConfig(rade_gs.RadeGSConfig):
    """Reference RadegsFeaturesModelConfig (rade_features_model.py:31-75)."""

    latent_dim: int = 13
    mlp_hidden_dim: int = 64
    features_loss_lambda: float = 1e-3
    features_regularization_lambda: float = 0.1
    main_feature_name: str = "clip-vit"
    # branch name -> (C, H, W) of the ground-truth feature maps
    feature_dims: Tuple[Tuple[str, Tuple[int, int, int]], ...] = ()
    similarity_method: str = "pairwise"
    sh_degree: int = 0  # reference registers rade-features with sh_degree=0

    def feature_dims_dict(self) -> Dict[str, Tuple[int, int, int]]:
        return dict(self.feature_dims)


def init_feature_params(
    key: jax.Array,
    params: GaussianParams,
    config: RadeFeaturesConfig,
) -> GaussianParams:
    """Add zero-initialized per-Gaussian latents + the decoder subtree
    (reference __init__, rade_features_model.py:90-108)."""
    out = dict(params)
    capacity = params["means"].shape[0]
    out["distill_features"] = jnp.zeros(
        (capacity, config.latent_dim), jnp.float32
    )
    out["decoder"] = decoder_lib.init_decoder(
        key, config.latent_dim, config.mlp_hidden_dim,
        config.feature_dims_dict(),
    )
    return out


def get_outputs(
    params: GaussianParams,
    alive: jax.Array,
    camera: Camera,
    step,
    config: RadeFeaturesConfig,
    rng: Optional[jax.Array] = None,
    training: bool = True,
    compute_error_maps: bool = False,
    absgrad_sink: Optional[jax.Array] = None,
) -> Tuple[Dict[str, jax.Array], RenderMeta]:
    """Forward pass; identical to RaDe-GS plus the fused latent channels
    (the base get_outputs already concatenates ``distill_features`` when
    ``latent_dim > 0``)."""
    return rade_gs.get_outputs(
        params, alive, camera, step, config, rng=rng, training=training,
        compute_error_maps=compute_error_maps, absgrad_sink=absgrad_sink,
    )


def get_loss(
    outputs: Dict[str, jax.Array],
    image: jax.Array,
    features_gt: Dict[str, jax.Array],
    params: GaussianParams,
    alive: jax.Array,
    step,
    config: RadeFeaturesConfig,
    reg_active: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """RaDe-GS losses + weighted cosine feature distillation
    (rade_features_model.py:545-584).

    Args:
        features_gt: branch name -> [C, H, W] ground-truth feature maps from
            the feature datamanager.
    """
    total, loss_dict = rade_gs.get_loss(
        outputs, image, params, alive, step, config, reg_active=reg_active
    )
    decoded = decoder_lib.decode_rendered_features(
        params["decoder"], outputs["features"], config.feature_dims_dict(),
        config.main_feature_name,
    )
    feat_loss = jnp.zeros(())
    for name, pred in decoded.items():
        weight = (
            1.0 if name == config.main_feature_name
            else config.features_regularization_lambda
        )
        feat_loss = feat_loss + weight * losses.cosine_distillation_loss(
            pred, features_gt[name]
        )
    loss_dict["features_loss"] = feat_loss * config.features_loss_lambda
    return total + loss_dict["features_loss"], loss_dict


def similarity_map(
    params: GaussianParams,
    outputs: Dict[str, jax.Array],
    text_embeddings: jax.Array,
    num_positive: int,
    config: RadeFeaturesConfig,
    resize_factor: float = 8.0,
) -> jax.Array:
    """Eval-time text-query similarity map upsampled to the RGB resolution
    (reference get_outputs_for_camera, rade_features_model.py:493-539)."""
    decoded = decoder_lib.decode_rendered_features(
        params["decoder"], outputs["features"], config.feature_dims_dict(),
        config.main_feature_name, resize_factor=resize_factor,
    )
    sim = compute_similarity(
        decoded[config.main_feature_name], text_embeddings, num_positive,
        method=config.similarity_method,
    )
    h, w = outputs["rgb"].shape[:2]
    if sim.shape[:2] != (h, w):
        sim = decoder_lib.resize_bilinear(sim, (h, w))
    return sim


def query_vertices(
    decoder_params,
    vertex_features: jax.Array,
    text_embeddings: jax.Array,
    num_positive: int,
    config: RadeFeaturesConfig,
) -> jax.Array:
    """Per-vertex similarity for mesh querying (Splatter.query_mesh,
    wrapper/splatter.py:502-565): decode per-vertex latents and score
    against text queries.  Returns [V] similarities in [0, 1]."""
    decoded = decoder_lib.decode(decoder_params, vertex_features)
    feats = decoded[config.main_feature_name]          # [V, C]
    sim = compute_similarity(
        feats.T[:, :, None], text_embeddings, num_positive,
        method=config.similarity_method,
    )
    return sim[:, 0, 0]
