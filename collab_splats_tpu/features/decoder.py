"""Two-layer feature decoder: shared hidden layer + per-branch heads.

Behavioral equivalent of the reference ``TwoLayerMLP``
(/root/reference/collab_splats/utils/features.py:408-478): a 1x1-conv MLP
decoding the 13-dim rasterized latent into each ANN feature space
(CLIP / DINOv2).  As pure ``jnp`` matmuls over [..., C] arrays the "conv"
and "per-gaussian" paths are literally the same function — and both land on
the MXU.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

DecoderParams = Dict[str, jax.Array]


def init_decoder(
    key: jax.Array,
    input_dim: int,
    hidden_dim: int,
    feature_dims: Dict[str, Tuple[int, ...]],
) -> DecoderParams:
    """Initialize decoder parameters.

    Args:
        feature_dims: branch name -> (C, H, W) shapes; only C is used
            (matching the reference constructor contract,
            features.py:420-442).
    """
    keys = jax.random.split(key, 2 * (1 + len(feature_dims)))
    he = lambda k, fan_in, shape: jax.random.normal(k, shape) * jnp.sqrt(
        2.0 / fan_in
    )
    # Nonzero uniform bias init (torch Conv2d default): with zero-initialized
    # latents the hidden pre-activations would otherwise sit exactly at 0,
    # where ReLU kills the gradient into the latents.
    unif = lambda k, fan_in, shape: jax.random.uniform(
        k, shape, minval=-1.0, maxval=1.0
    ) / jnp.sqrt(fan_in)
    params: DecoderParams = {
        "hidden_w": he(keys[0], input_dim, (input_dim, hidden_dim)),
        "hidden_b": unif(keys[1], input_dim, (hidden_dim,)),
    }
    for i, (name, shape) in enumerate(sorted(feature_dims.items())):
        c_out = shape[0]
        params[f"branch_{name}_w"] = he(
            keys[2 + 2 * i], hidden_dim, (hidden_dim, c_out)
        )
        params[f"branch_{name}_b"] = unif(keys[3 + 2 * i], hidden_dim, (c_out,))
    return params


def branch_names(params: DecoderParams):
    return sorted(
        k[len("branch_"):-2] for k in params
        if k.startswith("branch_") and k.endswith("_w")
    )


def decode(params: DecoderParams, x: jax.Array) -> Dict[str, jax.Array]:
    """Decode latents [..., C_in] to {branch: [..., C_out]}.

    Works for per-pixel maps ([H, W, C]) and per-Gaussian/per-vertex arrays
    ([N, C]) alike — the reference needed a separate
    ``per_gaussian_forward`` (features.py:457-478) only because of its conv
    layout.
    """
    h = jax.nn.relu(x @ params["hidden_w"] + params["hidden_b"])
    return {
        name: h @ params[f"branch_{name}_w"] + params[f"branch_{name}_b"]
        for name in branch_names(params)
    }


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear resize of [H, W, C] to (H', W'), half-pixel centers
    (torch ``align_corners=False`` semantics)."""
    return jax.image.resize(x, (size[0], size[1], x.shape[-1]), method="linear")


def decode_rendered_features(
    params: DecoderParams,
    features_hw: jax.Array,
    feature_dims: Dict[str, Tuple[int, ...]],
    main_name: str,
    resize_factor: float = 1.0,
) -> Dict[str, jax.Array]:
    """Reference ``decode_features`` (rade_features_model.py:149-189):
    upsample the rendered latent map to the main branch's (scaled) feature
    resolution, decode all branches, and resize non-main branches to their
    native dims.  Returns [C, H, W]-layout maps like the reference."""
    main_c, main_h, main_w = feature_dims[main_name]
    target = (int(main_h * resize_factor), int(main_w * resize_factor))
    lat = resize_bilinear(features_hw, target)
    decoded = decode(params, lat)
    out = {}
    for name, dims in feature_dims.items():
        m = decoded[name]
        if name != main_name:
            m = resize_bilinear(m, (dims[1], dims[2]))
        out[name] = jnp.transpose(m, (2, 0, 1))
    return out
