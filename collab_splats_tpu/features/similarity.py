"""Text-query similarity maps over decoded CLIP features.

Behavioral equivalent of ``MaskCLIPExtractor.compute_similarity``
(/root/reference/collab_splats/utils/features.py:237-325): raw cosine
similarities between per-pixel features and text embeddings, tempered
softmax over the query axis; "standard" sums positive probabilities,
"pairwise" plays the averaged positives against each negative and takes the
minimum win probability.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_similarity(
    features: jax.Array,
    text_embeddings: jax.Array,
    num_positive: int,
    softmax_temp: float = 0.05,
    method: str = "standard",
) -> jax.Array:
    """Similarity probability map.

    Args:
        features: [C, H, W] decoded feature map (reference layout).
        text_embeddings: [N, C] unit-normalized embeddings, positives first.
        num_positive: how many leading rows of ``text_embeddings`` are
            positive queries.
        softmax_temp: softmax temperature (reference default 0.05).
        method: "standard" | "pairwise".

    Returns:
        [H, W, 1] probability map.
    """
    c, h, w = features.shape
    raw = jnp.einsum("chw,nc->nhw", features, text_embeddings)
    raw = raw.reshape(raw.shape[0], -1)                      # [N, H*W]

    if method == "standard":
        probs = jax.nn.softmax(raw / softmax_temp, axis=0)
        sim = jnp.sum(probs[:num_positive], axis=0)
    elif method == "pairwise":
        pos = raw[:num_positive]
        neg = raw[num_positive:]
        avg_pos = jnp.mean(pos, axis=0, keepdims=True)       # [1, P]
        bro = jnp.broadcast_to(avg_pos, neg.shape)           # [Nn, P]
        paired = jnp.concatenate([bro, neg], axis=0)         # [2*Nn, P]
        probs = jax.nn.softmax(paired / softmax_temp, axis=0)
        pos_probs = probs[: neg.shape[0]]
        sim = jnp.nan_to_num(jnp.min(pos_probs, axis=0), nan=0.0)
    else:
        raise ValueError(f"Unknown method: {method}")
    return sim.reshape(h, w, 1)
