"""KNN transfer of per-Gaussian attributes (features / normals / colors) to
mesh vertices.

Behavioral equivalent of the reference ``features2vertex``
(utils/mesh.py:157-219): for each mesh vertex, inverse-distance-weighted
average of the k nearest Gaussians' attributes.  Implemented as a chunked
brute-force top-k in JAX — dense [chunk, N] distance matrices map straight
onto the TPU (the scipy cKDTree the reference leans on has no accelerator
analogue, and at N ~ 1M x V ~ 500k a fused matmul-shaped sweep is fast).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def knn_weighted_transfer(
    query_points: jax.Array,
    source_points: jax.Array,
    source_values: jax.Array,
    k: int = 5,
    sigma: float | None = None,
    chunk: int = 4096,
) -> jax.Array:
    """Transfer ``source_values`` [N, C] to ``query_points`` [V, 3].

    Weights are inverse-distance (1 / (d + eps)) over the k nearest sources
    (matching features2vertex's weighting), or Gaussian RBF when ``sigma``
    is given.

    Returns [V, C].
    """
    k = min(k, source_points.shape[0])
    v = query_points.shape[0]
    n_chunks = -(-v // chunk)
    pad = n_chunks * chunk - v
    q = jnp.pad(query_points, ((0, pad), (0, 0)))

    sp = source_points
    sv = source_values

    def body(q_chunk):
        d2 = jnp.sum(
            (q_chunk[:, None, :] - sp[None, :, :]) ** 2, axis=-1
        )                                               # [chunk, N]
        neg_d2, idx = jax.lax.top_k(-d2, k)
        d = jnp.sqrt(jnp.clip(-neg_d2, 0.0, None))
        if sigma is None:
            w = 1.0 / (d + 1e-8)
        else:
            w = jnp.exp(-(d**2) / (2.0 * sigma**2))
        w = w / jnp.clip(jnp.sum(w, -1, keepdims=True), 1e-12, None)
        vals = sv[idx]                                  # [chunk, k, C]
        return jnp.einsum("vk,vkc->vc", w, vals)

    out = jax.lax.map(body, q.reshape(n_chunks, chunk, 3))
    return out.reshape(-1, out.shape[-1])[:v]
