"""Faithful ViT towers for DINOv2 and (Mask)CLIP in functional JAX.

These mirror the released checkpoints the reference loads at runtime
(/root/reference/collab_splats/utils/features.py:167-171 loads
``maskclip_onnx`` CLIP "ViT-L/14@336px"; :344-347 loads torchhub
``dinov2_vits14``), so that converted ``.npz`` weights (see
``scripts/convert_weights.py``) drop in exactly:

* **DINOv2**: patch embed (14x14 conv), CLS token, learned positional
  embeddings with bicubic interpolation to the input grid, pre-norm blocks
  with **LayerScale**, final LayerNorm; output = ``x_norm_patchtokens``.
* **CLIP visual**: patch embed conv (no bias), class embedding, positional
  embedding, ``ln_pre``, pre-norm blocks (QuickGELU), and the **MaskCLIP
  patch head**: in the final block attention is replaced by the per-token
  value path ``out_proj(v_proj(ln_1(x)))`` (MaskCLIP, Zhou et al. 2022),
  then MLP residual, ``ln_post`` and the visual projection — dense
  patch-level CLIP embeddings aligned with the text tower.
* **CLIP text**: token embedding, positional embedding, causal pre-norm
  blocks, ``ln_final``, take features at the argmax (EOT) token, project.

All functions are pure ``params dict -> array`` JAX; params use the
converter's flattened naming (see each ``init_*`` for the exact keys).
Weights are stored/applied so that ``x @ w + b`` works directly (torch
``Linear.weight`` is transposed by the converter, not here).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]


def layer_norm(x, scale, bias, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def attention(x, p, prefix, num_heads, causal=False):
    """Standard multi-head self-attention over tokens [T, D].

    Weight layout: ``{prefix}.{wq,wk,wv,wo}`` [D, D] + ``{prefix}.{bq,bk,bv,bo}``.
    """
    t, d = x.shape
    hd = d // num_heads
    q = (x @ p[f"{prefix}.wq"] + p[f"{prefix}.bq"]).reshape(t, num_heads, hd)
    k = (x @ p[f"{prefix}.wk"] + p[f"{prefix}.bk"]).reshape(t, num_heads, hd)
    v = (x @ p[f"{prefix}.wv"] + p[f"{prefix}.bv"]).reshape(t, num_heads, hd)
    att = jnp.einsum("qhd,khd->hqk", q, k) / np.sqrt(hd)
    if causal:
        mask = jnp.tril(jnp.ones((t, t), bool))
        att = jnp.where(mask[None], att, -jnp.inf)
    att = jax.nn.softmax(att, axis=-1)
    o = jnp.einsum("hqk,khd->qhd", att, v).reshape(t, d)
    return o @ p[f"{prefix}.wo"] + p[f"{prefix}.bo"]


def quick_gelu(x):
    """CLIP's activation: x * sigmoid(1.702 x)."""
    return x * jax.nn.sigmoid(1.702 * x)


# ------------------------------------------------------------------ DINOv2


def dinov2_block(x, p, i, num_heads):
    pre = f"blocks.{i}"
    h = layer_norm(x, p[f"{pre}.ln1.scale"], p[f"{pre}.ln1.bias"])
    h = attention(h, p, f"{pre}.attn", num_heads)
    x = x + p[f"{pre}.ls1"] * h                       # LayerScale gamma_1
    h = layer_norm(x, p[f"{pre}.ln2.scale"], p[f"{pre}.ln2.bias"])
    h = jax.nn.gelu(h @ p[f"{pre}.mlp.w1"] + p[f"{pre}.mlp.b1"], approximate=False)
    h = h @ p[f"{pre}.mlp.w2"] + p[f"{pre}.mlp.b2"]
    return x + p[f"{pre}.ls2"] * h                    # LayerScale gamma_2


def _torch_bicubic_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix reproducing
    ``torch.nn.functional.interpolate(mode="bicubic",
    align_corners=False)``: Keys cubic kernel with a=-0.75 (NOT the
    a=-0.5 used by jax.image.resize's "cubic") and border-replicate
    index clamping."""
    a = -0.75
    scale = n_in / n_out
    w = np.zeros((n_out, n_in), np.float64)
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        base = int(np.floor(x))
        t = x - base
        for k in range(-1, 3):
            d = abs(k - t)
            if d <= 1.0:
                wk = ((a + 2) * d - (a + 3)) * d * d + 1
            elif d < 2.0:
                wk = (((d - 5) * d + 8) * d - 4) * a
            else:
                wk = 0.0
            w[i, np.clip(base + k, 0, n_in - 1)] += wk
    return w.astype(np.float32)


def interpolate_pos_embed(pos: jax.Array, grid_hw: Tuple[int, int]) -> jax.Array:
    """Resize the [1 + g*g, D] learned positional table to an (h, w) patch
    grid with torch-parity bicubic interpolation (DINOv2 / MaskCLIP call
    ``F.interpolate(mode="bicubic")``; matching the released models needs
    the same a=-0.75 kernel, which jax.image.resize does not expose)."""
    h, w = grid_hw
    cls_pos, patch_pos = pos[:1], pos[1:]
    g = int(round(np.sqrt(patch_pos.shape[0])))
    if (h, w) != (g, g):
        grid = patch_pos.reshape(g, g, -1)
        wh = jnp.asarray(_torch_bicubic_matrix(g, h))
        ww = jnp.asarray(_torch_bicubic_matrix(g, w))
        grid = jnp.einsum("hg,gkd,wk->hwd", wh, grid, ww)
        patch_pos = grid.reshape(h * w, -1)
    return jnp.concatenate([cls_pos, patch_pos], axis=0)


def dinov2_forward(params: Params, image: jax.Array, num_heads: int,
                   patch_size: int) -> jax.Array:
    """DINOv2 ``forward_features(...)["x_norm_patchtokens"]``.

    Args:
        image: [H, W, 3] normalized image, H and W multiples of patch_size.

    Returns:
        [h*w, D] normalized patch tokens (h = H // patch_size).
    """
    hh, ww, _ = image.shape
    h, w = hh // patch_size, ww // patch_size
    patches = image.reshape(h, patch_size, w, patch_size, 3)
    patches = patches.transpose(0, 2, 1, 3, 4).reshape(h * w, -1)
    x = patches @ params["patch_embed.w"] + params["patch_embed.b"]
    x = jnp.concatenate([params["cls_token"][None], x], axis=0)
    x = x + interpolate_pos_embed(params["pos_embed"], (h, w))
    n_blocks = int(params["n_blocks"])
    for i in range(n_blocks):
        x = dinov2_block(x, params, i, num_heads)
    x = layer_norm(x, params["norm.scale"], params["norm.bias"])
    return x[1:]


def init_dinov2_params(key, dim=384, n_blocks=12, patch_size=14,
                       mlp_ratio=4, grid=37) -> Params:
    """Random params with the exact released-checkpoint shapes
    (dinov2_vits14: dim 384, 12 blocks, 6 heads, 37x37 training grid)."""
    p: Params = {"n_blocks": jnp.asarray(n_blocks)}
    keys = iter(jax.random.split(key, n_blocks * 8 + 8))
    sc = 1.0 / np.sqrt(dim)
    p["patch_embed.w"] = jax.random.normal(next(keys), (patch_size**2 * 3, dim)) * sc
    p["patch_embed.b"] = jnp.zeros(dim)
    p["cls_token"] = jax.random.normal(next(keys), (dim,)) * 0.02
    p["pos_embed"] = jax.random.normal(next(keys), (1 + grid * grid, dim)) * 0.02
    for i in range(n_blocks):
        pre = f"blocks.{i}"
        p[f"{pre}.ln1.scale"] = jnp.ones(dim)
        p[f"{pre}.ln1.bias"] = jnp.zeros(dim)
        p[f"{pre}.ln2.scale"] = jnp.ones(dim)
        p[f"{pre}.ln2.bias"] = jnp.zeros(dim)
        for nm in "qkvo":
            p[f"{pre}.attn.w{nm}"] = jax.random.normal(next(keys), (dim, dim)) * sc
            p[f"{pre}.attn.b{nm}"] = jnp.zeros(dim)
        p[f"{pre}.mlp.w1"] = jax.random.normal(next(keys), (dim, dim * mlp_ratio)) * sc
        p[f"{pre}.mlp.b1"] = jnp.zeros(dim * mlp_ratio)
        p[f"{pre}.mlp.w2"] = jax.random.normal(next(keys), (dim * mlp_ratio, dim)) * sc
        p[f"{pre}.mlp.b2"] = jnp.zeros(dim)
        p[f"{pre}.ls1"] = jnp.full((dim,), 1e-5)
        p[f"{pre}.ls2"] = jnp.full((dim,), 1e-5)
    p["norm.scale"] = jnp.ones(dim)
    p["norm.bias"] = jnp.zeros(dim)
    return p


# ------------------------------------------------------------- CLIP visual


def clip_block(x, p, i, num_heads):
    pre = f"visual.blocks.{i}"
    h = layer_norm(x, p[f"{pre}.ln1.scale"], p[f"{pre}.ln1.bias"], eps=1e-5)
    x = x + attention(h, p, f"{pre}.attn", num_heads)
    h = layer_norm(x, p[f"{pre}.ln2.scale"], p[f"{pre}.ln2.bias"], eps=1e-5)
    h = quick_gelu(h @ p[f"{pre}.mlp.w1"] + p[f"{pre}.mlp.b1"])
    return x + h @ p[f"{pre}.mlp.w2"] + p[f"{pre}.mlp.b2"]


def maskclip_forward(params: Params, image: jax.Array, num_heads: int,
                     patch_size: int) -> jax.Array:
    """Dense patch-level CLIP embeddings (MaskCLIP value-path head).

    Standard CLIP visual tower through blocks [0, L-1); the final block's
    attention is replaced by the per-token value path
    ``x + out_proj(v_proj(ln_1(x)))`` (its MLP residual is kept), then
    ``ln_post`` and the visual projection map every *patch token* into the
    joint image/text embedding space.

    Returns [h*w, E] patch embeddings (E = shared embed dim).
    """
    hh, ww, _ = image.shape
    h, w = hh // patch_size, ww // patch_size
    patches = image.reshape(h, patch_size, w, patch_size, 3)
    patches = patches.transpose(0, 2, 1, 3, 4).reshape(h * w, -1)
    x = patches @ params["visual.patch_embed.w"]       # conv1 has no bias
    cls = params["visual.class_embedding"][None]
    x = jnp.concatenate([cls, x], axis=0)
    x = x + interpolate_pos_embed(params["visual.pos_embed"], (h, w))
    x = layer_norm(x, params["visual.ln_pre.scale"], params["visual.ln_pre.bias"],
                   eps=1e-5)
    n_blocks = int(params["visual.n_blocks"])
    for i in range(n_blocks - 1):
        x = clip_block(x, params, i, num_heads)
    # MaskCLIP head on the last block.
    pre = f"visual.blocks.{n_blocks - 1}"
    hln = layer_norm(x, params[f"{pre}.ln1.scale"],
                     params[f"{pre}.ln1.bias"], eps=1e-5)
    v = hln @ params[f"{pre}.attn.wv"] + params[f"{pre}.attn.bv"]
    x = x + (v @ params[f"{pre}.attn.wo"] + params[f"{pre}.attn.bo"])
    hln = layer_norm(x, params[f"{pre}.ln2.scale"], params[f"{pre}.ln2.bias"],
                     eps=1e-5)
    hln = quick_gelu(hln @ params[f"{pre}.mlp.w1"] + params[f"{pre}.mlp.b1"])
    x = x + hln @ params[f"{pre}.mlp.w2"] + params[f"{pre}.mlp.b2"]
    x = layer_norm(x, params["visual.ln_post.scale"], params["visual.ln_post.bias"],
                   eps=1e-5)
    return (x @ params["visual.proj"])[1:]             # drop CLS


def init_clip_visual_params(key, dim=1024, n_blocks=24, patch_size=14,
                            embed_dim=768, grid=24) -> Params:
    """Random params with ViT-L/14@336px shapes (dim 1024, 24 blocks,
    16 heads, 24x24 grid at 336px, joint embed 768)."""
    p: Params = {"visual.n_blocks": jnp.asarray(n_blocks)}
    keys = iter(jax.random.split(key, n_blocks * 8 + 8))
    sc = 1.0 / np.sqrt(dim)
    p["visual.patch_embed.w"] = (
        jax.random.normal(next(keys), (patch_size**2 * 3, dim)) * sc
    )
    p["visual.class_embedding"] = jax.random.normal(next(keys), (dim,)) * 0.02
    p["visual.pos_embed"] = (
        jax.random.normal(next(keys), (1 + grid * grid, dim)) * 0.02
    )
    p["visual.ln_pre.scale"] = jnp.ones(dim)
    p["visual.ln_pre.bias"] = jnp.zeros(dim)
    for i in range(n_blocks):
        pre = f"visual.blocks.{i}"
        p[f"{pre}.ln1.scale"] = jnp.ones(dim)
        p[f"{pre}.ln1.bias"] = jnp.zeros(dim)
        p[f"{pre}.ln2.scale"] = jnp.ones(dim)
        p[f"{pre}.ln2.bias"] = jnp.zeros(dim)
        for nm in "qkvo":
            p[f"{pre}.attn.w{nm}"] = jax.random.normal(next(keys), (dim, dim)) * sc
            p[f"{pre}.attn.b{nm}"] = jnp.zeros(dim)
        p[f"{pre}.mlp.w1"] = jax.random.normal(next(keys), (dim, dim * 4)) * sc
        p[f"{pre}.mlp.b1"] = jnp.zeros(dim * 4)
        p[f"{pre}.mlp.w2"] = jax.random.normal(next(keys), (dim * 4, dim)) * sc
        p[f"{pre}.mlp.b2"] = jnp.zeros(dim)
    p["visual.ln_post.scale"] = jnp.ones(dim)
    p["visual.ln_post.bias"] = jnp.zeros(dim)
    p["visual.proj"] = jax.random.normal(next(keys), (dim, embed_dim)) * sc
    return p


# --------------------------------------------------------------- CLIP text


def clip_text_block(x, p, i, num_heads):
    pre = f"text.blocks.{i}"
    h = layer_norm(x, p[f"{pre}.ln1.scale"], p[f"{pre}.ln1.bias"], eps=1e-5)
    x = x + attention(h, p, f"{pre}.attn", num_heads, causal=True)
    h = layer_norm(x, p[f"{pre}.ln2.scale"], p[f"{pre}.ln2.bias"], eps=1e-5)
    h = quick_gelu(h @ p[f"{pre}.mlp.w1"] + p[f"{pre}.mlp.b1"])
    return x + h @ p[f"{pre}.mlp.w2"] + p[f"{pre}.mlp.b2"]


def clip_text_forward(params: Params, tokens: jax.Array, num_heads: int) -> jax.Array:
    """CLIP ``encode_text``: [T] int tokens -> [E] unnormalized embedding.

    Features are taken at the EOT position (argmax token id, as in CLIP —
    the EOT id is the largest in the vocabulary).
    """
    x = params["text.token_embedding"][tokens]
    x = x + params["text.pos_embed"][: tokens.shape[0]]
    n_blocks = int(params["text.n_blocks"])
    for i in range(n_blocks):
        x = clip_text_block(x, params, i, num_heads)
    x = layer_norm(x, params["text.ln_final.scale"], params["text.ln_final.bias"],
                   eps=1e-5)
    eot = jnp.argmax(tokens)
    return x[eot] @ params["text.proj"]


def init_clip_text_params(key, dim=768, n_blocks=12, vocab=49408,
                          context=77, embed_dim=768) -> Params:
    """Random params with ViT-L/14 text-tower shapes."""
    p: Params = {"text.n_blocks": jnp.asarray(n_blocks)}
    keys = iter(jax.random.split(key, n_blocks * 8 + 6))
    sc = 1.0 / np.sqrt(dim)
    p["text.token_embedding"] = jax.random.normal(next(keys), (vocab, dim)) * 0.02
    p["text.pos_embed"] = jax.random.normal(next(keys), (context, dim)) * 0.01
    for i in range(n_blocks):
        pre = f"text.blocks.{i}"
        p[f"{pre}.ln1.scale"] = jnp.ones(dim)
        p[f"{pre}.ln1.bias"] = jnp.zeros(dim)
        p[f"{pre}.ln2.scale"] = jnp.ones(dim)
        p[f"{pre}.ln2.bias"] = jnp.zeros(dim)
        for nm in "qkvo":
            p[f"{pre}.attn.w{nm}"] = jax.random.normal(next(keys), (dim, dim)) * sc
            p[f"{pre}.attn.b{nm}"] = jnp.zeros(dim)
        p[f"{pre}.mlp.w1"] = jax.random.normal(next(keys), (dim, dim * 4)) * sc
        p[f"{pre}.mlp.b1"] = jnp.zeros(dim * 4)
        p[f"{pre}.mlp.w2"] = jax.random.normal(next(keys), (dim * 4, dim)) * sc
        p[f"{pre}.mlp.b2"] = jnp.zeros(dim)
    p["text.ln_final.scale"] = jnp.ones(dim)
    p["text.ln_final.bias"] = jnp.zeros(dim)
    p["text.proj"] = jax.random.normal(next(keys), (dim, embed_dim)) * sc
    return p
