#!/usr/bin/env python
"""Convert released torch checkpoints to the .npz layout used by
``collab_splats_tpu.features.vit`` / ``utils.lpips``.

This environment has no network egress, so this script is run wherever the
checkpoints are available and the resulting ``.npz`` files are dropped under
``weights/`` (see features/extractors.py for the expected filenames):

    python scripts/convert_weights.py dinov2 dinov2_vits14.pth weights/dinov2_vits14.npz
    python scripts/convert_weights.py clip   ViT-L-14-336px.pt weights/clip_vitl14_336.npz
    python scripts/convert_weights.py vgg16  vgg16.pth         weights/vgg16_lpips.npz [lpips_lins.pth]

Sources:
    * dinov2: ``torch.hub.load("facebookresearch/dinov2", "dinov2_vits14")``
      state_dict (reference loads this at utils/features.py:344-347).
    * clip: OpenAI CLIP "ViT-L/14@336px" state_dict (the reference's
      maskclip_onnx wraps the same checkpoint, utils/features.py:167-171).
    * vgg16: torchvision VGG16 ``features`` state_dict + (optionally) the
      ``lpips`` package's linear-head weights for the LPIPS metric.

The converters are pure state_dict -> dict-of-ndarray transforms, so they are
unit-testable offline with synthetically shaped state_dicts
(tests/test_weight_converters.py).  torch ``Linear.weight`` matrices are
transposed here so the JAX side computes ``x @ w + b`` directly.
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np


def _t(x) -> np.ndarray:
    a = np.asarray(x, dtype=np.float32)
    return a


def convert_dinov2(sd: Dict) -> Dict[str, np.ndarray]:
    """torchhub dinov2_vit{s,b,l}14 state_dict -> features.vit naming."""
    out: Dict[str, np.ndarray] = {}
    n_blocks = 1 + max(
        int(k.split(".")[1]) for k in sd if k.startswith("blocks.")
    )
    out["n_blocks"] = np.asarray(n_blocks)
    # conv patch embed [D, 3, P, P] -> [P*P*3, D] matching the row-major
    # (ph, P, pw, P, 3) -> (P, P, 3) patch flattening on the JAX side.
    w = _t(sd["patch_embed.proj.weight"])             # [D, 3, P, P]
    d = w.shape[0]
    out["patch_embed.w"] = w.transpose(2, 3, 1, 0).reshape(-1, d)
    out["patch_embed.b"] = _t(sd["patch_embed.proj.bias"])
    out["cls_token"] = _t(sd["cls_token"]).reshape(-1)
    out["pos_embed"] = _t(sd["pos_embed"]).reshape(-1, d)
    for i in range(n_blocks):
        src, dst = f"blocks.{i}", f"blocks.{i}"
        out[f"{dst}.ln1.scale"] = _t(sd[f"{src}.norm1.weight"])
        out[f"{dst}.ln1.bias"] = _t(sd[f"{src}.norm1.bias"])
        out[f"{dst}.ln2.scale"] = _t(sd[f"{src}.norm2.weight"])
        out[f"{dst}.ln2.bias"] = _t(sd[f"{src}.norm2.bias"])
        qkv_w = _t(sd[f"{src}.attn.qkv.weight"])       # [3D, D]
        qkv_b = _t(sd[f"{src}.attn.qkv.bias"])
        for j, nm in enumerate("qkv"):
            out[f"{dst}.attn.w{nm}"] = qkv_w[j * d:(j + 1) * d].T
            out[f"{dst}.attn.b{nm}"] = qkv_b[j * d:(j + 1) * d]
        out[f"{dst}.attn.wo"] = _t(sd[f"{src}.attn.proj.weight"]).T
        out[f"{dst}.attn.bo"] = _t(sd[f"{src}.attn.proj.bias"])
        out[f"{dst}.mlp.w1"] = _t(sd[f"{src}.mlp.fc1.weight"]).T
        out[f"{dst}.mlp.b1"] = _t(sd[f"{src}.mlp.fc1.bias"])
        out[f"{dst}.mlp.w2"] = _t(sd[f"{src}.mlp.fc2.weight"]).T
        out[f"{dst}.mlp.b2"] = _t(sd[f"{src}.mlp.fc2.bias"])
        out[f"{dst}.ls1"] = _t(sd[f"{src}.ls1.gamma"])
        out[f"{dst}.ls2"] = _t(sd[f"{src}.ls2.gamma"])
    out["norm.scale"] = _t(sd["norm.weight"])
    out["norm.bias"] = _t(sd["norm.bias"])
    return out


def _convert_clip_tower(sd: Dict, src_prefix: str, dst_prefix: str,
                        n_blocks: int, d: int) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    for i in range(n_blocks):
        src = f"{src_prefix}.resblocks.{i}"
        dst = f"{dst_prefix}.blocks.{i}"
        out[f"{dst}.ln1.scale"] = _t(sd[f"{src}.ln_1.weight"])
        out[f"{dst}.ln1.bias"] = _t(sd[f"{src}.ln_1.bias"])
        out[f"{dst}.ln2.scale"] = _t(sd[f"{src}.ln_2.weight"])
        out[f"{dst}.ln2.bias"] = _t(sd[f"{src}.ln_2.bias"])
        w = _t(sd[f"{src}.attn.in_proj_weight"])       # [3D, D]
        b = _t(sd[f"{src}.attn.in_proj_bias"])
        for j, nm in enumerate("qkv"):
            out[f"{dst}.attn.w{nm}"] = w[j * d:(j + 1) * d].T
            out[f"{dst}.attn.b{nm}"] = b[j * d:(j + 1) * d]
        out[f"{dst}.attn.wo"] = _t(sd[f"{src}.attn.out_proj.weight"]).T
        out[f"{dst}.attn.bo"] = _t(sd[f"{src}.attn.out_proj.bias"])
        out[f"{dst}.mlp.w1"] = _t(sd[f"{src}.mlp.c_fc.weight"]).T
        out[f"{dst}.mlp.b1"] = _t(sd[f"{src}.mlp.c_fc.bias"])
        out[f"{dst}.mlp.w2"] = _t(sd[f"{src}.mlp.c_proj.weight"]).T
        out[f"{dst}.mlp.b2"] = _t(sd[f"{src}.mlp.c_proj.bias"])
    return out


def convert_clip(sd: Dict) -> Dict[str, np.ndarray]:
    """OpenAI CLIP (ViT) full state_dict -> visual + text .npz naming."""
    out: Dict[str, np.ndarray] = {}
    # ---- visual tower
    w = _t(sd["visual.conv1.weight"])                  # [D, 3, P, P], no bias
    d = w.shape[0]
    out["visual.patch_embed.w"] = w.transpose(2, 3, 1, 0).reshape(-1, d)
    out["visual.class_embedding"] = _t(sd["visual.class_embedding"]).reshape(-1)
    out["visual.pos_embed"] = _t(sd["visual.positional_embedding"])
    out["visual.ln_pre.scale"] = _t(sd["visual.ln_pre.weight"])
    out["visual.ln_pre.bias"] = _t(sd["visual.ln_pre.bias"])
    n_vis = 1 + max(
        int(k.split(".")[3]) for k in sd
        if k.startswith("visual.transformer.resblocks.")
    )
    out["visual.n_blocks"] = np.asarray(n_vis)
    out.update(_convert_clip_tower(sd, "visual.transformer", "visual", n_vis, d))
    out["visual.ln_post.scale"] = _t(sd["visual.ln_post.weight"])
    out["visual.ln_post.bias"] = _t(sd["visual.ln_post.bias"])
    out["visual.proj"] = _t(sd["visual.proj"])         # already [D, E]
    # ---- text tower
    dt = _t(sd["ln_final.weight"]).shape[0]
    n_txt = 1 + max(
        int(k.split(".")[2]) for k in sd
        if k.startswith("transformer.resblocks.")
    )
    out["text.n_blocks"] = np.asarray(n_txt)
    out["text.token_embedding"] = _t(sd["token_embedding.weight"])
    out["text.pos_embed"] = _t(sd["positional_embedding"])
    out.update(_convert_clip_tower(sd, "transformer", "text", n_txt, dt))
    out["text.ln_final.scale"] = _t(sd["ln_final.weight"])
    out["text.ln_final.bias"] = _t(sd["ln_final.bias"])
    out["text.proj"] = _t(sd["text_projection"])       # [D, E]
    return out


# VGG16 conv layers (torchvision ``features`` indices) grouped into the five
# LPIPS stages (after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3).
VGG16_CONV_IDX = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
VGG16_STAGE_ENDS = (1, 3, 6, 9, 12)  # conv index (into the list) ending each stage


def convert_vgg16(sd: Dict, lpips_sd: Dict | None = None) -> Dict[str, np.ndarray]:
    """torchvision VGG16 ``features`` state_dict -> lpips .npz naming.

    Conv weights stay [out, in, kh, kw] (applied with lax.conv on the JAX
    side).  If ``lpips_sd`` (the lpips package's ``lins`` state_dict, keys
    ``lin{i}.model.1.weight`` [1, C, 1, 1]) is given, the learned LPIPS
    channel weights ride along; otherwise uniform weights are exported.
    """
    out: Dict[str, np.ndarray] = {}
    for j, idx in enumerate(VGG16_CONV_IDX):
        key = f"features.{idx}.weight" if f"features.{idx}.weight" in sd \
            else f"{idx}.weight"
        bkey = key.replace("weight", "bias")
        out[f"conv{j}.w"] = _t(sd[key])
        out[f"conv{j}.b"] = _t(sd[bkey])
    chans = [out[f"conv{j}.w"].shape[0] for j in VGG16_STAGE_ENDS]
    for i, c in enumerate(chans):
        if lpips_sd is not None:
            lin = _t(lpips_sd[f"lin{i}.model.1.weight"]).reshape(-1)
        else:
            lin = np.full((c,), 1.0 / c, np.float32)
        out[f"lin{i}"] = lin
    return out


def main():
    # vgg16 takes an optional 4th arg: the lpips package's ``lins``
    # state_dict (learned per-channel LPIPS weights); without it the
    # export falls back to uniform 1/C weights and the metric is a
    # VGG-feature distance, not true LPIPS.
    if len(sys.argv) not in (4, 5) or (len(sys.argv) == 5
                                       and sys.argv[1] != "vgg16"):
        print(__doc__)
        sys.exit(1)
    kind, src, dst = sys.argv[1:4]
    lpips_src = sys.argv[4] if len(sys.argv) == 5 else None
    import torch

    sd = torch.load(src, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    if kind == "dinov2":
        out = convert_dinov2(sd)
    elif kind == "clip":
        out = convert_clip(sd)
    elif kind == "vgg16":
        lpips_sd = None
        if lpips_src is not None:
            lpips_sd = torch.load(lpips_src, map_location="cpu")
            if hasattr(lpips_sd, "state_dict"):
                lpips_sd = lpips_sd.state_dict()
            lpips_sd = {k: v.float().numpy() if hasattr(v, "numpy") else v
                        for k, v in lpips_sd.items()}
        out = convert_vgg16(sd, lpips_sd)
    else:
        raise SystemExit(f"unknown kind {kind!r}")
    np.savez_compressed(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays")


if __name__ == "__main__":
    main()
