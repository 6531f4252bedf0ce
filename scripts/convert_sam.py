#!/usr/bin/env python
"""Convert a Segment-Anything checkpoint to the .npz layout used by
``collab_splats_tpu.features.sam``.

    python scripts/convert_sam.py sam_vit_b_01ec64.pth weights/sam_vit_b.npz

Works for the official facebookresearch/segment-anything ViT-B/L/H
checkpoints; MobileSAM checkpoints share the prompt-encoder / mask-decoder
naming (only their distilled image encoder differs — those load with
``--decoder-only`` and pair with any [256,64,64] embedding producer).

Pure state_dict -> ndarray-dict transform; unit-tested offline against
synthetically shaped state_dicts (tests/test_sam.py).
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np


def _t(x):
    return np.asarray(x, np.float32)


# Per-checkpoint encoder hyperparameters (segment_anything/build_sam.py).
ENCODER_CFG = {
    768: {"num_heads": 12, "global_blocks": [2, 5, 8, 11]},    # ViT-B
    1024: {"num_heads": 16, "global_blocks": [5, 11, 17, 23]},  # ViT-L
    1280: {"num_heads": 16, "global_blocks": [7, 15, 23, 31]},  # ViT-H
}


def convert_sam_encoder(sd: Dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    w = _t(sd["image_encoder.patch_embed.proj.weight"])   # [D, 3, 16, 16]
    d = w.shape[0]
    cfg = ENCODER_CFG[d]
    out["enc.patch_embed.w"] = w.transpose(2, 3, 1, 0).reshape(-1, d)
    out["enc.patch_embed.b"] = _t(sd["image_encoder.patch_embed.proj.bias"])
    out["enc.pos_embed"] = _t(sd["image_encoder.pos_embed"])[0]
    n_blocks = 1 + max(
        int(k.split(".")[2]) for k in sd
        if k.startswith("image_encoder.blocks.")
    )
    out["enc.n_blocks"] = np.asarray(n_blocks)
    out["enc.window"] = np.asarray(14)
    out["enc.num_heads"] = np.asarray(cfg["num_heads"])
    out["enc.global_blocks"] = np.asarray(cfg["global_blocks"])
    for i in range(n_blocks):
        src = f"image_encoder.blocks.{i}"
        dst = f"enc.blocks.{i}"
        out[f"{dst}.ln1.scale"] = _t(sd[f"{src}.norm1.weight"])
        out[f"{dst}.ln1.bias"] = _t(sd[f"{src}.norm1.bias"])
        out[f"{dst}.ln2.scale"] = _t(sd[f"{src}.norm2.weight"])
        out[f"{dst}.ln2.bias"] = _t(sd[f"{src}.norm2.bias"])
        out[f"{dst}.attn.qkv.w"] = _t(sd[f"{src}.attn.qkv.weight"]).T
        out[f"{dst}.attn.qkv.b"] = _t(sd[f"{src}.attn.qkv.bias"])
        out[f"{dst}.attn.proj.w"] = _t(sd[f"{src}.attn.proj.weight"]).T
        out[f"{dst}.attn.proj.b"] = _t(sd[f"{src}.attn.proj.bias"])
        out[f"{dst}.attn.rel_pos_h"] = _t(sd[f"{src}.attn.rel_pos_h"])
        out[f"{dst}.attn.rel_pos_w"] = _t(sd[f"{src}.attn.rel_pos_w"])
        out[f"{dst}.mlp.w1"] = _t(sd[f"{src}.mlp.lin1.weight"]).T
        out[f"{dst}.mlp.b1"] = _t(sd[f"{src}.mlp.lin1.bias"])
        out[f"{dst}.mlp.w2"] = _t(sd[f"{src}.mlp.lin2.weight"]).T
        out[f"{dst}.mlp.b2"] = _t(sd[f"{src}.mlp.lin2.bias"])
    # Neck convs: 1x1 [256, D, 1, 1] -> dense [D, 256]; 3x3 stays HWIO.
    out["enc.neck.conv1.w"] = _t(sd["image_encoder.neck.0.weight"])[
        :, :, 0, 0
    ].T
    out["enc.neck.ln1.scale"] = _t(sd["image_encoder.neck.1.weight"])
    out["enc.neck.ln1.bias"] = _t(sd["image_encoder.neck.1.bias"])
    out["enc.neck.conv2.w"] = _t(sd["image_encoder.neck.2.weight"]).transpose(
        2, 3, 1, 0
    )
    out["enc.neck.ln2.scale"] = _t(sd["image_encoder.neck.3.weight"])
    out["enc.neck.ln2.bias"] = _t(sd["image_encoder.neck.3.bias"])
    return out


def convert_sam_prompt_decoder(sd: Dict) -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    # ---- prompt encoder
    out["prompt.pe_gauss"] = _t(
        sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"]
    )
    for i in range(4):
        out[f"prompt.point_embed.{i}"] = _t(
            sd[f"prompt_encoder.point_embeddings.{i}.weight"]
        )[0]
    out["prompt.not_a_point"] = _t(
        sd["prompt_encoder.not_a_point_embed.weight"]
    )[0]
    out["prompt.no_mask"] = _t(sd["prompt_encoder.no_mask_embed.weight"])[0]
    # ---- mask decoder
    out["dec.iou_token"] = _t(sd["mask_decoder.iou_token.weight"])[0]
    out["dec.mask_tokens"] = _t(sd["mask_decoder.mask_tokens.weight"])
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in sd
        if k.startswith("mask_decoder.transformer.layers.")
    )
    out["dec.n_layers"] = np.asarray(n_layers)
    out["dec.num_heads"] = np.asarray(8)

    def attn(dst, src):
        for ours, theirs in (("q", "q_proj"), ("k", "k_proj"),
                             ("v", "v_proj"), ("out", "out_proj")):
            out[f"{dst}.{ours}.w"] = _t(sd[f"{src}.{theirs}.weight"]).T
            out[f"{dst}.{ours}.b"] = _t(sd[f"{src}.{theirs}.bias"])

    for i in range(n_layers):
        src = f"mask_decoder.transformer.layers.{i}"
        dst = f"dec.layers.{i}"
        attn(f"{dst}.self_attn", f"{src}.self_attn")
        attn(f"{dst}.cross_t2i", f"{src}.cross_attn_token_to_image")
        attn(f"{dst}.cross_i2t", f"{src}.cross_attn_image_to_token")
        for j in (1, 2, 3, 4):
            out[f"{dst}.ln{j}.scale"] = _t(sd[f"{src}.norm{j}.weight"])
            out[f"{dst}.ln{j}.bias"] = _t(sd[f"{src}.norm{j}.bias"])
        out[f"{dst}.mlp.w1"] = _t(sd[f"{src}.mlp.lin1.weight"]).T
        out[f"{dst}.mlp.b1"] = _t(sd[f"{src}.mlp.lin1.bias"])
        out[f"{dst}.mlp.w2"] = _t(sd[f"{src}.mlp.lin2.weight"]).T
        out[f"{dst}.mlp.b2"] = _t(sd[f"{src}.mlp.lin2.bias"])
    attn("dec.final_attn", "mask_decoder.transformer.final_attn_token_to_image")
    out["dec.ln_final.scale"] = _t(
        sd["mask_decoder.transformer.norm_final_attn.weight"]
    )
    out["dec.ln_final.bias"] = _t(
        sd["mask_decoder.transformer.norm_final_attn.bias"]
    )
    # Output upscaling convT: torch weight [in, out, 2, 2] -> the HWIO
    # layout of the *forward* conv it transposes ([2, 2, out, in]), applied
    # with lax.conv_transpose(transpose_kernel=True) for exact torch parity.
    out["dec.up1.w"] = _t(sd["mask_decoder.output_upscaling.0.weight"]).transpose(
        2, 3, 1, 0
    )
    out["dec.up1.b"] = _t(sd["mask_decoder.output_upscaling.0.bias"])
    out["dec.up_ln.scale"] = _t(sd["mask_decoder.output_upscaling.1.weight"])
    out["dec.up_ln.bias"] = _t(sd["mask_decoder.output_upscaling.1.bias"])
    out["dec.up2.w"] = _t(sd["mask_decoder.output_upscaling.3.weight"]).transpose(
        2, 3, 1, 0
    )
    out["dec.up2.b"] = _t(sd["mask_decoder.output_upscaling.3.bias"])
    n_mask = out["dec.mask_tokens"].shape[0]
    for j in range(n_mask):
        for li in range(3):
            out[f"dec.hyper.{j}.w{li}"] = _t(
                sd[f"mask_decoder.output_hypernetworks_mlps.{j}.layers.{li}.weight"]
            ).T
            out[f"dec.hyper.{j}.b{li}"] = _t(
                sd[f"mask_decoder.output_hypernetworks_mlps.{j}.layers.{li}.bias"]
            )
    for li in range(3):
        out[f"dec.iou_head.w{li}"] = _t(
            sd[f"mask_decoder.iou_prediction_head.layers.{li}.weight"]
        ).T
        out[f"dec.iou_head.b{li}"] = _t(
            sd[f"mask_decoder.iou_prediction_head.layers.{li}.bias"]
        )
    return out


def convert_sam(sd: Dict, decoder_only: bool = False) -> Dict[str, np.ndarray]:
    out = convert_sam_prompt_decoder(sd)
    if not decoder_only:
        out.update(convert_sam_encoder(sd))
    return out


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    decoder_only = "--decoder-only" in sys.argv
    if len(args) != 2:
        print(__doc__)
        sys.exit(1)
    src, dst = args
    import torch

    sd = torch.load(src, map_location="cpu")
    if "state_dict" in sd:
        sd = sd["state_dict"]
    sd = {k: v.float().numpy() if hasattr(v, "numpy") else v
          for k, v in sd.items()}
    out = convert_sam(sd, decoder_only=decoder_only)
    np.savez_compressed(dst, **out)
    print(f"wrote {dst}: {len(out)} arrays")


if __name__ == "__main__":
    main()
