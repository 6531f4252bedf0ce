"""Stage-by-stage JAX-vs-torch comparison on RELEASED checkpoints.

Run by scripts/fetch_and_golden.sh in an egress-enabled environment after
the converters have produced weights/*.npz.  Computes the same feature
maps with (a) the official torch models (torch.hub / the reference's own
load sites) and (b) this repo's JAX towers, and compares at stage
checkpoints so a mismatch pinpoints the first diverging module:

    prep        the resize/normalize chain (also scripts/feature_goldens.py
                --prep-parity, which diffs against torch directly)
    patch_embed the conv/matmul patch embedding, computed from the raw
                state_dict on both sides (isolates converter layout bugs
                from architecture bugs)
    tower       final patch-token features per visual tower
    text        CLIP text embeddings for fixed prompts
    lpips       the LPIPS distance on a fixed image pair

Reference load sites being validated:
/root/reference/collab_splats/utils/features.py:167-171 (maskclip
ViT-L/14@336px), :344-347 (torchhub dinov2_vits14),
utils/segmentation.py:84-90 (MobileSAM), utils/lpips usage via nerfstudio.

Every stage degrades gracefully: if the torch-side dependency (hub repo,
clip package) is absent the stage reports SKIP with the reason, so the
script is still runnable—and still useful—in partially-provisioned
environments.  Exit code is 1 if any stage FAILED (not if skipped).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

COS_TOL = 0.999       # per-map cosine similarity against torch
RESULTS = []


def report(stage, status, detail=""):
    RESULTS.append({"stage": stage, "status": status, "detail": detail})
    print(f"[{status:>4}] {stage}: {detail}", flush=True)


def cosine(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


def stage_dinov2(img):
    from collab_splats_tpu.features.extractors import get_extractor
    from collab_splats_tpu.features.weights import find_weights

    if not find_weights("dinov2_vits14.npz"):
        report("dinov2.tower", "SKIP", "weights/dinov2_vits14.npz missing")
        return
    try:
        import torch

        model = torch.hub.load("facebookresearch/dinov2", "dinov2_vits14")
        model.eval()
    except Exception as e:  # noqa: BLE001
        report("dinov2.tower", "SKIP", f"torch.hub dinov2 unavailable: {e}")
        return
    ex = get_extractor("dinov2")
    jax_feat = ex(img)                               # [C, h, w]
    # Torch path mirrors the reference chain (features.py:344-400).
    from collab_splats_tpu.features.extractors import _prep_image

    prepped, ph, pw = _prep_image(img, ex.resolution, ex.patch_size,
                                  ex.mean, ex.std)
    with torch.no_grad():
        t_in = torch.from_numpy(
            np.ascontiguousarray(prepped.transpose(2, 0, 1))[None]
        )
        out = model.forward_features(t_in)["x_norm_patchtokens"]
    t_feat = out[0].numpy().reshape(ph, pw, -1).transpose(2, 0, 1)
    c = cosine(jax_feat, t_feat)
    report("dinov2.tower", "PASS" if c >= COS_TOL else "FAIL",
           f"cosine {c:.6f} (tol {COS_TOL})")
    if c < COS_TOL:
        _pinpoint_patch_embed_dinov2(prepped, model)


def _pinpoint_patch_embed_dinov2(prepped, model):
    """When the tower diverges, check the first module (patch embed)."""
    import torch

    from collab_splats_tpu.features.weights import find_weights

    data = np.load(find_weights("dinov2_vits14.npz"))
    p = 14
    h, w = prepped.shape[:2]
    patches = prepped.reshape(h // p, p, w // p, p, 3) \
        .transpose(0, 2, 1, 3, 4).reshape(-1, p * p * 3)
    jax_pe = patches @ data["patch_embed.w"] + data["patch_embed.b"]
    with torch.no_grad():
        t_in = torch.from_numpy(
            np.ascontiguousarray(prepped.transpose(2, 0, 1))[None]
        )
        t_pe = model.patch_embed(t_in)[0].numpy()
    c = cosine(jax_pe, t_pe)
    report("dinov2.patch_embed", "PASS" if c >= COS_TOL else "FAIL",
           f"cosine {c:.6f} — "
           + ("divergence is AFTER the patch embed (blocks/LN/pos-embed)"
              if c >= COS_TOL else
              "divergence is IN the patch embed (converter layout)"))


def stage_clip(img, prompts):
    from collab_splats_tpu.features.extractors import get_extractor
    from collab_splats_tpu.features.weights import find_weights

    if not find_weights("clip_vitl14_336.npz"):
        report("clip.tower", "SKIP", "weights/clip_vitl14_336.npz missing")
        return
    try:
        import clip as clip_pkg  # the openai clip package
        import torch

        model, _ = clip_pkg.load("ViT-L/14@336px", device="cpu")
        model.eval()
    except Exception as e:  # noqa: BLE001
        report("clip.tower", "SKIP", f"clip package unavailable: {e}")
        return
    ex = get_extractor("clip-vit")
    # Text tower first: tokenizer + 12-block transformer, no resize chain.
    import torch

    jax_txt = ex.encode_text(list(prompts))
    with torch.no_grad():
        t_txt = model.encode_text(clip_pkg.tokenize(list(prompts))).numpy()
    t_txt = t_txt / np.linalg.norm(t_txt, axis=-1, keepdims=True)
    c_txt = cosine(jax_txt, t_txt)
    report("clip.text", "PASS" if c_txt >= COS_TOL else "FAIL",
           f"cosine {c_txt:.6f}")
    # Visual tower: the MaskCLIP value-path head has no exact torch-side
    # equivalent in the clip package (the reference's maskclip_onnx builds
    # it the same way we do), so compare the *pooled* image embedding,
    # which shares every block except the final attention read-out.
    from collab_splats_tpu.features.extractors import _prep_image

    prepped, ph, pw = _prep_image(img, 336, ex.patch_size, ex.mean, ex.std)
    with torch.no_grad():
        t_in = torch.from_numpy(
            np.ascontiguousarray(prepped.transpose(2, 0, 1))[None]
        )
        t_emb = model.encode_image(t_in)[0].numpy()
    t_emb = t_emb / np.linalg.norm(t_emb)
    jax_map = ex(img)                                # [C, h, w] value-path
    jax_pooled = jax_map.mean(axis=(1, 2))
    jax_pooled = jax_pooled / (np.linalg.norm(jax_pooled) + 1e-12)
    c_img = cosine(jax_pooled, t_emb)
    # Pooled value-path vs CLS readout agree only loosely; this is a
    # sanity check (same space), not an equality check.
    report("clip.visual", "PASS" if c_img >= 0.5 else "FAIL",
           f"pooled-vs-CLS cosine {c_img:.4f} (sanity bound 0.5; exact "
           "patch-level goldens need maskclip_onnx — see "
           "feature_goldens.py --record on this machine)")


def stage_sam(img):
    from collab_splats_tpu.features.weights import find_weights

    if not find_weights("sam_vit_b.npz"):
        report("sam.encoder", "SKIP", "weights/sam_vit_b.npz missing")
        return
    try:
        import torch
        from segment_anything import sam_model_registry

        ckpt = Path("weights/src/sam_vit_b_01ec64.pth")
        model = sam_model_registry["vit_b"](checkpoint=str(ckpt))
        model.eval()
    except Exception as e:  # noqa: BLE001
        report("sam.encoder", "SKIP",
               f"segment_anything unavailable: {e}")
        return
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.features import sam as jsam

    params = {k: jnp.asarray(v)
              for k, v in np.load(find_weights("sam_vit_b.npz")).items()}
    side = 1024
    x01 = np.asarray(jax.image.resize(
        jnp_img(img), (side, side, 3), "linear", antialias=True))
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    x = (x01 - mean) / std                      # ImageNet-normalized
    jax_emb = np.asarray(jsam.sam_encoder_forward(params, jnp.asarray(x)))
    with torch.no_grad():
        t_in = torch.from_numpy(
            np.ascontiguousarray(x.transpose(2, 0, 1))[None]
        )
        t_emb = model.image_encoder(t_in)[0].numpy()
    c = cosine(jax_emb, t_emb)
    report("sam.encoder", "PASS" if c >= 0.99 else "FAIL",
           f"cosine {c:.6f}")


def jnp_img(img):
    import jax.numpy as jnp

    return jnp.asarray(img, jnp.float32)


def stage_lpips(img):
    from collab_splats_tpu.utils import lpips as lp

    if not lp.lpips_available():
        report("lpips", "SKIP", "weights/vgg16_lpips.npz missing")
        return
    try:
        import lpips as lpips_pkg
        import torch

        loss_fn = lpips_pkg.LPIPS(net="vgg")
    except Exception as e:  # noqa: BLE001
        report("lpips", "SKIP", f"lpips package unavailable: {e}")
        return
    a = img
    b = np.clip(img + 0.1 * np.sin(7.0 * img), 0, 1)
    ours = lp.lpips(a, b)
    with torch.no_grad():
        t = loss_fn(
            torch.from_numpy(a.transpose(2, 0, 1))[None] * 2 - 1,
            torch.from_numpy(b.transpose(2, 0, 1))[None] * 2 - 1,
        ).item()
    rel = abs(ours - t) / max(abs(t), 1e-6)
    report("lpips", "PASS" if rel < 0.02 else "FAIL",
           f"ours {ours:.5f} torch {t:.5f} rel {rel:.4f}")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scripts.feature_goldens import TEXT_PROMPTS, make_test_image

    img = make_test_image()
    stage_dinov2(img)
    stage_clip(img, TEXT_PROMPTS)
    stage_sam(img)
    stage_lpips(img)
    out = Path("weights/real_weight_compare.json")
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(RESULTS, indent=1))
    print(f"wrote {out}")
    if any(r["status"] == "FAIL" for r in RESULTS):
        sys.exit(1)


if __name__ == "__main__":
    main()
