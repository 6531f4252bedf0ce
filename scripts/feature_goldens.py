"""Released-weight golden harness for the feature stack (VERDICT r2 #7).

Runs the MaskCLIP / DINOv2 / SAM extractors end-to-end on a deterministic
procedural test image and records (or checks) activation statistics, so an
environment that HAS the converted released checkpoints (weights/*.npz from
scripts/convert_weights.py / convert_sam.py) can validate the full JAX
towers — preprocessing constants, resize semantics, architecture, converter
layout — against stored reference numbers without any code changes.

Reference load sites being validated:
/root/reference/collab_splats/utils/features.py:167-171 (maskclip ViT-L/14
@336px + ImageNet normalize), :344-347 (torchhub dinov2_vits14, 0.5/0.5
normalize), resize chain features.py:51-99 (PIL BILINEAR longest-edge +
F.interpolate to patch multiples).

Usage:
    python scripts/feature_goldens.py --record [--out goldens.json]
    python scripts/feature_goldens.py --check  [--goldens goldens.json]
    python scripts/feature_goldens.py --prep-parity   # torch-vs-jax preproc

--record/--check run with whatever weights `features.weights.find_weights`
discovers (synthetic/offline stand-ins otherwise; the stored golden records
which mode produced it and --check refuses to compare across modes).
`tests/test_feature_goldens.py` drives record->check round trips in CI.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DEFAULT_GOLDENS = Path(__file__).resolve().parent.parent / "weights" / \
    "feature_goldens.json"

# Fixed text prompts for the CLIP text-tower fingerprint.
TEXT_PROMPTS = ("a photo of an ant", "red disk", "background")


def make_test_image(height: int = 480, width: int = 640) -> np.ndarray:
    """Deterministic procedural RGB test image in [0, 1] (no file needed:
    reproducible bit-exactly from code on any platform)."""
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)
    u, v = xx / width, yy / height
    r = 0.5 + 0.5 * np.sin(6.2832 * (2 * u + v))
    g = v
    b = ((xx // 40 + yy // 40) % 2).astype(np.float32)
    img = np.stack([r, g, b], axis=-1)
    # Two disks to give SAM/CLIP something object-like.
    for (cy, cx, rad, col) in [(160, 200, 70, (0.9, 0.1, 0.1)),
                               (330, 460, 90, (0.1, 0.2, 0.85))]:
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 < rad ** 2
        img[mask] = col
    return np.clip(img, 0.0, 1.0)


def _stats(arr: np.ndarray, k_fp: int = 16) -> dict:
    """Compact comparable fingerprint of a feature array."""
    a = np.asarray(arr, np.float64)
    flat = a.reshape(-1)
    # Deterministic probe coordinates spread over the array.
    idx = (np.arange(k_fp) * (flat.size // k_fp + 1)) % flat.size
    return {
        "shape": list(a.shape),
        "mean": float(a.mean()),
        "std": float(a.std()),
        "min": float(a.min()),
        "max": float(a.max()),
        "absmean": float(np.abs(a).mean()),
        "fingerprint": [float(x) for x in flat[idx]],
    }


def run_extractors(image: np.ndarray) -> dict:
    """Run every gated extractor on ``image``; returns {name: stats}."""
    from collab_splats_tpu.features.extractors import get_extractor

    out = {}
    for name in ("dinov2", "clip-vit"):
        ex = get_extractor(name)
        feats = ex(image)
        out[name] = {
            "pretrained": bool(ex.pretrained),
            "features": _stats(feats),
        }
        if name == "clip-vit":
            txt = ex.encode_text(list(TEXT_PROMPTS))
            out[name]["text"] = _stats(txt)
            # Cross-modal fingerprint: cosine similarity of the mean patch
            # feature against each prompt — the quantity the similarity
            # pipeline consumes (features/similarity.py).
            f = feats.reshape(feats.shape[0], -1).mean(axis=1)
            f = f / (np.linalg.norm(f) + 1e-12)
            out[name]["patch_text_cos"] = [
                float(np.dot(f, t)) for t in txt
            ]

    from collab_splats_tpu.features import sam_predictor

    try:
        sp = sam_predictor.SamBackend()
    except RuntimeError:
        # SAM has no offline stand-in (weights-gated; scripts/convert_sam.py)
        out["sam"] = {"available": False}
        return out
    results = sp.segment_boxes(
        image, np.array([[130.0, 90.0, 270.0, 230.0]], np.float32)
    )
    if results:
        r = results[0]
        out["sam"] = {
            "available": True,
            "area_frac": r["area"] / float(image.shape[0] * image.shape[1]),
            "bbox": r["bbox"],
            "predicted_iou": r["predicted_iou"],
        }
    else:
        out["sam"] = {"available": True, "area_frac": 0.0}
    return out


def record(out_path: Path) -> dict:
    golden = {"image": _stats(make_test_image()),
              "extractors": run_extractors(make_test_image())}
    out_path.parent.mkdir(parents=True, exist_ok=True)
    out_path.write_text(json.dumps(golden, indent=1))
    print(f"wrote goldens to {out_path}")
    return golden

def check(goldens_path: Path, rtol: float = 2e-3, atol: float = 2e-4) -> int:
    golden = json.loads(goldens_path.read_text())
    current = {"image": _stats(make_test_image()),
               "extractors": run_extractors(make_test_image())}
    failures = []

    def cmp(path, a, b):
        if isinstance(a, dict):
            for k in a:
                cmp(f"{path}.{k}", a[k], b[k])
        elif isinstance(a, list) and a and isinstance(a[0], (int, float)):
            if not np.allclose(a, b, rtol=rtol, atol=atol):
                failures.append(f"{path}: {a} != {b}")
        elif isinstance(a, float):
            if not np.allclose(a, b, rtol=rtol, atol=atol):
                failures.append(f"{path}: {a} != {b}")
        elif a != b:
            failures.append(f"{path}: {a} != {b}")

    for name, g in golden["extractors"].items():
        c = current["extractors"].get(name)
        if c is None:
            failures.append(f"{name}: missing")
            continue
        if g.get("pretrained") != c.get("pretrained"):
            failures.append(
                f"{name}: weight mode mismatch (golden pretrained="
                f"{g.get('pretrained')}, current={c.get('pretrained')}) — "
                "record goldens in the same weight environment you check in"
            )
            continue
        cmp(name, g, c)
    if failures:
        print("GOLDEN MISMATCH:")
        for f in failures:
            print(" ", f)
        return 1
    print(f"goldens match ({goldens_path})")
    return 0


def prep_parity() -> int:
    """Pin _prep_image against the reference's torch/PIL chain: PIL
    BILINEAR longest-edge resize -> F.interpolate to patch multiples ->
    Normalize (features.py:51-99,174,354).  Requires torch + PIL (both in
    this environment)."""
    import torch
    import torch.nn.functional as F
    from PIL import Image

    from collab_splats_tpu.features.extractors import _prep_image

    img = make_test_image()
    failures = 0
    for (res, patch, mean, std, label) in [
        (800, 14, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5), "dinov2"),
        (1024, 14, (0.485, 0.456, 0.406), (0.229, 0.224, 0.225), "clip"),
    ]:
        ours, ph, pw = _prep_image(img, res, patch, mean, std)

        # Reference chain (features.py resize_image + interpolate_to_patch
        # + Normalize).
        pil = Image.fromarray((img * 255).astype(np.uint8))
        w, h = pil.size
        scale = res / max(w, h)
        nw, nh = int(round(w * scale)), int(round(h * scale))
        pil = pil.resize((nw, nh), Image.BILINEAR)
        t = torch.from_numpy(
            np.asarray(pil, np.float32) / 255.0
        ).permute(2, 0, 1)[None]
        th = max(nh // patch, 1) * patch
        tw = max(nw // patch, 1) * patch
        t = F.interpolate(t, size=(th, tw), mode="bilinear",
                          align_corners=False)
        t = (t - torch.tensor(mean).view(1, 3, 1, 1)) / \
            torch.tensor(std).view(1, 3, 1, 1)
        ref = t[0].permute(1, 2, 0).numpy()

        if ours.shape != ref.shape:
            print(f"{label}: shape {ours.shape} != torch {ref.shape}")
            failures += 1
            continue
        diff = np.abs(ours - ref).max()
        # The reference's PIL leg quantizes to uint8 between the two
        # resizes (ToTensor comes after the PIL resize); our chain stays
        # float.  Interpolated quantization error reaches a few /255 raw
        # at hard edges, scaled by 1/std after normalization.
        tol = 3.5 / 255.0 / min(std)
        status = "OK" if diff < tol else "FAIL"
        print(f"{label}: grid {ph}x{pw}, max|prep diff| = {diff:.4f} "
              f"[{status}]")
        if diff >= tol:
            failures += 1
    return 1 if failures else 0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", action="store_true")
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--prep-parity", action="store_true")
    ap.add_argument("--out", type=Path, default=DEFAULT_GOLDENS)
    ap.add_argument("--goldens", type=Path, default=DEFAULT_GOLDENS)
    ap.add_argument("--tpu", action="store_true",
                    help="run on the accelerator backend (default: CPU — "
                    "goldens are about numerics, and the tunnel dispatch "
                    "overhead dwarfs these small towers)")
    args = ap.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    rc = 0
    if args.prep_parity:
        rc |= prep_parity()
    if args.record:
        record(args.out)
    if args.check:
        rc |= check(args.goldens)
    if not (args.record or args.check or args.prep_parity):
        print(__doc__)
        rc = 2
    sys.exit(rc)


if __name__ == "__main__":
    main()
