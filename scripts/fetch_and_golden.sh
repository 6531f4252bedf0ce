#!/usr/bin/env bash
# Turn-key released-weights golden harness (VERDICT r4 #6).
#
# In an environment WITH network egress this script:
#   1. downloads every released checkpoint the reference actually uses
#      (/root/reference/collab_splats/utils/features.py:167,344-347,
#       utils/segmentation.py:84-90, LPIPS via nerfstudio),
#   2. converts them to the weights/*.npz layout the JAX towers load,
#   3. cross-checks the JAX towers stage-by-stage against the official
#      torch models (scripts/real_weight_compare.py — pinpoints the first
#      diverging module on mismatch),
#   4. records extractor goldens (scripts/feature_goldens.py --record) so
#      future environments can --check without torch or egress.
#
# In THIS build environment (zero egress) the downloads fail fast and the
# script prints exactly what remains unvalidated.  Every stage is
# idempotent — rerun after provisioning whatever was missing.
#
# Usage:  bash scripts/fetch_and_golden.sh [--skip-fetch]

set -uo pipefail
cd "$(dirname "$0")/.."
mkdir -p weights/src

SKIP_FETCH="${1:-}"
FAILED_FETCH=()

fetch() { # fetch <url> <dest>
  local url="$1" dest="weights/src/$2"
  if [[ -s "$dest" ]]; then echo "have  $dest"; return 0; fi
  if [[ "$SKIP_FETCH" == "--skip-fetch" ]]; then
    echo "skip  $dest"; FAILED_FETCH+=("$dest"); return 1; fi
  echo "fetch $url"
  if ! curl -fL --retry 3 -o "$dest.part" "$url"; then
    echo "FETCH FAILED: $url"; rm -f "$dest.part"
    FAILED_FETCH+=("$dest"); return 1
  fi
  mv "$dest.part" "$dest"
}

# --- 1. released checkpoints (the reference's exact load targets) --------
fetch "https://openaipublic.azureedge.net/clip/models/3035c92b350959924f9f00213499208652fc7ea050643e8b385c2dac08641f02/ViT-L-14-336px.pt" \
      "ViT-L-14-336px.pt" || true
fetch "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_pretrain.pth" \
      "dinov2_vits14_pretrain.pth" || true
fetch "https://dl.fbaipublicfiles.com/segment_anything/sam_vit_b_01ec64.pth" \
      "sam_vit_b_01ec64.pth" || true
fetch "https://github.com/ultralytics/assets/releases/download/v8.2.0/yolov8n.pt" \
      "yolov8n.pt" || true
fetch "https://download.pytorch.org/models/vgg16-397923af.pth" \
      "vgg16.pth" || true
fetch "https://github.com/richzhang/PerceptualSimilarity/raw/master/lpips/weights/v0.1/vgg.pth" \
      "lpips_vgg_lins.pth" || true
# CLIP BPE vocab (tokenizer gate, features/clip_tokenizer.py).
fetch "https://github.com/openai/CLIP/raw/main/clip/bpe_simple_vocab_16e6.txt.gz" \
      "bpe_simple_vocab_16e6.txt.gz" || true

# --- 2. convert ----------------------------------------------------------
conv() { # conv <dest> <cmd...>
  local dest="$1"; shift
  if [[ -s "$dest" ]]; then echo "have  $dest"; return 0; fi
  echo "conv  $dest"
  "$@" || echo "CONVERT FAILED: $dest (source missing or incompatible)"
}
SRC=weights/src
[[ -s $SRC/ViT-L-14-336px.pt ]] && conv weights/clip_vitl14_336.npz \
  python scripts/convert_weights.py clip "$SRC/ViT-L-14-336px.pt" weights/clip_vitl14_336.npz
[[ -s $SRC/dinov2_vits14_pretrain.pth ]] && conv weights/dinov2_vits14.npz \
  python scripts/convert_weights.py dinov2 "$SRC/dinov2_vits14_pretrain.pth" weights/dinov2_vits14.npz
[[ -s $SRC/sam_vit_b_01ec64.pth ]] && conv weights/sam_vit_b.npz \
  python scripts/convert_sam.py "$SRC/sam_vit_b_01ec64.pth" weights/sam_vit_b.npz
[[ -s $SRC/yolov8n.pt ]] && conv weights/yolov8_objaware.npz \
  python scripts/convert_yolo.py "$SRC/yolov8n.pt" weights/yolov8_objaware.npz
[[ -s $SRC/vgg16.pth ]] && conv weights/vgg16_lpips.npz \
  python scripts/convert_weights.py vgg16 "$SRC/vgg16.pth" weights/vgg16_lpips.npz "$SRC/lpips_vgg_lins.pth"
[[ -s $SRC/bpe_simple_vocab_16e6.txt.gz && ! -s weights/bpe_simple_vocab_16e6.txt.gz ]] \
  && cp "$SRC/bpe_simple_vocab_16e6.txt.gz" weights/

# --- 3. torch cross-check (pinpoints the first diverging module) ---------
echo "=== preprocessing parity (torch F.interpolate chain) ==="
python scripts/feature_goldens.py --prep-parity || true
echo "=== stage-by-stage real-weight compare ==="
python scripts/real_weight_compare.py
COMPARE_RC=$?

# --- 4. record goldens for egress-free environments ----------------------
echo "=== recording extractor goldens ==="
python scripts/feature_goldens.py --record --out weights/feature_goldens.json

# --- summary -------------------------------------------------------------
echo "=== summary ==="
if ((${#FAILED_FETCH[@]})); then
  echo "UNVALIDATED (no egress / fetch failed) — provision these and rerun:"
  printf '  %s\n' "${FAILED_FETCH[@]}"
fi
ls -la weights/*.npz 2>/dev/null || echo "no converted weights present"
exit $COMPARE_RC
