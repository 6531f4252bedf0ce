"""SAM predictor + automatic mask generation over the JAX SAM modules.

Mirrors the reference's two segmentation entry points
(/root/reference/collab_splats/utils/segmentation.py):

* :meth:`SamBackend.segment_boxes` — box-prompted batch segmentation
  (the MobileSAMv2 + detector path, segmentation.py:126-236).  Box
  proposals come from any source; without a detector checkpoint the
  classical region proposer (features/segmentation.py) supplies them.
* :meth:`SamBackend.auto_segment` — point-grid automatic mask generation
  (segmentation.py:91-106 ``SamAutomaticMaskGenerator``): a uniform grid
  of foreground-point prompts, multimask output, quality filtering by
  predicted IoU + stability score, then greedy mask NMS.

Returns reference-format result dicts (segmentation/area/bbox/
predicted_iou/stability_score) consumed by features/grouping.py.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import sam as S
from .weights import find_weights

_MEAN = np.array([123.675, 116.28, 103.53], np.float32)
_STD = np.array([58.395, 57.12, 57.375], np.float32)


def sam_available() -> bool:
    return find_weights("sam_vit_b.npz") is not None


class SamBackend:
    """Stateful predictor (one set_image, many prompts) like SamPredictor."""

    def __init__(self, weights_npz: Optional[str] = None):
        path = weights_npz or find_weights("sam_vit_b.npz")
        if path is None:
            raise RuntimeError(
                "SAM weights not found: convert a segment-anything "
                "checkpoint with scripts/convert_sam.py and place "
                "sam_vit_b.npz under weights/."
            )
        data = np.load(path)
        self.params = {k: jnp.asarray(data[k]) for k in data.files}
        self.has_encoder = "enc.patch_embed.w" in self.params
        self._embedding = None
        self._orig_hw: Tuple[int, int] = (0, 0)
        self._input_hw: Tuple[int, int] = (0, 0)
        self._scale = 1.0

        self._encode = jax.jit(
            lambda img: S.sam_encoder_forward(self.params, img)
        )
        self._decode = jax.jit(
            self._decode_impl, static_argnames=("multimask",)
        )

    def _decode_impl(self, embedding, sparse, multimask=False):
        pe = S.dense_pe(self.params)
        return S.mask_decoder_forward(
            self.params, embedding, pe, sparse, multimask=multimask
        )

    # ------------------------------------------------------------ predictor
    def set_image(self, image: np.ndarray,
                  embedding: Optional[np.ndarray] = None) -> None:
        """Embed an [H, W, 3] uint8/float image (longest side -> 1024).

        ``embedding`` lets callers inject a [256, 64, 64] embedding from an
        external encoder (the MobileSAM-distilled path)."""
        h, w = image.shape[:2]
        self._orig_hw = (h, w)
        self._scale = S.IMG_SIZE / max(h, w)
        th, tw = int(round(h * self._scale)), int(round(w * self._scale))
        self._input_hw = (th, tw)
        if embedding is not None:
            self._embedding = jnp.asarray(embedding)
            return
        if not self.has_encoder:
            raise RuntimeError(
                "this weights file is decoder-only; pass `embedding=`"
            )
        img = np.asarray(image, np.float32)
        if img.max() <= 1.0 + 1e-6:
            img = img * 255.0
        import jax.image as jimage

        resized = np.asarray(
            jimage.resize(jnp.asarray(img), (th, tw, 3), "linear")
        )
        norm = (resized - _MEAN) / _STD
        padded = np.zeros((S.IMG_SIZE, S.IMG_SIZE, 3), np.float32)
        padded[:th, :tw] = norm
        self._embedding = self._encode(jnp.asarray(padded))

    def predict_boxes(self, boxes_xyxy: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[B, 4] boxes in original pixels -> ([B, H, W] bool, [B] iou)."""
        assert self._embedding is not None, "call set_image first"
        boxes = jnp.asarray(boxes_xyxy, jnp.float32) * self._scale
        sparse = S.encode_boxes(self.params, boxes)
        low, iou = self._decode(self._embedding, sparse, multimask=False)
        masks = S.postprocess_masks(low, self._orig_hw, self._input_hw)
        return np.asarray(masks[:, 0] > 0.0), np.asarray(iou[:, 0])

    def predict_points(
        self, points: np.ndarray, multimask: bool = True
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """[B, 2] single foreground points -> ([B, M, H, W] logits > 0,
        [B, M] iou, [B, M, H, W] raw logits)."""
        low, iou = self.predict_points_low(points, multimask=multimask)
        masks = S.postprocess_masks(
            jnp.asarray(low), self._orig_hw, self._input_hw
        )
        return np.asarray(masks > 0.0), np.asarray(iou), np.asarray(masks)

    def predict_points_low(
        self, points: np.ndarray, multimask: bool = True
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Low-resolution variant: [B, 2] points -> ([B, M, 256, 256] raw
        logits, [B, M] iou) with NO upscale — quality filtering happens at
        this resolution (like SamAutomaticMaskGenerator), so survivors
        alone pay the full-image resize."""
        assert self._embedding is not None, "call set_image first"
        pts = jnp.asarray(points, jnp.float32)[:, None, :] * self._scale
        labels = jnp.ones(pts.shape[:2], jnp.int32)
        sparse = S.encode_points(self.params, pts, labels)
        low, iou = self._decode(self._embedding, sparse, multimask=multimask)
        return np.asarray(low), np.asarray(iou)

    # ----------------------------------------------------------- reference
    def segment_boxes(self, image: np.ndarray, boxes_xyxy: np.ndarray,
                      confs: Optional[np.ndarray] = None,
                      batch_size: int = 64) -> List[Dict]:
        """Box-prompted segmentation in reference result format
        (segmentation.py:126-236)."""
        self.set_image(image)
        results: List[Dict] = []
        h, w = image.shape[:2]
        confs = np.ones(len(boxes_xyxy)) if confs is None else confs
        for s0 in range(0, len(boxes_xyxy), batch_size):
            masks, ious = self.predict_boxes(boxes_xyxy[s0 : s0 + batch_size])
            for mask, iou, conf in zip(
                masks, ious, confs[s0 : s0 + batch_size]
            ):
                area = int(mask.sum())
                if area == 0:
                    continue
                ys, xs = np.where(mask)
                results.append({
                    "segmentation": mask,
                    "area": area,
                    "bbox": [int(xs.min()), int(ys.min()),
                             int(xs.max() - xs.min()), int(ys.max() - ys.min())],
                    "predicted_iou": float(iou),
                    "point_coords": [],
                    "stability_score": float(conf),
                    "crop_box": [0, 0, w, h],
                })
        return results

    def auto_segment(
        self,
        image: np.ndarray,
        points_per_side: int = 16,
        pred_iou_thresh: float = 0.7,
        stability_offset: float = 1.0,
        stability_thresh: float = 0.85,
        nms_iou: float = 0.7,
        min_area: int = 64,
    ) -> List[Dict]:
        """Point-grid automatic mask generation (SamAutomaticMaskGenerator
        semantics: multimask per point, IoU + stability filtering, greedy
        mask NMS by predicted IoU)."""
        self.set_image(image)
        h, w = image.shape[:2]
        g = (np.arange(points_per_side) + 0.5) / points_per_side
        pts = np.stack(np.meshgrid(g * w, g * h), axis=-1).reshape(-1, 2)

        # Filter on the 256x256 decoder logits (like the reference's
        # SamAutomaticMaskGenerator: IoU + stability are computed pre-
        # upscale) and resize only the survivors — upscaling all B*M masks
        # to a 4K frame first costs multi-GB intermediates.
        survivors: List[np.ndarray] = []
        meta: List[Tuple[float, float, list]] = []
        for s0 in range(0, len(pts), 64):
            low, ious = self.predict_points_low(pts[s0 : s0 + 64])
            b, m = low.shape[:2]
            for bi in range(b):
                for mi in range(m):
                    iou = float(ious[bi, mi])
                    if iou < pred_iou_thresh:
                        continue
                    lg = low[bi, mi]
                    inter = float((lg > stability_offset).sum())
                    union = float((lg > -stability_offset).sum())
                    stab = inter / max(union, 1.0)
                    if stab < stability_thresh:
                        continue
                    survivors.append(lg)
                    meta.append((iou, stab, [pts[s0 + bi].tolist()]))

        cands: List[Dict] = []
        for s0 in range(0, len(survivors), 32):
            batch = jnp.asarray(np.stack(survivors[s0 : s0 + 32]))[:, None]
            masks = np.asarray(
                S.postprocess_masks(batch, self._orig_hw, self._input_hw)
                > 0.0
            )[:, 0]
            for mask, (iou, stab, pc) in zip(masks, meta[s0 : s0 + 32]):
                area = int(mask.sum())
                if area < min_area:
                    continue
                cands.append({
                    "segmentation": mask, "area": area,
                    "predicted_iou": iou, "stability_score": stab,
                    "point_coords": pc,
                    "crop_box": [0, 0, w, h],
                })
        # Greedy NMS on masks by predicted IoU.
        cands.sort(key=lambda r: -r["predicted_iou"])
        kept: List[Dict] = []
        for r in cands:
            keep = True
            for k in kept:
                inter = np.logical_and(r["segmentation"], k["segmentation"]).sum()
                union = np.logical_or(r["segmentation"], k["segmentation"]).sum()
                if union and inter / union > nms_iou:
                    keep = False
                    break
            if keep:
                ys, xs = np.where(r["segmentation"])
                r["bbox"] = [int(xs.min()), int(ys.min()),
                             int(xs.max() - xs.min()), int(ys.max() - ys.min())]
                kept.append(r)
        return kept
