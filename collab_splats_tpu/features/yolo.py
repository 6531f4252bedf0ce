"""YOLOv8 object detector in JAX — the box-prompt source for MobileSAMv2.

The reference drives box-prompted segmentation with the ``ObjAwareModel``
(a YOLOv8 detector) from the MobileSAMV2 hub release
(/root/reference/collab_splats/utils/segmentation.py:65-123): YOLO proposes
object boxes, SAM turns each box into a mask.  This module re-implements the
YOLOv8 *detect* architecture TPU-natively (NHWC, fused conv+BN, XLA
convolutions) and loads released ultralytics checkpoints converted to .npz
by ``scripts/convert_yolo.py``.  Without a weights file the segmentation
facade falls back to the classical region proposer, exactly like the SAM
path (features/segmentation.py).

Architecture (ultralytics v8, anchor-free decoupled head):

* backbone: stem conv, 4 stages of stride-2 conv + C2f (cross-stage block
  with split + n bottlenecks + concat), SPPF at the end;
* neck: PAN — two top-down upsample/concat/C2f stages, two bottom-up
  stride-2-conv/concat/C2f stages;
* head: per level (P3/P4/P5) a box branch (2 convs + 1x1 to 4*reg_max DFL
  logits) and a class branch (2 convs + 1x1 to nc logits);
* decode: softmax the 16 DFL bins per side -> expected l/t/r/b cell
  distances, scale by the level stride around cell centers, sigmoid class
  scores, then class-agnostic greedy NMS (host-side; the detector runs
  once per image during preprocessing, never inside the train step).

Every structural hyperparameter (widths, C2f repeat counts, number of
classes, reg_max) is recovered from the weight shapes, so one forward
function serves all scales n/s/m/l/x.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .weights import find_weights

STRIDES = (8, 16, 32)
IMG_SIZE = 640  # ultralytics default imgsz; inputs are letterboxed to this


def yolo_available() -> bool:
    return find_weights("yolov8_objaware.npz") is not None


# --------------------------------------------------------------- primitives


def _conv(x: jax.Array, w: jax.Array, b: jax.Array, stride: int = 1,
          act: bool = True) -> jax.Array:
    """NHWC conv, SAME padding, fused-BN bias, SiLU."""
    k = w.shape[0]
    pad = (k - 1) // 2
    y = jax.lax.conv_general_dilated(
        x[None], w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b
    return jax.nn.silu(y) if act else y


def _cbs(p: Dict[str, jax.Array], pre: str, x: jax.Array,
         stride: int = 1) -> jax.Array:
    return _conv(x, p[f"{pre}.w"], p[f"{pre}.b"], stride)


def _n_bottlenecks(p: Dict[str, jax.Array], pre: str) -> int:
    n = 0
    while f"{pre}.m.{n}.cv1.w" in p:
        n += 1
    return n


def _c2f(p: Dict[str, jax.Array], pre: str, x: jax.Array,
         shortcut: bool) -> jax.Array:
    y = _cbs(p, f"{pre}.cv1", x)
    c = y.shape[-1] // 2
    a, b = y[..., :c], y[..., c:]
    outs = [a, b]
    cur = b
    for j in range(_n_bottlenecks(p, pre)):
        h = _cbs(p, f"{pre}.m.{j}.cv1", cur)
        h = _cbs(p, f"{pre}.m.{j}.cv2", h)
        cur = cur + h if shortcut else h
        outs.append(cur)
    return _cbs(p, f"{pre}.cv2", jnp.concatenate(outs, axis=-1))


def _sppf(p: Dict[str, jax.Array], pre: str, x: jax.Array) -> jax.Array:
    y = _cbs(p, f"{pre}.cv1", x)

    def pool(z):
        return jax.lax.reduce_window(
            z, -jnp.inf, jax.lax.max, (5, 5, 1), (1, 1, 1),
            [(2, 2), (2, 2), (0, 0)],
        )

    m1 = pool(y)
    m2 = pool(m1)
    m3 = pool(m2)
    return _cbs(p, f"{pre}.cv2", jnp.concatenate([y, m1, m2, m3], axis=-1))


def _upsample2(x: jax.Array) -> jax.Array:
    h, w, c = x.shape
    return jnp.broadcast_to(
        x[:, None, :, None, :], (h, 2, w, 2, c)
    ).reshape(h * 2, w * 2, c)


# ------------------------------------------------------------------ forward


def yolo_forward(
    p: Dict[str, jax.Array], img: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """[H, W, 3] float image in [0, 1] (H, W multiples of 32) ->
    (boxes_xyxy [A, 4] in input pixels, class scores [A, nc])."""
    x = img
    x = _cbs(p, "0", x, stride=2)
    x = _cbs(p, "1", x, stride=2)
    x = _c2f(p, "2", x, shortcut=True)
    x = _cbs(p, "3", x, stride=2)
    x4 = _c2f(p, "4", x, shortcut=True)            # P3 skip
    x = _cbs(p, "5", x4, stride=2)
    x6 = _c2f(p, "6", x, shortcut=True)            # P4 skip
    x = _cbs(p, "7", x6, stride=2)
    x = _c2f(p, "8", x, shortcut=True)
    x9 = _sppf(p, "9", x)                          # P5

    # PAN neck.
    x12 = _c2f(p, "12", jnp.concatenate([_upsample2(x9), x6], axis=-1),
               shortcut=False)
    x15 = _c2f(p, "15", jnp.concatenate([_upsample2(x12), x4], axis=-1),
               shortcut=False)                     # P3 out
    x18 = _c2f(p, "18", jnp.concatenate([_cbs(p, "16", x15, 2), x12],
                                        axis=-1), shortcut=False)  # P4 out
    x21 = _c2f(p, "21", jnp.concatenate([_cbs(p, "19", x18, 2), x9],
                                        axis=-1), shortcut=False)  # P5 out

    reg_max = 16
    boxes_all: List[jax.Array] = []
    scores_all: List[jax.Array] = []
    for lvl, (feat, stride) in enumerate(zip((x15, x18, x21), STRIDES)):
        bx = feat
        for j in (0, 1):
            bx = _cbs(p, f"22.cv2.{lvl}.{j}", bx)
        bx = _conv(bx, p[f"22.cv2.{lvl}.2.w"], p[f"22.cv2.{lvl}.2.b"],
                   act=False)                      # [h, w, 4*reg_max]
        cl = feat
        for j in (0, 1):
            cl = _cbs(p, f"22.cv3.{lvl}.{j}", cl)
        cl = _conv(cl, p[f"22.cv3.{lvl}.2.w"], p[f"22.cv3.{lvl}.2.b"],
                   act=False)                      # [h, w, nc]

        h, w = bx.shape[:2]
        dfl = jax.nn.softmax(bx.reshape(h * w, 4, reg_max), axis=-1)
        dist = dfl @ jnp.arange(reg_max, dtype=jnp.float32)  # [hw, 4] ltrb
        cx = (jnp.tile(jnp.arange(w, dtype=jnp.float32), h) + 0.5)
        cy = (jnp.repeat(jnp.arange(h, dtype=jnp.float32), w) + 0.5)
        x1 = (cx - dist[:, 0]) * stride
        y1 = (cy - dist[:, 1]) * stride
        x2 = (cx + dist[:, 2]) * stride
        y2 = (cy + dist[:, 3]) * stride
        boxes_all.append(jnp.stack([x1, y1, x2, y2], axis=-1))
        scores_all.append(jax.nn.sigmoid(cl.reshape(h * w, -1)))

    return jnp.concatenate(boxes_all), jnp.concatenate(scores_all)


# ---------------------------------------------------------------- detector


def nms_boxes(boxes: np.ndarray, scores: np.ndarray, iou_thresh: float,
              max_det: int) -> np.ndarray:
    """Class-agnostic greedy NMS; returns kept indices (score-descending)."""
    order = np.argsort(-scores)
    x1, y1, x2, y2 = boxes.T
    areas = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    keep: List[int] = []
    while order.size and len(keep) < max_det:
        i = order[0]
        keep.append(int(i))
        rest = order[1:]
        ix1 = np.maximum(x1[i], x1[rest])
        iy1 = np.maximum(y1[i], y1[rest])
        ix2 = np.minimum(x2[i], x2[rest])
        iy2 = np.minimum(y2[i], y2[rest])
        inter = np.maximum(ix2 - ix1, 0) * np.maximum(iy2 - iy1, 0)
        iou = inter / np.maximum(areas[i] + areas[rest] - inter, 1e-9)
        order = rest[iou <= iou_thresh]
    return np.asarray(keep, np.int64)


class ObjectAwareDetector:
    """Box-proposal detector (the reference's ObjAwareModel role).

    ``__call__(image) -> (boxes_xyxy [K, 4] in image pixels, conf [K])``
    with the reference's suggested thresholds (segmentation.py:112-123).
    """

    def __init__(self, weights_npz: Optional[str] = None,
                 conf: float = 0.25, iou: float = 0.5, max_det: int = 300):
        path = weights_npz or find_weights("yolov8_objaware.npz")
        if path is None:
            raise RuntimeError(
                "YOLO weights not found: convert an ultralytics/MobileSAMV2 "
                "ObjectAwareModel checkpoint with scripts/convert_yolo.py "
                "and place yolov8_objaware.npz under weights/."
            )
        data = np.load(path)
        self.params = {k: jnp.asarray(data[k]) for k in data.files}
        self.conf = conf
        self.iou = iou
        self.max_det = max_det
        self._forward = jax.jit(functools.partial(yolo_forward, self.params))

    def __call__(self, image: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        img = np.asarray(image, np.float32)
        if img.max() > 1.0 + 1e-6:
            img = img / 255.0
        h, w = img.shape[:2]
        scale = IMG_SIZE / max(h, w)
        th, tw = int(round(h * scale)), int(round(w * scale))
        import jax.image as jimage

        resized = np.asarray(
            jimage.resize(jnp.asarray(img), (th, tw, 3), "linear")
        )
        ph = -(-th // 32) * 32
        pw = -(-tw // 32) * 32
        padded = np.full((ph, pw, 3), 0.447, np.float32)  # letterbox gray
        padded[:th, :tw] = resized

        boxes, scores = self._forward(jnp.asarray(padded))
        boxes = np.asarray(boxes)
        confs = np.asarray(scores).max(axis=1)
        sel = confs >= self.conf
        boxes, confs = boxes[sel], confs[sel]
        if len(boxes) == 0:
            return np.zeros((0, 4), np.float32), np.zeros((0,), np.float32)
        keep = nms_boxes(boxes, confs, self.iou, self.max_det)
        boxes, confs = boxes[keep] / scale, confs[keep]
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, w - 1)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, h - 1)
        return boxes.astype(np.float32), confs.astype(np.float32)
