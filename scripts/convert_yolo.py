#!/usr/bin/env python
"""Convert an ultralytics YOLOv8 checkpoint to the .npz layout used by
``collab_splats_tpu.features.yolo``.

    python scripts/convert_yolo.py ObjectAwareModel.pt weights/yolov8_objaware.npz

Accepts the MobileSAMV2 ``ObjectAwareModel`` release (the reference's box
prompter, /root/reference/collab_splats/utils/segmentation.py:65-88) or any
plain YOLOv8 detect checkpoint.  Loading the .pt may require the
``ultralytics`` package for unpickling; a raw ``state_dict``-only file works
without it.  The transform itself is offline: fuse each conv+BN pair into a
single HWIO conv with bias, keep module indices as key prefixes, and drop
the fixed DFL conv (it is just ``arange(16)``).

Unit-tested against synthetically shaped state_dicts (tests/test_yolo.py).
"""

from __future__ import annotations

import sys
from typing import Dict

import numpy as np

BN_EPS = 1e-3  # ultralytics nn.BatchNorm2d(eps=0.001)


def _t(x):
    return np.asarray(x, np.float32)


def fuse_conv_bn(sd: Dict, pre: str) -> Dict[str, np.ndarray]:
    """torch ``{pre}.conv`` + ``{pre}.bn`` -> fused HWIO weight + bias."""
    w = _t(sd[f"{pre}.conv.weight"])                # [O, I, k, k]
    gamma = _t(sd[f"{pre}.bn.weight"])
    beta = _t(sd[f"{pre}.bn.bias"])
    mean = _t(sd[f"{pre}.bn.running_mean"])
    var = _t(sd[f"{pre}.bn.running_var"])
    scale = gamma / np.sqrt(var + BN_EPS)
    w = w * scale[:, None, None, None]
    b = beta - mean * scale
    return {"w": w.transpose(2, 3, 1, 0), "b": b}


def _emit(out: Dict[str, np.ndarray], dst: str, sd: Dict, src: str) -> None:
    f = fuse_conv_bn(sd, src)
    out[f"{dst}.w"] = f["w"]
    out[f"{dst}.b"] = f["b"]


def _emit_plain(out: Dict[str, np.ndarray], dst: str, sd: Dict,
                src: str) -> None:
    out[f"{dst}.w"] = _t(sd[f"{src}.weight"]).transpose(2, 3, 1, 0)
    out[f"{dst}.b"] = _t(sd[f"{src}.bias"])


def _n_sub(sd: Dict, pre: str) -> int:
    n = 0
    while f"{pre}.m.{n}.cv1.conv.weight" in sd:
        n += 1
    return n


def convert_yolov8(sd: Dict) -> Dict[str, np.ndarray]:
    # Normalize the optional DetectionModel prefix.
    if any(k.startswith("model.model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):]: v for k, v in sd.items()
              if k.startswith("model.")}

    out: Dict[str, np.ndarray] = {}
    plain_convs = {0, 1, 3, 5, 7, 16, 19}
    c2fs = {2, 4, 6, 8, 12, 15, 18, 21}
    for i in sorted(plain_convs):
        _emit(out, str(i), sd, str(i))
    for i in sorted(c2fs):
        _emit(out, f"{i}.cv1", sd, f"{i}.cv1")
        _emit(out, f"{i}.cv2", sd, f"{i}.cv2")
        for j in range(_n_sub(sd, str(i))):
            _emit(out, f"{i}.m.{j}.cv1", sd, f"{i}.m.{j}.cv1")
            _emit(out, f"{i}.m.{j}.cv2", sd, f"{i}.m.{j}.cv2")
    _emit(out, "9.cv1", sd, "9.cv1")
    _emit(out, "9.cv2", sd, "9.cv2")
    for lvl in range(3):
        for branch in ("cv2", "cv3"):
            _emit(out, f"22.{branch}.{lvl}.0", sd, f"22.{branch}.{lvl}.0")
            _emit(out, f"22.{branch}.{lvl}.1", sd, f"22.{branch}.{lvl}.1")
            _emit_plain(out, f"22.{branch}.{lvl}.2", sd,
                        f"22.{branch}.{lvl}.2")
    return out


def load_state_dict(path: str) -> Dict:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt \
            and hasattr(ckpt["model"], "state_dict"):
        sd = ckpt["model"].state_dict()
    elif isinstance(ckpt, dict) and all(
            hasattr(v, "numpy") or isinstance(v, np.ndarray)
            for v in ckpt.values()):
        sd = ckpt
    elif hasattr(ckpt, "state_dict"):
        sd = ckpt.state_dict()
    else:
        raise SystemExit(f"unrecognized checkpoint structure: {type(ckpt)}")
    return {k: (v.float().numpy() if hasattr(v, "numpy") else v)
            for k, v in sd.items()}


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit(__doc__)
    sd = load_state_dict(sys.argv[1])
    out = convert_yolov8(sd)
    np.savez(sys.argv[2], **out)
    print(f"wrote {sys.argv[2]}: {len(out)} arrays")


if __name__ == "__main__":
    main()
