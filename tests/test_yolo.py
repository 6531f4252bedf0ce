"""YOLOv8 detector: converter mapping + forward shapes + NMS.

Builds a synthetically shaped ultralytics state_dict (tiny widths, real
module naming), converts it with scripts/convert_yolo.py, and runs the JAX
forward — validating the fused-BN conversion, the backbone/neck dataflow,
and the DFL decode end-to-end without any released checkpoint.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from collab_splats_tpu.features import yolo
from convert_yolo import convert_yolov8

torch = pytest.importorskip("torch")


def _conv_bn(sd, pre, cin, cout, k, gen):
    sd[f"{pre}.conv.weight"] = torch.tensor(
        gen.normal(0, 0.1, (cout, cin, k, k)).astype(np.float32))
    sd[f"{pre}.bn.weight"] = torch.tensor(
        gen.uniform(0.5, 1.5, cout).astype(np.float32))
    sd[f"{pre}.bn.bias"] = torch.tensor(
        gen.normal(0, 0.1, cout).astype(np.float32))
    sd[f"{pre}.bn.running_mean"] = torch.tensor(
        gen.normal(0, 0.1, cout).astype(np.float32))
    sd[f"{pre}.bn.running_var"] = torch.tensor(
        gen.uniform(0.5, 1.5, cout).astype(np.float32))


def _c2f(sd, idx, cin, cout, n, gen):
    h = cout // 2
    _conv_bn(sd, f"{idx}.cv1", cin, cout, 1, gen)
    for j in range(n):
        _conv_bn(sd, f"{idx}.m.{j}.cv1", h, h, 3, gen)
        _conv_bn(sd, f"{idx}.m.{j}.cv2", h, h, 3, gen)
    _conv_bn(sd, f"{idx}.cv2", h * (2 + n), cout, 1, gen)


def make_state_dict(nc=1, reg_max=16):
    gen = np.random.default_rng(0)
    sd = {}
    c = [8, 16, 24, 32, 48]
    _conv_bn(sd, "0", 3, c[0], 3, gen)
    _conv_bn(sd, "1", c[0], c[1], 3, gen)
    _c2f(sd, "2", c[1], c[1], 1, gen)
    _conv_bn(sd, "3", c[1], c[2], 3, gen)
    _c2f(sd, "4", c[2], c[2], 1, gen)
    _conv_bn(sd, "5", c[2], c[3], 3, gen)
    _c2f(sd, "6", c[3], c[3], 1, gen)
    _conv_bn(sd, "7", c[3], c[4], 3, gen)
    _c2f(sd, "8", c[4], c[4], 1, gen)
    _conv_bn(sd, "9.cv1", c[4], c[4] // 2, 1, gen)
    _conv_bn(sd, "9.cv2", c[4] * 2, c[4], 1, gen)
    _c2f(sd, "12", c[4] + c[3], c[3], 1, gen)
    _c2f(sd, "15", c[3] + c[2], c[2], 1, gen)
    _conv_bn(sd, "16", c[2], c[2], 3, gen)
    _c2f(sd, "18", c[2] + c[3], c[3], 1, gen)
    _conv_bn(sd, "19", c[3], c[3], 3, gen)
    _c2f(sd, "21", c[3] + c[4], c[4], 1, gen)
    ch_out = {0: c[2], 1: c[3], 2: c[4]}
    for lvl in range(3):
        for branch, out_ch in (("cv2", 4 * reg_max), ("cv3", nc)):
            _conv_bn(sd, f"22.{branch}.{lvl}.0", ch_out[lvl], 16, 3, gen)
            _conv_bn(sd, f"22.{branch}.{lvl}.1", 16, 16, 3, gen)
            sd[f"22.{branch}.{lvl}.2.weight"] = torch.tensor(
                gen.normal(0, 0.1, (out_ch, 16, 1, 1)).astype(np.float32))
            sd[f"22.{branch}.{lvl}.2.bias"] = torch.tensor(
                gen.normal(0, 0.1, out_ch).astype(np.float32))
    sd["22.dfl.conv.weight"] = torch.arange(
        reg_max, dtype=torch.float32).reshape(1, reg_max, 1, 1)
    # The real checkpoints carry the DetectionModel prefix.
    return {f"model.{k}": v for k, v in sd.items()}


@pytest.fixture(scope="module")
def params():
    out = convert_yolov8(
        {k: v.numpy() for k, v in make_state_dict().items()})
    import jax.numpy as jnp

    return {k: jnp.asarray(v) for k, v in out.items()}


def test_convert_shapes(params):
    assert params["0.w"].shape == (3, 3, 3, 8)      # HWIO
    assert params["22.cv2.0.2.w"].shape == (1, 1, 16, 64)
    assert params["22.cv3.2.2.b"].shape == (1,)
    assert "22.dfl.conv.weight" not in params        # dropped (fixed arange)


def test_forward_shapes(params):
    import jax.numpy as jnp

    img = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (128, 128, 3)), jnp.float32)
    boxes, scores = yolo.yolo_forward(params, img)
    n_anchors = 16 * 16 + 8 * 8 + 4 * 4
    assert boxes.shape == (n_anchors, 4)
    assert scores.shape == (n_anchors, 1)
    assert bool(jnp.isfinite(boxes).all()) and bool(jnp.isfinite(scores).all())
    assert float(scores.min()) >= 0.0 and float(scores.max()) <= 1.0
    # DFL distances are bounded by (reg_max-1)*stride around cell centers.
    assert float(boxes[:, 2].max()) <= 128 + 15 * 32


def test_fused_bn_matches_torch(params):
    """The fused conv must reproduce conv+BN(eval) on the stem layer."""
    sd = {k[len("model."):]: v for k, v in make_state_dict().items()}
    x = torch.tensor(
        np.random.default_rng(2).uniform(0, 1, (1, 3, 16, 16))
        .astype(np.float32))
    conv = torch.nn.Conv2d(3, 8, 3, stride=2, padding=1, bias=False)
    bn = torch.nn.BatchNorm2d(8, eps=1e-3).eval()
    with torch.no_grad():
        conv.weight.copy_(sd["0.conv.weight"])
        bn.weight.copy_(sd["0.bn.weight"])
        bn.bias.copy_(sd["0.bn.bias"])
        bn.running_mean.copy_(sd["0.bn.running_mean"])
        bn.running_var.copy_(sd["0.bn.running_var"])
        ref = torch.nn.functional.silu(bn(conv(x)))[0].permute(1, 2, 0)
    import jax.numpy as jnp

    got = yolo._conv(jnp.asarray(x[0].permute(1, 2, 0).numpy()),
                     params["0.w"], params["0.b"], stride=2)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), atol=1e-5)


def test_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    keep = yolo.nms_boxes(boxes, scores, iou_thresh=0.5, max_det=10)
    assert list(keep) == [0, 2]
    keep = yolo.nms_boxes(boxes, scores, iou_thresh=0.95, max_det=10)
    assert list(keep) == [0, 1, 2]


def test_detector_end_to_end(tmp_path, params):
    npz = tmp_path / "yolov8_objaware.npz"
    np.savez(npz, **{k: np.asarray(v) for k, v in params.items()})
    det = yolo.ObjectAwareDetector(weights_npz=str(npz), conf=0.0)
    img = (np.random.default_rng(3).uniform(0, 255, (96, 160, 3))
           .astype(np.uint8))
    boxes, confs = det(img)
    assert boxes.shape[1] == 4 and boxes.shape[0] == confs.shape[0]
    assert (boxes[:, 0] <= boxes[:, 2] + 1e-3).all()
    assert (boxes[:, 2] <= 160).all() and (boxes[:, 3] <= 96).all()
    assert yolo.yolo_available() in (True, False)
