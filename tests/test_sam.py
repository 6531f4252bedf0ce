"""SAM stack tests (features/sam.py + sam_predictor.py + convert_sam.py).

No SAM checkpoint can be downloaded here, so: (1) micro golden tests pin
the components whose torch semantics could silently diverge (transposed
convolutions, windowed rel-pos attention) against torch itself; (2) a
synthetic state_dict with the official segment-anything naming goes
through the converter and the full encoder+prompt+decoder forward, pinning
key coverage, shapes, and numerical sanity; (3) the predictor's box and
automatic paths run end-to-end on a tiny synthetic checkpoint.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from convert_sam import convert_sam  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from collab_splats_tpu.features import sam as S  # noqa: E402


class TestConvTransposeParity:
    def test_matches_torch_convtranspose2d(self):
        torch.manual_seed(0)
        m = nn.ConvTranspose2d(8, 4, kernel_size=2, stride=2)
        x = torch.randn(1, 8, 5, 5)
        with torch.no_grad():
            want = m(x).numpy()                       # [1, 4, 10, 10]
        w = m.weight.detach().numpy()                 # [in, out, 2, 2]
        got = jax.lax.conv_transpose(
            jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
            jnp.asarray(w.transpose(2, 3, 1, 0)),     # fwd-conv HWIO
            (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), transpose_kernel=True,
        ) + jnp.asarray(m.bias.detach().numpy())
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
        )


def _synthetic_sam_sd(dim=768, n_blocks=2, dec_layers=2):
    """Official segment-anything state_dict naming with (reduced-depth)
    ViT-B shapes."""
    torch.manual_seed(0)
    sd = {}
    g = lambda *s: torch.randn(*s) * 0.02

    sd["image_encoder.patch_embed.proj.weight"] = g(dim, 3, 16, 16)
    sd["image_encoder.patch_embed.proj.bias"] = torch.zeros(dim)
    sd["image_encoder.pos_embed"] = g(1, 64, 64, dim)
    for i in range(n_blocks):
        p = f"image_encoder.blocks.{i}"
        sd[f"{p}.norm1.weight"] = torch.ones(dim)
        sd[f"{p}.norm1.bias"] = torch.zeros(dim)
        sd[f"{p}.norm2.weight"] = torch.ones(dim)
        sd[f"{p}.norm2.bias"] = torch.zeros(dim)
        sd[f"{p}.attn.qkv.weight"] = g(3 * dim, dim)
        sd[f"{p}.attn.qkv.bias"] = torch.zeros(3 * dim)
        sd[f"{p}.attn.proj.weight"] = g(dim, dim)
        sd[f"{p}.attn.proj.bias"] = torch.zeros(dim)
        hd = dim // 12
        sd[f"{p}.attn.rel_pos_h"] = g(27, hd)
        sd[f"{p}.attn.rel_pos_w"] = g(27, hd)
        sd[f"{p}.mlp.lin1.weight"] = g(4 * dim, dim)
        sd[f"{p}.mlp.lin1.bias"] = torch.zeros(4 * dim)
        sd[f"{p}.mlp.lin2.weight"] = g(dim, 4 * dim)
        sd[f"{p}.mlp.lin2.bias"] = torch.zeros(dim)
    sd["image_encoder.neck.0.weight"] = g(256, dim, 1, 1)
    sd["image_encoder.neck.1.weight"] = torch.ones(256)
    sd["image_encoder.neck.1.bias"] = torch.zeros(256)
    sd["image_encoder.neck.2.weight"] = g(256, 256, 3, 3)
    sd["image_encoder.neck.3.weight"] = torch.ones(256)
    sd["image_encoder.neck.3.bias"] = torch.zeros(256)

    sd["prompt_encoder.pe_layer.positional_encoding_gaussian_matrix"] = g(2, 128)
    for i in range(4):
        sd[f"prompt_encoder.point_embeddings.{i}.weight"] = g(1, 256)
    sd["prompt_encoder.not_a_point_embed.weight"] = g(1, 256)
    sd["prompt_encoder.no_mask_embed.weight"] = g(1, 256)

    sd["mask_decoder.iou_token.weight"] = g(1, 256)
    sd["mask_decoder.mask_tokens.weight"] = g(4, 256)
    for i in range(dec_layers):
        p = f"mask_decoder.transformer.layers.{i}"
        for attn, adim in (("self_attn", 256),
                           ("cross_attn_token_to_image", 128),
                           ("cross_attn_image_to_token", 128)):
            sd[f"{p}.{attn}.q_proj.weight"] = g(adim, 256)
            sd[f"{p}.{attn}.q_proj.bias"] = torch.zeros(adim)
            sd[f"{p}.{attn}.k_proj.weight"] = g(adim, 256)
            sd[f"{p}.{attn}.k_proj.bias"] = torch.zeros(adim)
            sd[f"{p}.{attn}.v_proj.weight"] = g(adim, 256)
            sd[f"{p}.{attn}.v_proj.bias"] = torch.zeros(adim)
            sd[f"{p}.{attn}.out_proj.weight"] = g(256, adim)
            sd[f"{p}.{attn}.out_proj.bias"] = torch.zeros(256)
        for j in (1, 2, 3, 4):
            sd[f"{p}.norm{j}.weight"] = torch.ones(256)
            sd[f"{p}.norm{j}.bias"] = torch.zeros(256)
        sd[f"{p}.mlp.lin1.weight"] = g(2048, 256)
        sd[f"{p}.mlp.lin1.bias"] = torch.zeros(2048)
        sd[f"{p}.mlp.lin2.weight"] = g(256, 2048)
        sd[f"{p}.mlp.lin2.bias"] = torch.zeros(256)
    fa = "mask_decoder.transformer.final_attn_token_to_image"
    for proj, a, b in (("q_proj", 128, 256), ("k_proj", 128, 256),
                       ("v_proj", 128, 256), ("out_proj", 256, 128)):
        sd[f"{fa}.{proj}.weight"] = g(a, b)
        sd[f"{fa}.{proj}.bias"] = torch.zeros(a)
    sd["mask_decoder.transformer.norm_final_attn.weight"] = torch.ones(256)
    sd["mask_decoder.transformer.norm_final_attn.bias"] = torch.zeros(256)
    sd["mask_decoder.output_upscaling.0.weight"] = g(256, 64, 2, 2)
    sd["mask_decoder.output_upscaling.0.bias"] = torch.zeros(64)
    sd["mask_decoder.output_upscaling.1.weight"] = torch.ones(64)
    sd["mask_decoder.output_upscaling.1.bias"] = torch.zeros(64)
    sd["mask_decoder.output_upscaling.3.weight"] = g(64, 32, 2, 2)
    sd["mask_decoder.output_upscaling.3.bias"] = torch.zeros(32)
    for j in range(4):
        dims = [(256, 256), (256, 256), (256, 32)]
        for li, (a, b) in enumerate(dims):
            sd[f"mask_decoder.output_hypernetworks_mlps.{j}.layers.{li}.weight"] = g(b, a)
            sd[f"mask_decoder.output_hypernetworks_mlps.{j}.layers.{li}.bias"] = torch.zeros(b)
    for li, (a, b) in enumerate([(256, 256), (256, 256), (256, 4)]):
        sd[f"mask_decoder.iou_prediction_head.layers.{li}.weight"] = g(b, a)
        sd[f"mask_decoder.iou_prediction_head.layers.{li}.bias"] = torch.zeros(b)
    return {k: v.numpy().astype(np.float32) for k, v in sd.items()}


@pytest.fixture(scope="module")
def sam_params(tmp_path_factory):
    sd = _synthetic_sam_sd()
    out = convert_sam(sd)
    path = tmp_path_factory.mktemp("w") / "sam_vit_b.npz"
    np.savez_compressed(path, **out)
    return path


class TestConverterAndForward:
    def test_decoder_shapes_and_finiteness(self, sam_params):
        data = np.load(sam_params)
        params = {k: jnp.asarray(data[k]) for k in data.files}
        emb = jnp.asarray(np.random.RandomState(0).randn(256, 64, 64) * 0.1,
                          jnp.float32)
        pe = S.dense_pe(params)
        boxes = jnp.asarray([[100.0, 200.0, 500.0, 600.0],
                             [0.0, 0.0, 1024.0, 1024.0]])
        sparse = S.encode_boxes(params, boxes)
        assert sparse.shape == (2, 2, 256)
        low, iou = S.mask_decoder_forward(params, emb, pe, sparse)
        assert low.shape == (2, 1, 256, 256) and iou.shape == (2, 1)
        assert np.isfinite(np.asarray(low)).all()
        low3, iou3 = S.mask_decoder_forward(params, emb, pe, sparse,
                                            multimask=True)
        assert low3.shape == (2, 3, 256, 256)

    def test_point_prompts(self, sam_params):
        data = np.load(sam_params)
        params = {k: jnp.asarray(data[k]) for k in data.files}
        pts = jnp.asarray([[[512.0, 512.0]]])
        sparse = S.encode_points(params, pts, jnp.ones((1, 1), jnp.int32))
        assert sparse.shape == (1, 2, 256)
        # Padding slot uses the not-a-point embedding.
        sparse_pad = S.encode_points(
            params, pts, -jnp.ones((1, 1), jnp.int32)
        )
        np.testing.assert_allclose(
            np.asarray(sparse_pad[0, 0]),
            np.asarray(params["prompt.not_a_point"]), atol=1e-6,
        )

    def test_encoder_runs_small(self, sam_params):
        data = np.load(sam_params)
        params = {k: jnp.asarray(data[k]) for k in data.files}
        img = jnp.asarray(
            np.random.RandomState(0).rand(1024, 1024, 3), jnp.float32
        )
        emb = S.sam_encoder_forward(params, img)
        assert emb.shape == (256, 64, 64)
        assert np.isfinite(np.asarray(emb)).all()


class TestPredictor:
    def test_box_and_auto_paths(self, sam_params, monkeypatch):
        monkeypatch.setenv("COLLAB_SPLATS_WEIGHTS", str(sam_params.parent))
        from collab_splats_tpu.features.sam_predictor import (
            SamBackend, sam_available,
        )

        assert sam_available()
        backend = SamBackend()
        img = (np.random.RandomState(1).rand(96, 128, 3) * 255).astype(np.uint8)
        res = backend.segment_boxes(
            img, np.array([[10.0, 10.0, 60.0, 60.0]])
        )
        for r in res:
            assert r["segmentation"].shape == (96, 128)
            assert r["area"] > 0
        auto = backend.auto_segment(img, points_per_side=4,
                                    pred_iou_thresh=-1e9,
                                    stability_thresh=0.0, min_area=1)
        assert isinstance(auto, list)
