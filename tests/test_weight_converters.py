"""Converter + architecture golden tests against torch (offline).

Strategy (VERDICT round-1, Missing #1): no checkpoints can be downloaded
here, so we build *synthetic* torch modules with the official state_dict
naming (timm/DINOv2 ``blocks.N.attn.qkv`` layout, CLIP
``transformer.resblocks.N.attn.in_proj_weight`` layout, torchvision VGG16
``features.N``), run the torch forward, convert the state_dict with
scripts/convert_weights.py, and require the JAX towers to reproduce the
torch outputs.  This pins every transpose, LayerScale, QuickGELU, causal
mask, pos-embed-interp and MaskCLIP-head detail the real weights rely on.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
from convert_weights import (  # noqa: E402
    convert_clip,
    convert_dinov2,
    convert_vgg16,
)

import jax.numpy as jnp  # noqa: E402

from collab_splats_tpu.features import vit  # noqa: E402

DIM, HEADS, BLOCKS, PATCH = 64, 4, 2, 14


# ------------------------------------------------------- torch references
class TorchDinoBlock(nn.Module):
    """timm/DINOv2 block: pre-norm attn + MLP, LayerScale on both."""

    def __init__(self, dim, heads):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.attn = nn.ModuleDict()
        self.qkv = nn.Linear(dim, dim * 3)
        self.proj = nn.Linear(dim, dim)
        self.fc1 = nn.Linear(dim, dim * 4)
        self.fc2 = nn.Linear(dim * 4, dim)
        self.ls1 = nn.Parameter(torch.full((dim,), 1e-5))
        self.ls2 = nn.Parameter(torch.full((dim,), 1e-5))
        self.heads = heads

    def forward(self, x):
        t, d = x.shape
        h = self.norm1(x)
        qkv = self.qkv(h).reshape(t, 3, self.heads, d // self.heads)
        q, k, v = qkv.unbind(1)
        att = torch.einsum("qhd,khd->hqk", q, k) / np.sqrt(d // self.heads)
        att = att.softmax(-1)
        o = torch.einsum("hqk,khd->qhd", att, v).reshape(t, d)
        x = x + self.ls1 * self.proj(o)
        h = self.norm2(x)
        x = x + self.ls2 * self.fc2(F.gelu(self.fc1(h)))
        return x

    def state_dict_official(self, i):
        sd = {}
        sd[f"blocks.{i}.norm1.weight"] = self.norm1.weight
        sd[f"blocks.{i}.norm1.bias"] = self.norm1.bias
        sd[f"blocks.{i}.norm2.weight"] = self.norm2.weight
        sd[f"blocks.{i}.norm2.bias"] = self.norm2.bias
        sd[f"blocks.{i}.attn.qkv.weight"] = self.qkv.weight
        sd[f"blocks.{i}.attn.qkv.bias"] = self.qkv.bias
        sd[f"blocks.{i}.attn.proj.weight"] = self.proj.weight
        sd[f"blocks.{i}.attn.proj.bias"] = self.proj.bias
        sd[f"blocks.{i}.mlp.fc1.weight"] = self.fc1.weight
        sd[f"blocks.{i}.mlp.fc1.bias"] = self.fc1.bias
        sd[f"blocks.{i}.mlp.fc2.weight"] = self.fc2.weight
        sd[f"blocks.{i}.mlp.fc2.bias"] = self.fc2.bias
        sd[f"blocks.{i}.ls1.gamma"] = self.ls1
        sd[f"blocks.{i}.ls2.gamma"] = self.ls2
        return sd


def _np(sd):
    return {k: v.detach().numpy().astype(np.float32) for k, v in sd.items()}


class TestDINOv2Converter:
    def _build(self, grid=5):
        torch.manual_seed(0)
        blocks = [TorchDinoBlock(DIM, HEADS) for _ in range(BLOCKS)]
        conv = nn.Conv2d(3, DIM, PATCH, PATCH)
        norm = nn.LayerNorm(DIM)
        cls_token = torch.randn(1, 1, DIM) * 0.02
        pos = torch.randn(1, 1 + grid * grid, DIM) * 0.02
        sd = {
            "patch_embed.proj.weight": conv.weight,
            "patch_embed.proj.bias": conv.bias,
            "cls_token": cls_token,
            "pos_embed": pos,
            "norm.weight": norm.weight,
            "norm.bias": norm.bias,
        }
        for i, b in enumerate(blocks):
            sd.update(b.state_dict_official(i))
        return blocks, conv, norm, cls_token, pos, _np(sd)

    def test_forward_parity(self):
        grid = 5
        blocks, conv, norm, cls_token, pos, sd = self._build(grid)
        params = {k: jnp.asarray(v) for k, v in convert_dinov2(sd).items()}

        h = w = grid * PATCH
        img = torch.rand(1, 3, h, w)
        with torch.no_grad():
            x = conv(img).flatten(2).transpose(1, 2)[0]      # [T, D]
            x = torch.cat([cls_token[0], x], dim=0)
            x = x + pos[0]
            for b in blocks:
                x = b(x)
            want = norm(x)[1:].numpy()

        got = np.asarray(
            vit.dinov2_forward(
                params, jnp.asarray(img[0].permute(1, 2, 0).numpy()),
                HEADS, PATCH,
            )
        )
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_pos_embed_interpolated_grid(self):
        _, _, _, _, _, sd = self._build(grid=5)
        params = {k: jnp.asarray(v) for k, v in convert_dinov2(sd).items()}
        img = jnp.asarray(np.random.rand(3 * PATCH, 7 * PATCH, 3), jnp.float32)
        out = vit.dinov2_forward(params, img, HEADS, PATCH)
        assert out.shape == (3 * 7, DIM)
        assert np.isfinite(np.asarray(out)).all()


class TestCLIPConverter:
    def _tower_sd(self, prefix, n_blocks, dim, seed):
        """Official CLIP resblock state_dict (nn.MultiheadAttention naming)."""
        torch.manual_seed(seed)
        mods = []
        sd = {}
        for i in range(n_blocks):
            ln1, ln2 = nn.LayerNorm(dim), nn.LayerNorm(dim)
            attn = nn.MultiheadAttention(dim, dim // 16)
            fc = nn.Linear(dim, dim * 4)
            proj = nn.Linear(dim * 4, dim)
            mods.append((ln1, ln2, attn, fc, proj))
            base = f"{prefix}.resblocks.{i}"
            sd[f"{base}.ln_1.weight"] = ln1.weight
            sd[f"{base}.ln_1.bias"] = ln1.bias
            sd[f"{base}.ln_2.weight"] = ln2.weight
            sd[f"{base}.ln_2.bias"] = ln2.bias
            sd[f"{base}.attn.in_proj_weight"] = attn.in_proj_weight
            sd[f"{base}.attn.in_proj_bias"] = attn.in_proj_bias
            sd[f"{base}.attn.out_proj.weight"] = attn.out_proj.weight
            sd[f"{base}.attn.out_proj.bias"] = attn.out_proj.bias
            sd[f"{base}.mlp.c_fc.weight"] = fc.weight
            sd[f"{base}.mlp.c_fc.bias"] = fc.bias
            sd[f"{base}.mlp.c_proj.weight"] = proj.weight
            sd[f"{base}.mlp.c_proj.bias"] = proj.bias
        return mods, sd

    def _full_sd(self, grid=4, dim=DIM, tdim=32, vocab=64, ctx=12):
        vis_mods, sd = self._tower_sd("visual.transformer", BLOCKS, dim, 0)
        txt_mods, tsd = self._tower_sd("transformer", BLOCKS, tdim, 1)
        sd.update(tsd)
        torch.manual_seed(2)
        conv = nn.Conv2d(3, dim, PATCH, PATCH, bias=False)
        sd["visual.conv1.weight"] = conv.weight
        sd["visual.class_embedding"] = torch.randn(dim) * 0.02
        sd["visual.positional_embedding"] = torch.randn(1 + grid * grid, dim) * 0.02
        for nm in ("ln_pre", "ln_post"):
            ln = nn.LayerNorm(dim)
            sd[f"visual.{nm}.weight"] = ln.weight
            sd[f"visual.{nm}.bias"] = ln.bias
        sd["visual.proj"] = torch.randn(dim, 48) * 0.02
        sd["token_embedding.weight"] = torch.randn(vocab, tdim) * 0.02
        sd["positional_embedding"] = torch.randn(ctx, tdim) * 0.01
        lnf = nn.LayerNorm(tdim)
        sd["ln_final.weight"] = lnf.weight
        sd["ln_final.bias"] = lnf.bias
        sd["text_projection"] = torch.randn(tdim, 48) * 0.02
        return vis_mods, txt_mods, conv, _np(sd)

    @staticmethod
    def _torch_block(mods, x, causal=False):
        ln1, ln2, attn, fc, proj = mods
        h = ln1(x)
        mask = None
        if causal:
            t = x.shape[0]
            mask = torch.full((t, t), float("-inf")).triu(1)
        o, _ = attn(h, h, h, need_weights=False, attn_mask=mask)
        x = x + o
        h = fc(ln2(x))
        x = x + proj(h * torch.sigmoid(1.702 * h))   # QuickGELU
        return x

    def test_visual_parity_maskclip_head(self):
        grid = 4
        vis_mods, _, conv, sd = self._full_sd(grid=grid)
        params = {k: jnp.asarray(v) for k, v in convert_clip(sd).items()}
        h = w = grid * PATCH
        img = torch.rand(1, 3, h, w)
        with torch.no_grad():
            x = conv(img).flatten(2).transpose(1, 2)[0]
            x = torch.cat([torch.as_tensor(sd["visual.class_embedding"])[None], x])
            x = x + torch.as_tensor(sd["visual.positional_embedding"])
            x = F.layer_norm(
                x, (DIM,), torch.as_tensor(sd["visual.ln_pre.weight"]),
                torch.as_tensor(sd["visual.ln_pre.bias"]),
            )
            for mods in vis_mods[:-1]:
                x = self._torch_block(mods, x)
            # MaskCLIP head on the final block.
            ln1, ln2, attn, fc, proj = vis_mods[-1]
            hln = ln1(x)
            wv = attn.in_proj_weight[2 * DIM:]
            bv = attn.in_proj_bias[2 * DIM:]
            v = F.linear(hln, wv, bv)
            x = x + attn.out_proj(v)
            hln = ln2(x)
            hln = fc(hln)
            x = x + proj(hln * torch.sigmoid(1.702 * hln))
            x = F.layer_norm(
                x, (DIM,), torch.as_tensor(sd["visual.ln_post.weight"]),
                torch.as_tensor(sd["visual.ln_post.bias"]),
            )
            want = (x @ torch.as_tensor(sd["visual.proj"]))[1:].numpy()

        got = np.asarray(
            vit.maskclip_forward(
                params, jnp.asarray(img[0].permute(1, 2, 0).numpy()),
                HEADS, PATCH,
            )
        )
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)

    def test_text_parity_causal_eot(self):
        _, txt_mods, _, sd = self._full_sd()
        params = {k: jnp.asarray(v) for k, v in convert_clip(sd).items()}
        tokens = torch.tensor([5, 17, 30, 63, 0, 0, 0, 0])  # 63 = max = EOT slot
        with torch.no_grad():
            x = torch.as_tensor(sd["token_embedding.weight"])[tokens]
            x = x + torch.as_tensor(sd["positional_embedding"])[: len(tokens)]
            for mods in txt_mods:
                x = self._torch_block(mods, x, causal=True)
            x = F.layer_norm(
                x, (32,), torch.as_tensor(sd["ln_final.weight"]),
                torch.as_tensor(sd["ln_final.bias"]),
            )
            want = (x[3] @ torch.as_tensor(sd["text_projection"])).numpy()

        got = np.asarray(
            vit.clip_text_forward(params, jnp.asarray(tokens.numpy()), 2)
        )
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-5)


class TestVGG16Converter:
    def test_vgg_converter_shapes_and_metric(self, tmp_path, monkeypatch):
        # Synthetic VGG16 `features` state_dict with torchvision naming.
        cfg = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
               (256, 256), (256, 256), (256, 512), (512, 512), (512, 512),
               (512, 512), (512, 512), (512, 512)]
        idxs = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
        torch.manual_seed(0)
        sd = {}
        for (ci, co), idx in zip(cfg, idxs):
            sd[f"features.{idx}.weight"] = torch.randn(co, ci, 3, 3) * 0.05
            sd[f"features.{idx}.bias"] = torch.zeros(co)
        out = convert_vgg16(_np(sd))
        assert out["conv0.w"].shape == (64, 3, 3, 3)
        assert out["lin4"].shape == (512,)
        wdir = tmp_path / "weights"
        wdir.mkdir()
        np.savez_compressed(wdir / "vgg16_lpips.npz", **out)
        monkeypatch.setenv("COLLAB_SPLATS_WEIGHTS", str(wdir))

        from collab_splats_tpu.utils import lpips as lp

        lp._load_params.cache_clear()
        assert lp.lpips_available()
        a = np.random.RandomState(0).rand(64, 64, 3).astype(np.float32)
        b = np.clip(a + 0.2 * np.random.RandomState(1).rand(64, 64, 3), 0, 1)
        d_same = lp.lpips(a, a)
        d_diff = lp.lpips(a, b.astype(np.float32))
        assert d_same < 1e-6
        assert d_diff > d_same
        lp._load_params.cache_clear()


class TestExtractorGating:
    def test_offline_extractors_run(self):
        from collab_splats_tpu.features.extractors import get_extractor

        img = np.random.RandomState(0).rand(100, 140, 3).astype(np.float32)
        for name in ("dinov2", "samclip"):
            ex = get_extractor(name)
            assert not ex.pretrained
            f = ex(img)
            assert f.ndim == 3 and f.shape[0] == ex.feature_dim
            assert np.isfinite(f).all()
        emb = get_extractor("samclip").encode_text(["a chair", "a table"])
        assert emb.shape[0] == 2
        np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, rtol=1e-5)

    def test_weights_gate_switches_to_pretrained(self, tmp_path, monkeypatch):
        from collab_splats_tpu.features import vit
        from collab_splats_tpu.features.extractors import DINOv2Extractor

        params = vit.init_dinov2_params(
            __import__("jax").random.PRNGKey(3), dim=32, n_blocks=2, grid=4
        )
        wdir = tmp_path / "w"
        wdir.mkdir()
        np.savez_compressed(
            wdir / "dinov2_vits14.npz",
            **{k: np.asarray(v) for k, v in params.items()},
        )
        monkeypatch.setenv("COLLAB_SPLATS_WEIGHTS", str(wdir))
        ex = DINOv2Extractor(feature_dim=32, num_heads=2)
        assert ex.pretrained
        f = ex(np.random.rand(60, 60, 3).astype(np.float32))
        assert f.shape[0] == 32


def test_bicubic_pos_embed_matches_torch():
    """interpolate_pos_embed must reproduce torch's bicubic kernel
    (a=-0.75, align_corners=False) — the interpolated path runs on every
    real-weights forward (DINOv2 800px, CLIP 1024px)."""
    torch = pytest.importorskip("torch")
    import numpy as np
    from collab_splats_tpu.features.vit import _torch_bicubic_matrix

    x = np.random.RandomState(0).randn(1, 5, 24, 24).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(73, 57), mode="bicubic",
        align_corners=False,
    ).numpy()
    wh = _torch_bicubic_matrix(24, 73)
    ww = _torch_bicubic_matrix(24, 57)
    got = np.einsum("hg,bcgk,wk->bchw", wh, x, ww)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
