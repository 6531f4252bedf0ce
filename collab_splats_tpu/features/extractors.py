"""ANN feature extractors: registry + JAX ViT encoders.

TPU-native replacement for the reference's extractor stack
(/root/reference/collab_splats/utils/features.py:123-400): a name ->
extractor registry ("clip-vit"/"samclip" MaskCLIP patch features with a text
encoder, "dinov2" DINOv2 patch features), used offline by the feature
datamanager (SURVEY.md §2a #4, #6).

Weights: the upstream extractors pull CLIP / DINOv2 checkpoints from the
hub; this environment has no egress, so each ViT here is architecture-
complete flax-style JAX with ``load_weights(npz)`` hooks, and the registry
additionally ships a deterministic ``hash-proj`` extractor (multi-scale
random-projection patch features) so the full distillation pipeline runs —
and is tested — end-to-end without downloads.  Drop released weight files
under ``weights/`` to switch the registry to real CLIP/DINO features; the
pipeline is agnostic to which extractor produced the maps.
"""

from __future__ import annotations

import dataclasses
import functools
import hashlib
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_REGISTRY: Dict[str, Callable[..., "BaseExtractor"]] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


@functools.lru_cache(maxsize=None)
def _default_extractor(name: str) -> "BaseExtractor":
    return _REGISTRY[name]()


def get_extractor(name: str, **kw) -> "BaseExtractor":
    if name not in _REGISTRY:
        raise ValueError(
            f"Unknown extractor '{name}'. Available: {sorted(_REGISTRY)}"
        )
    if not kw:
        # Default-config extractors are cached: with released weights
        # present, constructing e.g. the CLIP tower re-reads and uploads
        # ~1.2 GB per call (query_mesh used to pay this per text query).
        return _default_extractor(name)
    return _REGISTRY[name](**kw)


def available_extractors():
    return sorted(_REGISTRY)


class BaseExtractor:
    """Extractor interface: image [H, W, 3] in [0,1] -> features [C, h, w]."""

    feature_dim: int = 0
    patch_size: int = 14

    def __call__(self, image: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def encode_text(self, texts) -> Optional[np.ndarray]:
        """[N, C] unit embeddings, or None if no text tower."""
        return None


def _prep_image(image, resolution, patch_size, mean, std):
    """Resize longest edge to ``resolution``, snap to patch multiples,
    normalize.  Returns (img [th, tw, 3], ph, pw).

    Mirrors the reference's two-stage chain exactly (features.py:51-99:
    PIL BILINEAR longest-edge resize, then ``F.interpolate(bilinear,
    align_corners=False)`` down to patch multiples): one direct resize
    differs by up to ~0.5 normalized units at hard edges, which shifts
    released-weight features (scripts/feature_goldens.py --prep-parity
    pins this against the torch chain).  Stage 1 antialiases like PIL;
    stage 2 does not, like F.interpolate's default."""
    img = np.asarray(image, np.float32)
    h, w = img.shape[:2]
    scale = resolution / max(h, w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    th = max(nh // patch_size, 1) * patch_size
    tw = max(nw // patch_size, 1) * patch_size
    x = jax.image.resize(jnp.asarray(img), (nh, nw, 3), "linear",
                         antialias=True)
    if (nh, nw) != (th, tw):
        x = jax.image.resize(x, (th, tw, 3), "linear", antialias=False)
    img = np.asarray(x)
    img = (img - np.asarray(mean)) / np.asarray(std)
    return img, th // patch_size, tw // patch_size


@register("dinov2")
@dataclasses.dataclass
class DINOv2Extractor(BaseExtractor):
    """DINOv2 patch features (reference features.py:336-400, torchhub
    ``dinov2_vits14``, resolution 800, ``x_norm_patchtokens`` output).

    With converted weights (``weights/dinov2_vits14.npz`` — see
    scripts/convert_weights.py) this runs the released 12-block ViT-S/14;
    offline it runs the same architecture (CLS + interpolated pos embed +
    LayerScale) at ``offline_blocks`` random-init blocks so the distillation
    pipeline stays exercisable without downloads.
    """

    feature_dim: int = 384
    patch_size: int = 14
    num_heads: int = 6
    resolution: int = 800
    offline_blocks: int = 4
    weights_npz: Optional[str] = None
    mean: Tuple[float, ...] = (0.5, 0.5, 0.5)
    std: Tuple[float, ...] = (0.5, 0.5, 0.5)

    def __post_init__(self):
        from . import vit, weights as wdisc

        path = self.weights_npz or wdisc.find_weights("dinov2_vits14.npz")
        if path:
            data = np.load(path)
            self.params = {k: jnp.asarray(data[k]) for k in data.files}
            self.pretrained = True
            # Derive width/heads from the checkpoint when it disagrees with
            # the configured width (head_dim is 64 for every released
            # DINOv2 size): trusting the dataclass defaults would silently
            # mis-group attention heads for vitb/vitl conversions.
            ckpt_dim = int(self.params["cls_token"].shape[-1])
            if ckpt_dim != self.feature_dim:
                self.feature_dim = ckpt_dim
                self.num_heads = max(ckpt_dim // 64, 1)
        else:
            self.params = vit.init_dinov2_params(
                jax.random.PRNGKey(0), self.feature_dim,
                self.offline_blocks, self.patch_size,
            )
            self.pretrained = False
        self._fwd = jax.jit(
            lambda img: vit.dinov2_forward(
                self.params, img, self.num_heads, self.patch_size
            )
        )

    def __call__(self, image: np.ndarray) -> np.ndarray:
        img, ph, pw = _prep_image(
            image, self.resolution, self.patch_size, self.mean, self.std
        )
        feats = self._fwd(jnp.asarray(img))              # [ph*pw, D]
        return np.asarray(feats).reshape(ph, pw, -1).transpose(2, 0, 1)


@register("clip-vit")
@register("samclip")
@dataclasses.dataclass
class MaskCLIPExtractor(BaseExtractor):
    """MaskCLIP dense CLIP features + CLIP text tower (reference
    features.py:148-267, maskclip_onnx "ViT-L/14@336px", resolution 1024).

    With converted weights (``weights/clip_vitl14_336.npz``) this runs the
    released 24-block ViT-L/14 visual tower with the MaskCLIP value-path
    head and the 12-block text transformer (BPE tokenizer gated on the
    standard CLIP vocab file — see features/clip_tokenizer.py).  Offline it
    runs the same architecture at reduced width/depth with random init, and
    text falls back to deterministic seeded projections so the similarity
    pipeline stays testable end-to-end.
    """

    feature_dim: int = 768      # joint embed dim (what downstream consumes)
    patch_size: int = 14
    resolution: int = 1024
    weights_npz: Optional[str] = None
    offline_width: int = 192
    offline_blocks: int = 3
    mean: Tuple[float, ...] = (0.485, 0.456, 0.406)
    std: Tuple[float, ...] = (0.229, 0.224, 0.225)

    def __post_init__(self):
        from . import vit, weights as wdisc

        path = self.weights_npz or wdisc.find_weights("clip_vitl14_336.npz")
        if path:
            data = np.load(path)
            self.params = {k: jnp.asarray(data[k]) for k in data.files}
            self.pretrained = True
            width = self.params["visual.ln_pre.scale"].shape[0]
            self.num_heads = width // 64
            self.text_heads = self.params["text.ln_final.scale"].shape[0] // 64
            self.feature_dim = int(self.params["visual.proj"].shape[1])
        else:
            w = self.offline_width
            self.params = {
                **vit.init_clip_visual_params(
                    jax.random.PRNGKey(0), dim=w,
                    n_blocks=self.offline_blocks,
                    patch_size=self.patch_size, embed_dim=self.feature_dim,
                ),
                **vit.init_clip_text_params(
                    jax.random.PRNGKey(1), dim=w,
                    n_blocks=self.offline_blocks, vocab=512,
                    embed_dim=self.feature_dim,
                ),
            }
            self.pretrained = False
            self.num_heads = max(w // 64, 1)
            self.text_heads = max(w // 64, 1)
        self._fwd = jax.jit(
            lambda img: vit.maskclip_forward(
                self.params, img, self.num_heads, self.patch_size
            )
        )
        self._txt = jax.jit(
            lambda toks: vit.clip_text_forward(
                self.params, toks, self.text_heads
            )
        )

    def __call__(self, image: np.ndarray) -> np.ndarray:
        img, ph, pw = _prep_image(
            image, self.resolution, self.patch_size, self.mean, self.std
        )
        feats = self._fwd(jnp.asarray(img))              # [ph*pw, E]
        return np.asarray(feats).reshape(ph, pw, -1).transpose(2, 0, 1)

    def encode_text(self, texts) -> np.ndarray:
        from .clip_tokenizer import get_tokenizer

        tok = get_tokenizer() if self.pretrained else None
        if tok is not None:
            out = []
            for t in texts:
                ids = jnp.asarray(tok.encode(t, context_length=77))
                v = np.asarray(self._txt(ids))
                out.append(v / np.linalg.norm(v))
            return np.stack(out).astype(np.float32)
        # Deterministic offline fallback: seeded unit projections.
        out = []
        for t in texts:
            seed = int.from_bytes(
                hashlib.sha256(t.encode()).digest()[:4], "little"
            )
            v = np.asarray(
                jax.random.normal(jax.random.PRNGKey(seed), (self.feature_dim,))
            )
            out.append(v / np.linalg.norm(v))
        return np.stack(out).astype(np.float32)


@register("hash-proj")
@dataclasses.dataclass
class HashProjectionExtractor(BaseExtractor):
    """Deterministic, download-free extractor: multi-scale average-pooled
    color statistics passed through a fixed random projection.  Stands in
    for CLIP/DINO in offline tests of the full distillation + query path."""

    feature_dim: int = 64
    patch_size: int = 8
    resolution: int = 256

    def __post_init__(self):
        rng = np.random.RandomState(0)
        self._proj = rng.randn(27, self.feature_dim).astype(np.float32)
        self._proj /= np.linalg.norm(self._proj, axis=0, keepdims=True)

    def __call__(self, image: np.ndarray) -> np.ndarray:
        img = np.asarray(image, np.float32)
        h, w = img.shape[:2]
        ph, pw = max(h // self.patch_size, 1), max(w // self.patch_size, 1)
        img = img[: ph * self.patch_size, : pw * self.patch_size]
        cells = img.reshape(ph, self.patch_size, pw, self.patch_size, 3)
        mean = cells.mean((1, 3))
        std = cells.std((1, 3))
        mx = cells.max((1, 3))
        stats = np.concatenate([mean, std, mx], -1)      # [ph, pw, 9]
        # Add two pooled context scales.
        pool = stats.reshape(ph, pw, 9)
        ctx = pool.mean((0, 1), keepdims=True) * np.ones_like(pool)
        row = pool.mean(1, keepdims=True) * np.ones_like(pool)
        feats = np.concatenate([pool, row, ctx], -1) @ self._proj
        return feats.transpose(2, 0, 1).astype(np.float32)

    def encode_text(self, texts) -> np.ndarray:
        rng_vecs = []
        for t in texts:
            seed = int.from_bytes(
                hashlib.sha256(t.encode()).digest()[:4], "little"
            )
            v = np.random.RandomState(seed).randn(self.feature_dim)
            rng_vecs.append(v / np.linalg.norm(v))
        return np.stack(rng_vecs).astype(np.float32)
