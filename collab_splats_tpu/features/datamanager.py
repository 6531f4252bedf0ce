"""Feature-splatting datamanager: extract-once, cache, serve per-camera
feature batches.

Behavioral equivalent of ``FeatureSplattingDataManager``
(/root/reference/collab_splats/datamanagers/features_datamanager.py):

* at setup, run every registered extractor over every training image once
  (offline ANN inference), downsampling feature maps to a bounded
  resolution (``final_resolution``, reference default 64, :57-60);
* cache the stack to disk keyed by the exact image-filename list so edits
  invalidate it (:99-123);
* serve ``features_dict`` (branch -> [C, h, w]) alongside each image batch
  (:308-340) and expose ``feature_type`` / ``feature_dims`` metadata for the
  model (consumed at rade_features_model.py:96-108).
"""

from __future__ import annotations

import dataclasses
import hashlib
import json
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..data.datamanager import FullImageDatamanager
from .extractors import BaseExtractor, get_extractor


@dataclasses.dataclass
class FeatureDatamanagerConfig:
    feature_type: str = "clip-vit"          # the main (queryable) branch
    extractors: Tuple[str, ...] = ("clip-vit", "dinov2")
    final_resolution: int = 64              # cap on feature-map long edge
    cache_dir: Optional[str] = None

    def __post_init__(self):
        # Accept a comma-separated string (dot-notation CLI overrides).
        if isinstance(self.extractors, str):
            self.extractors = tuple(
                s.strip() for s in self.extractors.split(",") if s.strip()
            )


def _resize_chw(feat: np.ndarray, max_edge: int) -> np.ndarray:
    c, h, w = feat.shape
    scale = max_edge / max(h, w)
    if scale >= 1.0:
        return feat
    import jax
    import jax.numpy as jnp

    th, tw = max(int(h * scale), 1), max(int(w * scale), 1)
    return np.asarray(
        jax.image.resize(jnp.asarray(feat), (c, th, tw), "linear")
    )


class FeatureDatamanager(FullImageDatamanager):
    """FullImageDatamanager + per-image feature maps."""

    def __init__(self, base: FullImageDatamanager,
                 config: FeatureDatamanagerConfig,
                 image_names: Optional[Sequence[str]] = None):
        super().__init__(**base.__dict__)
        self.feature_config = config
        self._extractors: Dict[str, BaseExtractor] = {
            name: get_extractor(name) for name in config.extractors
        }
        self.image_names = list(image_names or
                                [str(i) for i in range(len(self.train_images))])
        self.train_features: List[Dict[str, np.ndarray]] = []
        self.feature_dims: Dict[str, Tuple[int, int, int]] = {}
        self._setup_features()

    # ------------------------------------------------------------- caching
    def _cache_path(self) -> Optional[Path]:
        if self.feature_config.cache_dir is None:
            return None
        # The key must identify the extractor *variant*, not just its name:
        # dropping converted weights into weights/ flips an extractor from
        # the offline fallback to the released tower (different dims AND
        # different values), and a stale cache would be served silently.
        variants = sorted(
            (name, bool(getattr(ext, "pretrained", False)),
             int(getattr(ext, "feature_dim", 0)))
            for name, ext in self._extractors.items()
        )
        key = hashlib.sha256(
            json.dumps(
                [self.image_names, variants,
                 self.feature_config.final_resolution]
            ).encode()
        ).hexdigest()[:16]
        d = Path(self.feature_config.cache_dir)
        d.mkdir(parents=True, exist_ok=True)
        return d / f"features_{self.feature_config.feature_type}_{key}.npz"

    def _setup_features(self):
        cache = self._cache_path()
        if cache is not None and cache.exists():
            data = np.load(cache, allow_pickle=False)
            n = len(self.train_images)
            self.train_features = [
                {
                    name: data[f"{name}_{i}"]
                    for name in self.feature_config.extractors
                }
                for i in range(n)
            ]
        else:
            self.train_features = []
            for img in self.train_images:
                fmap = {}
                for name, ext in self._extractors.items():
                    f = ext(np.asarray(img, np.float32) / 255.0)
                    fmap[name] = _resize_chw(
                        f, self.feature_config.final_resolution
                    ).astype(np.float32)
                self.train_features.append(fmap)
            if cache is not None:
                payload = {
                    f"{name}_{i}": fm[name]
                    for i, fm in enumerate(self.train_features)
                    for name in fm
                }
                np.savez_compressed(cache, **payload)
        self.feature_dims = {
            name: tuple(self.train_features[0][name].shape)
            for name in self.feature_config.extractors
        }

    # ------------------------------------------------------------- serving
    def next_train(self, step: int, rng: np.random.RandomState):
        idx = int(rng.randint(len(self.train_cameras)))
        batch = self._batch(self.train_images[idx])
        batch["features_dict"] = self.train_features[idx]
        return self.train_cameras[idx], batch, idx

    def metadata(self) -> Dict:
        """The metadata dict the features model consumes
        (rade_features_model.py:96-108)."""
        return {
            "feature_type": self.feature_config.feature_type,
            "feature_dims": self.feature_dims,
        }

    def text_encoder(self) -> Optional[BaseExtractor]:
        main = self._extractors.get(self.feature_config.feature_type)
        return main
