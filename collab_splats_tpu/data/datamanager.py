"""Full-image datamanager: cached images + per-step (camera, batch) feed.

Behavioral replacement for nerfstudio's ``FullImageDatamanager`` as the
reference configures it (configs/rade_gs_method.py:33-36,
``cache_images_type="uint8"``): all training images are decoded once and
cached (uint8 to bound host memory), one full image + camera is served per
step.  The feature variant (SURVEY.md §2a #4) layers feature maps on top —
see features/datamanager.py.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..core.cameras import Camera
from .dataparser import parse_transforms_json


@dataclasses.dataclass
class FullImageDatamanager:
    train_cameras: List[Camera]
    eval_cameras: List[Camera]
    train_images: List[np.ndarray]     # uint8 [H, W, 3]
    eval_images: List[np.ndarray]
    points: Optional[np.ndarray] = None
    point_colors: Optional[np.ndarray] = None
    scene_scale: float = 1.0

    @classmethod
    def from_transforms_json(
        cls,
        path: str | Path,
        downscale_factor: int = 1,
        train_split_fraction: float = 0.9,
    ) -> "FullImageDatamanager":
        scene = parse_transforms_json(
            path, downscale_factor, train_split_fraction
        )
        # Decode + resize straight to the uint8 cache (load_image's
        # float32 [0,1] output would just be converted back, allocating a
        # transient float frame per image for nothing).
        def load(p):
            from PIL import Image

            img = Image.open(p).convert("RGB")
            if downscale_factor > 1:
                img = img.resize(
                    (img.width // downscale_factor,
                     img.height // downscale_factor),
                    Image.BILINEAR,
                )
            return np.asarray(img, np.uint8)
        return cls(
            train_cameras=scene.train_cameras,
            eval_cameras=scene.eval_cameras,
            train_images=[load(p) for p in scene.train_image_paths],
            eval_images=[load(p) for p in scene.eval_image_paths],
            points=scene.points,
            point_colors=scene.point_colors,
            scene_scale=scene.scene_scale,
        )

    def __len__(self) -> int:
        return len(self.train_cameras)

    def next_train(self, step: int, rng: np.random.RandomState) -> Tuple[
        Camera, Dict[str, np.ndarray], int
    ]:
        idx = int(rng.randint(len(self.train_cameras)))
        return self.train_cameras[idx], self._batch(self.train_images[idx]), idx

    def next_eval(self, idx: int) -> Tuple[Camera, Dict[str, np.ndarray]]:
        return self.eval_cameras[idx], self._batch(self.eval_images[idx])

    @staticmethod
    def _batch(image: np.ndarray) -> Dict[str, np.ndarray]:
        return {"image": image.astype(np.float32) / 255.0}
