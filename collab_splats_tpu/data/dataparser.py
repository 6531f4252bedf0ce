"""`transforms.json` dataparser — the SfM-output contract.

TPU-native re-derivation of nerfstudio's ``NerfstudioDataParser`` as used by
the reference (configs/rade_gs_method.py:33-35, ``load_3D_points=True``):
parse the ``transforms.json`` written by the preprocessing stage (COLMAP /
hloc via ``ns-process-data``, SURVEY.md §2b N3/N4), build cameras, apply the
standard pose normalization (auto-orient "up", center, scale into the unit
box), split train/eval, and load the SfM point cloud for initialization.

The preprocessing stage itself stays an external subprocess exactly as in
the reference (the reference also only shells out); the synthetic generator
in data/synthetic.py provides the same contract for tests.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np

from ..core.cameras import Camera, make_camera
from .ply import read_ply


@dataclasses.dataclass
class ParsedScene:
    train_cameras: List[Camera]
    eval_cameras: List[Camera]
    train_image_paths: List[Path]
    eval_image_paths: List[Path]
    points: Optional[np.ndarray]         # [N, 3] normalized world
    point_colors: Optional[np.ndarray]   # [N, 3] in [0, 1]
    transform: np.ndarray                # [4, 4] applied world transform
    scale: float                         # applied scale factor
    scene_scale: float                   # camera extent after normalization


def _auto_orient_and_center(poses: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Rotate the average up vector to +z and center on the mean camera
    origin (nerfstudio ``auto_orient_and_center_poses(method="up")``)."""
    up = poses[:, :3, 1].mean(axis=0)
    up /= np.linalg.norm(up) + 1e-12
    z = np.array([0.0, 0.0, 1.0])
    v = np.cross(up, z)
    s = np.linalg.norm(v)
    c = float(np.dot(up, z))
    if s < 1e-8:
        R = np.eye(3) if c > 0 else np.diag([1.0, -1.0, -1.0])
    else:
        vx = np.array(
            [[0, -v[2], v[1]], [v[2], 0, -v[0]], [-v[1], v[0], 0]]
        )
        R = np.eye(3) + vx + vx @ vx * ((1 - c) / (s * s))
    center = (R @ poses[:, :3, 3].mean(axis=0))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = -center
    return T, (T[None] @ poses)


def parse_transforms_json(
    path: str | Path,
    downscale_factor: int = 1,
    train_split_fraction: float = 0.9,
    auto_scale: bool = True,
    orient_center: bool = True,
) -> ParsedScene:
    """Parse a nerfstudio-format ``transforms.json``."""
    path = Path(path)
    root = path.parent
    with open(path) as f:
        meta = json.load(f)

    frames = sorted(meta["frames"], key=lambda fr: fr["file_path"])
    poses = []
    intrinsics = []
    image_paths = []
    for fr in frames:
        m = np.asarray(fr["transform_matrix"], np.float64)
        if m.shape == (3, 4):
            m = np.vstack([m, [0, 0, 0, 1.0]])
        poses.append(m)
        intr = {
            k: fr.get(k, meta.get(k))
            for k in ("fl_x", "fl_y", "cx", "cy", "w", "h")
        }
        if any(v is None for v in intr.values()):
            raise ValueError(f"missing intrinsics for frame {fr['file_path']}")
        intrinsics.append(intr)
        image_paths.append(root / fr["file_path"])
    poses = np.stack(poses)

    transform = np.eye(4)
    if orient_center:
        transform, poses = _auto_orient_and_center(poses)
    scale = 1.0
    if auto_scale:
        scale = float(1.0 / max(np.abs(poses[:, :3, 3]).max(), 1e-8))
        poses[:, :3, 3] *= scale

    f_d = float(downscale_factor)
    cameras = [
        make_camera(
            intr["fl_x"] / f_d, intr["fl_y"] / f_d,
            intr["cx"] / f_d, intr["cy"] / f_d,
            # Floor division — must match load_image's resize exactly or
            # odd image dimensions produce a camera/image shape mismatch.
            int(intr["w"]) // downscale_factor,
            int(intr["h"]) // downscale_factor,
            poses[i].astype(np.float32),
        )
        for i, intr in enumerate(intrinsics)
    ]

    # Evenly spaced eval split (nerfstudio train_split_fraction semantics).
    n = len(cameras)
    n_train = int(np.ceil(n * train_split_fraction))
    if n_train >= n:
        train_idx = np.arange(n)
        eval_idx = np.array([], np.int64)
    else:
        eval_idx = np.linspace(0, n - 1, n - n_train).round().astype(np.int64)
        eval_idx = np.unique(eval_idx)
        train_idx = np.setdiff1d(np.arange(n), eval_idx)

    points = colors = None
    ply_path = meta.get("ply_file_path")
    if ply_path and (root / ply_path).exists():
        ply = read_ply(str(root / ply_path))
        pts = ply["points"].astype(np.float64)
        pts = pts @ transform[:3, :3].T + transform[:3, 3]
        points = (pts * scale).astype(np.float32)
        colors = ply.get("colors")

    scene_scale = float(np.abs(poses[:, :3, 3]).max())
    return ParsedScene(
        train_cameras=[cameras[i] for i in train_idx],
        eval_cameras=[cameras[i] for i in eval_idx],
        train_image_paths=[image_paths[i] for i in train_idx],
        eval_image_paths=[image_paths[i] for i in eval_idx],
        points=points,
        point_colors=colors,
        transform=transform,
        scale=scale,
        scene_scale=scene_scale,
    )


def load_image(path: str | Path, downscale_factor: int = 1) -> np.ndarray:
    """Load an image as float32 [H, W, 3] in [0, 1]."""
    from PIL import Image

    img = Image.open(path).convert("RGB")
    if downscale_factor > 1:
        img = img.resize(
            (img.width // downscale_factor, img.height // downscale_factor),
            Image.BILINEAR,
        )
    return np.asarray(img, np.float32) / 255.0
