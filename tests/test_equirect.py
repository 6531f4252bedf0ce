"""Equirect-360 input support (pipeline/equirect.py)."""

import numpy as np

from collab_splats_tpu.pipeline.equirect import (
    VIEW_DIRECTIONS,
    equirect_to_perspective,
    generate_planar_projections,
)


def _latlon_pano(h=128, w=256):
    """Panorama encoding longitude in R and latitude in G."""
    lon = np.linspace(-np.pi, np.pi, w, endpoint=False) + np.pi / w
    lat = np.linspace(np.pi / 2, -np.pi / 2, h)
    pano = np.zeros((h, w, 3), np.float32)
    pano[..., 0] = (lon / (2 * np.pi) + 0.5)[None, :]
    pano[..., 1] = (lat / np.pi + 0.5)[:, None]
    return pano


class TestEquirect:
    def test_fourteen_views(self):
        assert len(VIEW_DIRECTIONS) == 14  # reference --images-per-equirect 14

    def test_center_pixel_direction(self):
        pano = _latlon_pano()
        for yaw, pitch in [(0, 0), (90, 0), (180, 0), (0, 45), (0, -45)]:
            crop = equirect_to_perspective(pano, yaw, pitch, 90.0, 64)
            c = crop[32, 32]
            # Center pixel looks along (yaw, pitch): longitude ~ yaw.
            lon = (c[0] - 0.5) * 2 * np.pi
            lat = (c[1] - 0.5) * np.pi
            want = np.radians(yaw)
            want = np.arctan2(np.sin(want), np.cos(want))
            assert abs(np.arctan2(np.sin(lon - want), np.cos(lon - want))) < 0.1
            assert abs(lat - np.radians(pitch)) < 0.1

    def test_zenith_view_covers_pole(self):
        pano = _latlon_pano()
        crop = equirect_to_perspective(pano, 0, 90, 90.0, 64)
        # Center of the up view has latitude ~ +pi/2.
        assert crop[32, 32, 1] > 0.95

    def test_all_views_finite_uint8(self):
        pano = (np.random.RandomState(0).rand(64, 128, 3) * 255).astype(np.uint8)
        crops = generate_planar_projections(pano, out_size=32)
        assert len(crops) == 14
        for c in crops:
            assert c.shape == (32, 32, 3)
            assert np.isfinite(c.astype(np.float64)).all()

    def test_crop_dir(self, tmp_path):
        from PIL import Image

        from collab_splats_tpu.pipeline.equirect import crop_equirect_dir

        src = tmp_path / "scene_360"
        src.mkdir()
        pano = (np.random.RandomState(1).rand(64, 128, 3) * 255).astype(np.uint8)
        Image.fromarray(pano).save(src / "pano0.png")
        n = crop_equirect_dir(src, tmp_path / "out")
        assert n == 14
        assert len(list((tmp_path / "out").glob("*.png"))) == 14
