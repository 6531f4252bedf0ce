"""Parity: the Pallas run-length-decode binning expansion vs the XLA path.

The kernel (ops/pallas/binning_kernel.py) must reproduce bin_gaussians'
(sort key, gid) stream bit-exactly: same windows, same masks, same spill.
Runs in interpret mode on CPU (hardware validation via scripts/tpu_probe).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.core.cameras import Camera
from collab_splats_tpu.core.options import RenderOptions
from collab_splats_tpu.core.projection import project_gaussians
from collab_splats_tpu.data.synthetic import (
    orbit_cameras,
    random_gaussian_params,
)
from collab_splats_tpu.ops import tiles


def _project(n, seed=0, width=128, height=96):
    cam: Camera = orbit_cameras(1, radius=3.0, width=width, height=height,
                                focal=1.2 * width)[0]
    p = random_gaussian_params(jax.random.PRNGKey(seed), n, extent=1.4,
                               scale_range=(0.01, 0.08))
    opac = jax.nn.sigmoid(p["opacities"][:, 0])
    proj = project_gaussians(
        p["means"], p["quats"], jnp.exp(p["scales"]),
        cam.viewmat(), cam.K, cam.width, cam.height, opacities=opac,
    )
    return proj, opac, cam


@pytest.mark.parametrize("exact", [True, False])
@pytest.mark.parametrize("cull", [True, False])
@pytest.mark.parametrize("n", [257, 3000])
def test_pallas_binning_matches_xla(monkeypatch, n, cull, exact):
    proj, opac, cam = _project(n)
    base = RenderOptions(
        max_intersections=1 << 14, tile_capacity=64,
        exact_binning=exact, ellipse_cull=cull, pallas_interpret=True,
    )

    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "xla")
    ref = tiles.bin_gaussians(proj, cam.width, cam.height, base, opac)
    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "pallas")
    got = tiles.bin_gaussians(proj, cam.width, cam.height, base, opac)

    _assert_bins_equal(got, ref)


def _assert_bins_equal(got, ref):
    """Compare the live contract: windows where masked, the in-tile slice
    of the sorted stream, segment bounds, and the spill counter.  (Slots
    past the last tile segment — sentinel keys — are dead lanes: the XLA
    path leaves stale cummax gids there while the kernel zeroes them, and
    no consumer reads either.)"""
    np.testing.assert_array_equal(np.asarray(got.starts),
                                  np.asarray(ref.starts))
    live = int(np.asarray(ref.starts)[-1])
    np.testing.assert_array_equal(np.asarray(got.sorted_gid)[:live],
                                  np.asarray(ref.sorted_gid)[:live])
    mask = np.asarray(ref.tile_mask)
    np.testing.assert_array_equal(np.asarray(got.tile_mask), mask)
    np.testing.assert_array_equal(np.asarray(got.tile_gauss)[mask],
                                  np.asarray(ref.tile_gauss)[mask])
    assert int(got.spilled) == int(ref.spilled)


def test_pallas_binning_global_overflow(monkeypatch):
    """Whole-gaussian drops (global buffer overflow) stay identical."""
    proj, opac, cam = _project(4000, seed=3)
    base = RenderOptions(
        max_intersections=1 << 12, tile_capacity=32, pallas_interpret=True,
    )
    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "xla")
    ref = tiles.bin_gaussians(proj, cam.width, cam.height, base, opac)
    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "pallas")
    got = tiles.bin_gaussians(proj, cam.width, cam.height, base, opac)
    assert int(got.spilled) == int(ref.spilled) > 0
    _assert_bins_equal(got, ref)


def test_pallas_binning_no_opacities(monkeypatch):
    proj, _, cam = _project(500, seed=7)
    base = RenderOptions(max_intersections=1 << 13, tile_capacity=64,
                         pallas_interpret=True)
    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "xla")
    ref = tiles.bin_gaussians(proj, cam.width, cam.height, base, None)
    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "pallas")
    got = tiles.bin_gaussians(proj, cam.width, cam.height, base, None)
    _assert_bins_equal(got, ref)
