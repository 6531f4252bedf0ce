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


def test_pallas_binning_far_depth_quantization(monkeypatch):
    """Quantized ranks above 2^24 must not corrupt the Pallas path.

    With few tiles (48 here) the key budget allows rank_bits_est = 25, and
    depths beyond ~100 units quantize above 2^24 — not f32-exact, so the
    kernel's f32-carried rank could round up and overflow into the tile
    bits, binning the splat into the wrong tile (ADVICE r4 medium).
    bin_gaussians now clamps quantized levels to 2^24-1 on every path.
    """
    cam: Camera = orbit_cameras(1, radius=3.0, width=128, height=96,
                                focal=1.2 * 128)[0]
    p = random_gaussian_params(jax.random.PRNGKey(11), 600, extent=1.4,
                               scale_range=(0.01, 0.08))
    # Push half the splats very deep along the camera's view direction so
    # their log-depth fraction exceeds 0.5 (quantized rank > 2^24 under the
    # old 25-bit levels).  Scale them up so they still cover tiles.
    fwd = -np.asarray(cam.c2w)[:3, 2]
    deep = jnp.asarray(
        np.asarray(cam.c2w)[:3, 3][None, :]
        + np.linspace(150.0, 900.0, 300)[:, None] * fwd[None, :]
    ).astype(jnp.float32)
    means = p["means"].at[:300].set(deep + 0.5 * jax.random.normal(
        jax.random.PRNGKey(12), (300, 3)))
    scales = p["scales"].at[:300].set(jnp.log(jnp.full((300, 3), 3.0)))
    opac = jax.nn.sigmoid(p["opacities"][:, 0])
    proj = project_gaussians(
        means, p["quats"], jnp.exp(scales),
        cam.viewmat(), cam.K, cam.width, cam.height, opacities=opac,
    )
    base = RenderOptions(
        max_intersections=1 << 14, tile_capacity=64,
        exact_binning=False, pallas_interpret=True,
    )
    # Precondition: some depths really are beyond the 2^24 quantization
    # threshold (~d > 100 with the [0.01, 1e6] log range).
    assert float(jnp.max(jnp.where(proj.valid, proj.depth, 0.0))) > 120.0
    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "xla")
    ref = tiles.bin_gaussians(proj, cam.width, cam.height, base, opac)
    monkeypatch.setenv("COLLAB_SPLATS_BINNING", "pallas")
    got = tiles.bin_gaussians(proj, cam.width, cam.height, base, opac)
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
