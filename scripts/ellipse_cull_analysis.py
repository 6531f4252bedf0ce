"""Quantify the exact ellipse-vs-tile cull on the bench scene.

The binning stage assigns a Gaussian to every tile its axis-aligned bbox
(radius_xy, the exact per-axis extent of the alpha >= 1/255 ellipse)
touches.  The bbox is conservative: a diagonal ellipse misses the bbox
corners, so corner tiles receive entries whose alpha is < 1/255 at every
pixel of the tile.  This script measures, for the exact bench scene:

  * total intersections now vs after an exact min-over-tile-rect sigma test,
  * per-tile occupancy (max, and count > 512) before/after,

to decide whether the cull (a) zeroes the bench's tile-window spill at
K=512 and (b) lets max_intersections shrink.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from collab_splats_tpu.core.compositing import ALPHA_CUTOFF  # noqa: E402
from collab_splats_tpu.core.projection import project_gaussians  # noqa: E402
from collab_splats_tpu.core.sh import sh0_to_rgb  # noqa: E402
from collab_splats_tpu.data.synthetic import (  # noqa: E402
    orbit_cameras,
    random_gaussian_params,
)
from collab_splats_tpu.ops.tiles import tile_bbox  # noqa: E402


def min_sigma_rect(mean2d, conic, u0, u1, v0, v1):
    """Exact min of sigma(du,dv)=.5(a du^2 + c dv^2)+b du dv over a rect.

    All args are per-entry arrays; the rect is [u0,u1]x[v0,v1] in pixels.
    The unconstrained minimum is at the center (sigma=0); if the center is
    inside the rect, min is 0.  Otherwise the constrained minimum lies on
    one of the 4 edges; on each edge one variable is fixed and the 1-D
    quadratic minimizer is clamped to the segment.
    """
    a, b, c = conic[:, 0], conic[:, 1], conic[:, 2]
    uc, vc = mean2d[:, 0], mean2d[:, 1]

    def sig(du, dv):
        return 0.5 * (a * du * du + c * dv * dv) + b * du * dv

    inside = (uc >= u0) & (uc <= u1) & (vc >= v0) & (vc <= v1)

    best = jnp.full(a.shape, jnp.inf)
    # Edges u = u0 and u = u1 (du fixed, optimize dv in [v0-vc, v1-vc]).
    for ue in (u0, u1):
        du = ue - uc
        dv_star = -b * du / jnp.maximum(c, 1e-12)
        dv = jnp.clip(dv_star, v0 - vc, v1 - vc)
        best = jnp.minimum(best, sig(du, dv))
    for ve in (v0, v1):
        dv = ve - vc
        du_star = -b * dv / jnp.maximum(a, 1e-12)
        du = jnp.clip(du_star, u0 - uc, u1 - uc)
        best = jnp.minimum(best, sig(du, dv))
    return jnp.where(inside, 0.0, best)


def main():
    n = 1_000_000
    width, height = 1280, 720
    ts = 16
    key = jax.random.PRNGKey(0)
    params = random_gaussian_params(key, n, extent=1.5,
                                    scale_range=(0.002, 0.006))
    camera = orbit_cameras(1, radius=3.0, width=width, height=height,
                           focal=1.0 * width)[0]
    m = params["means"]
    q = params["quats"]
    s = jnp.exp(params["scales"])
    o = jax.nn.sigmoid(params["opacities"][:, 0])

    proj = project_gaussians(m, q, s, camera.viewmat(), camera.K,
                             width, height, opacities=o)
    ntx, nty = -(-width // ts), -(-height // ts)
    tx0, ty0, tx1, ty1 = tile_bbox(proj, ntx, nty, ts)

    tx0, ty0, tx1, ty1, valid = map(
        np.asarray, (tx0, ty0, tx1, ty1, proj.valid))
    counts = np.where(valid, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    total = int(counts.sum())
    print(f"bbox intersections: {total}")

    # Expand to per-entry (gid, tile) in numpy.
    gid = np.repeat(np.arange(n), counts)
    local = np.arange(total) - np.repeat(
        np.cumsum(counts) - counts, counts)
    ncols = np.repeat(tx1 - tx0 + 1, counts)
    dy = local // ncols
    dx = local - dy * ncols
    tx = np.repeat(tx0, counts) + dx
    ty = np.repeat(ty0, counts) + dy

    mean2d = np.asarray(proj.mean2d)[gid]
    conic = np.asarray(proj.conic)[gid]
    # antialiased mode: effective opacity includes compensation
    o_eff = np.asarray(o * proj.compensation)[gid]

    u0 = tx * ts
    u1 = u0 + ts
    v0 = ty * ts
    v1 = v0 + ts
    ms = np.asarray(min_sigma_rect(
        jnp.asarray(mean2d), jnp.asarray(conic),
        jnp.asarray(u0, jnp.float32), jnp.asarray(u1, jnp.float32),
        jnp.asarray(v0, jnp.float32), jnp.asarray(v1, jnp.float32)))
    thresh = np.log(np.maximum(o_eff / ALPHA_CUTOFF, 1e-12))
    keep = ms <= thresh
    kept = int(keep.sum())
    print(f"exact-cull intersections: {kept} ({kept/total:.1%} of bbox)")

    tile_id = ty * ntx + tx
    occ_before = np.bincount(tile_id, minlength=ntx * nty)
    occ_after = np.bincount(tile_id[keep], minlength=ntx * nty)
    for name, occ in (("before", occ_before), ("after", occ_after)):
        over = occ - 512
        print(f"{name}: max/tile={occ.max()}, tiles>512={np.sum(occ > 512)}, "
              f"spill@512={np.sum(np.maximum(over, 0))}, "
              f"tiles>384={np.sum(occ > 384)}, "
              f"spill@384={np.sum(np.maximum(occ - 384, 0))}")


if __name__ == "__main__":
    main()
