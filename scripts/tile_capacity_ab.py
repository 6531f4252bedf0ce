"""A/B: does the per-tile K-window cut change pixels on the bench scene?

The bench (bench.py) runs with ``tile_capacity=512`` and reports its
per-tile overflow in the ``binning_spill`` field (~176k intersections on
the 1M/720p scene).  Those are the *farthest* splats in saturated tiles —
cut after depth sorting, so they only matter if transmittance has not yet
decayed to ~0 by depth index 512.  This script renders the exact bench
scene at tile_capacity 512 vs 1024 on CPU (f32) and reports the max/mean
absolute pixel difference across all output channels, plus the remaining
spill at 1024.

Run: python scripts/tile_capacity_ab.py
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, "/root/repo")

from collab_splats_tpu.core.options import RenderOptions  # noqa: E402
from collab_splats_tpu.core.sh import sh0_to_rgb  # noqa: E402
from collab_splats_tpu.data.synthetic import (  # noqa: E402
    orbit_cameras,
    random_gaussian_params,
)
from collab_splats_tpu.ops.rasterize import render_tiled  # noqa: E402


def main():
    n = 1_000_000
    width, height = 1280, 720
    key = jax.random.PRNGKey(0)
    params = random_gaussian_params(key, n, extent=1.5,
                                    scale_range=(0.002, 0.006))
    camera = orbit_cameras(1, radius=3.0, width=width, height=height,
                           focal=1.0 * width)[0]

    m = params["means"]
    q = params["quats"]
    s = jnp.exp(params["scales"])
    o = jax.nn.sigmoid(params["opacities"][:, 0])
    c = sh0_to_rgb(params["features_dc"])

    outs = {}
    for k_cap in (512, 1024):
        opts = RenderOptions(
            rasterize_mode="antialiased",
            max_intersections=5 << 19,
            tile_capacity=k_cap,
            backend="xla",
            exact_binning=False,
        )
        out, _ = jax.jit(
            lambda m, q, s, o, c, opts=opts: render_tiled(
                m, q, s, o, c, camera, opts)
        )(m, q, s, o, c)
        out = jax.block_until_ready(out)
        outs[k_cap] = out
        print(f"tile_capacity={k_cap}: spilled={int(out.spilled)}",
              flush=True)

    a, b = outs[512], outs[1024]
    for name in ("color", "alpha", "depth", "median_depth", "normal"):
        xa = getattr(a, name)
        xb = getattr(b, name)
        d = jnp.abs(xa - xb)
        denom = jnp.maximum(jnp.abs(xb).max(), 1e-12)
        mse = float(jnp.mean((xa - xb) ** 2))
        rng = float(jnp.abs(xb).max())
        psnr = 10.0 * jnp.log10(rng * rng / max(mse, 1e-30)) if rng > 0 else 0
        print(f"{name:13s} max|Δ|={float(d.max()):.3e} "
              f"mean|Δ|={float(d.mean()):.3e} "
              f"rel max={float(d.max() / denom):.3e} "
              f"PSNR={float(psnr):.1f}dB", flush=True)


if __name__ == "__main__":
    main()
