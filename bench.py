"""Benchmark: rendered pixels/s/chip at 1M Gaussians (BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against a nominal target of 1e8 rendered pixels/s (order of what a
consumer-GPU gsplat forward delivers at this scale); > 1.0 means faster.

Runs on the default platform (the real TPU chip under the driver).  Extra
diagnostics go to stderr; stdout carries only the JSON line.
"""

import json
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.core.sh import sh0_to_rgb
    from collab_splats_tpu.data.synthetic import (
        orbit_cameras,
        random_gaussian_params,
    )
    from collab_splats_tpu.ops.rasterize import render_tiled

    n = 1_000_000
    width, height = 1280, 720
    log(f"bench: {n} gaussians, {width}x{height}, backend={jax.default_backend()}")

    key = jax.random.PRNGKey(0)
    params = random_gaussian_params(key, n, extent=1.5,
                                    scale_range=(0.002, 0.01))
    camera = orbit_cameras(1, radius=3.0, width=width, height=height,
                           focal=1.0 * width)[0]
    opts = RenderOptions(
        rasterize_mode="antialiased",
        max_intersections=1 << 22,
        tile_capacity=512,
    )

    m = params["means"]
    q = params["quats"]
    s = jnp.exp(params["scales"])
    o = jax.nn.sigmoid(params["opacities"][:, 0])
    c = sh0_to_rgb(params["features_dc"])

    @jax.jit
    def forward(m, q, s, o, c):
        out, _ = render_tiled(m, q, s, o, c, camera, opts)
        return out.color, out.alpha, out.depth, out.median_depth, out.normal

    @jax.jit
    def fwd_bwd(m, q, s, o, c):
        def loss(m, q, s, o, c):
            out, _ = render_tiled(m, q, s, o, c, camera, opts)
            return (
                jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.normal)
            )

        return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(m, q, s, o, c)

    def timeit(fn, reps=3):
        t0 = time.time()
        jax.block_until_ready(fn(m, q, s, o, c))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            jax.block_until_ready(fn(m, q, s, o, c))
            best = min(best, time.time() - t0)
        return compile_s, best

    fwd_compile, fwd_t = timeit(forward)
    log(f"forward: compile {fwd_compile:.1f}s, best {fwd_t*1000:.2f}ms")
    bwd_compile, bwd_t = timeit(fwd_bwd)
    log(f"fwd+bwd: compile {bwd_compile:.1f}s, best {bwd_t*1000:.2f}ms")

    pixels = width * height
    pps = pixels / fwd_t
    log(f"pixels/s forward: {pps:.3e}; bwd kernel time {bwd_t*1000:.2f}ms")

    nominal_baseline_pps = 1e8
    print(json.dumps({
        "metric": "rendered_pixels_per_s_per_chip_1M_gaussians",
        "value": round(pps, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pps / nominal_baseline_pps, 4),
    }))


if __name__ == "__main__":
    main()
