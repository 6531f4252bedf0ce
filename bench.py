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

    from collab_splats_tpu.utils.cache import enable_compilation_cache

    cache_dir = enable_compilation_cache()
    log(f"compilation cache: {cache_dir}")

    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.core.sh import sh0_to_rgb
    from collab_splats_tpu.data.synthetic import (
        orbit_cameras,
        random_gaussian_params,
    )
    from collab_splats_tpu.ops.rasterize import render_tiled

    import os

    n = 1_000_000
    width, height = 1280, 720
    reps = 10   # in-graph repetitions: amortizes host<->device dispatch
    backend = os.environ.get("BENCH_BACKEND", "xla")  # "xla" | "pallas"
    # Batched Pallas compositing kernels (fwd + bwd pair, ops/pallas/
    # batched*.py) on the XLA-orchestrated path; falls back to the XLA
    # fused compositor off-TPU.  Hardware-measured perf-neutral vs the
    # XLA fused compositor at 1M/720p (76.8 vs 77.9 ms fwd, 161.8 vs
    # 162.8 ms step — compositing is no longer the bottleneck), so the
    # simpler XLA path stays the default.  BENCH_PALLAS_BATCHED=1 enables.
    pallas_batched = os.environ.get("BENCH_PALLAS_BATCHED", "0") == "1"
    log(f"bench: {n} gaussians, {width}x{height}, "
        f"platform={jax.default_backend()}, raster backend={backend}, "
        f"pallas_batched={pallas_batched}")

    key = jax.random.PRNGKey(0)
    params = random_gaussian_params(key, n, extent=1.5,
                                    scale_range=(0.002, 0.006))
    camera = orbit_cameras(1, radius=3.0, width=width, height=height,
                           focal=1.0 * width)[0]
    opts = RenderOptions(
        rasterize_mode="antialiased",
        # 1<<21 = 2.10M: the scene generates ~1.77M bbox intersections with
        # the per-axis opacity-aware bbox (core/projection.radius_xy), so
        # the global buffer never drops work — at a fraction of the binning
        # cost of the 8N default (m_cap-proportional sort/gathers).  The
        # remaining nonzero spill in the JSON is the per-tile K=512 window
        # cut of depth-sorted tails in saturated tiles (the ellipse cull
        # removes the zero-contribution part); its pixel effect is bounded
        # at 72-77 dB PSNR vs K=1024 (scripts/tile_capacity_ab.py,
        # PARITY.md "window-cut honesty").
        max_intersections=1 << 21,
        tile_capacity=512,
        backend=backend,
        pallas_batched=pallas_batched,
        # Quantized log-depth keys: skips the global depth argsort; ordering
        # of near-equal depths is arbitrary (same regime where CUDA float
        # radix keys stop discriminating). ~9% faster binning at 1M.
        exact_binning=False,
    )

    m = params["means"]
    q = params["quats"]
    s = jnp.exp(params["scales"])
    o = jax.nn.sigmoid(params["opacities"][:, 0])
    c = sh0_to_rgb(params["features_dc"])

    if backend == "pallas":
        from collab_splats_tpu.ops.rasterize import render_tiled_pallas

        def render_fn(*a):
            return render_tiled_pallas(*a, camera, opts)
    else:
        def render_fn(*a):
            return render_tiled(*a, camera, opts)

    def render_sum(m, q, s, o, c):
        out, _ = render_fn(m, q, s, o, c)
        return (
            jnp.sum(out.color) + jnp.sum(out.depth) + jnp.sum(out.normal)
            + jnp.sum(out.alpha) + jnp.sum(out.median_depth),
            out.spilled,
        )

    @jax.jit
    def forward_loop(m, q, s, o, c):
        def body(i, acc):
            # Roll an input by the loop index so XLA cannot hoist the
            # loop-invariant render out of the loop (epsilon perturbations
            # fold away in f32).
            v, spill = render_sum(jnp.roll(m, i, axis=0), q, s, o, c)
            return acc + v, spill

        return jax.lax.fori_loop(0, reps, lambda i, a: body(i, a[0]),
                                 (jnp.zeros(()), jnp.zeros((), jnp.int32)))

    @jax.jit
    def fwd_bwd_loop(m, q, s, o, c):
        def loss(m, q, s, o, c):
            return render_sum(m, q, s, o, c)[0]

        def body(i, acc):
            g = jax.grad(loss, argnums=(0, 2, 3, 4))(
                jnp.roll(m, i, axis=0), q, s, o, c
            )
            return acc + g[0][0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    def timeit(fn):
        t0 = time.time()
        jax.block_until_ready(fn(m, q, s, o, c))
        compile_s = time.time() - t0

        def measure():
            # Best of 3: the shared tunnel chip shows run-to-run variance,
            # and a degraded relay/compile service (observed once at a
            # round boundary: 78 ms re-measured as 1930 ms) inflates every
            # sample — min is the honest device-time estimate.
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                jax.block_until_ready(fn(m, q, s, o, c))
                best = min(best, (time.time() - t0) / reps)
            return best

        per = measure()
        # Corrupt-executable guard: the remote compile service occasionally
        # hands back an executable that "runs" in microseconds without
        # doing the work (observed after service restarts).  Any per-iter
        # below 1 ms is physically impossible for this workload; clear the
        # in-memory executable and reload from the persistent compilation
        # cache, which has produced a working one on retry.
        tries = 0
        while per * 1000 < 1.0 and tries < 3:
            log(f"absurd per-iter {per*1000:.3f} ms: reloading executable "
                f"(attempt {tries + 1})")
            jax.clear_caches()
            t0 = time.time()
            jax.block_until_ready(fn(m, q, s, o, c))
            log(f"  reload+1st {time.time() - t0:.1f}s")
            per = measure()
            tries += 1
        return compile_s, per

    fwd_compile, fwd_t = timeit(forward_loop)
    spill = int(jax.block_until_ready(forward_loop(m, q, s, o, c))[1])
    log(f"binning spill: {spill} (nonzero would understate work and "
        "overstate pixels/s)")
    log(f"forward: compile+1st {fwd_compile:.1f}s, per-iter {fwd_t*1000:.2f}ms")
    bwd_compile, bwd_t = timeit(fwd_bwd_loop)
    log(f"fwd+bwd: compile+1st {bwd_compile:.1f}s, per-iter {bwd_t*1000:.2f}ms")

    pixels = width * height
    pps = pixels / fwd_t
    log(f"pixels/s forward: {pps:.3e}; fwd+bwd step {bwd_t*1000:.2f}ms")

    nominal_baseline_pps = 1e8
    print(json.dumps({
        "metric": "rendered_pixels_per_s_per_chip_1M_gaussians",
        "value": round(pps, 1),
        "unit": "pixels/s",
        "vs_baseline": round(pps / nominal_baseline_pps, 4),
        "binning_spill": spill,
        "step_ms": round(bwd_t * 1000, 2),
        "compile_s": round(fwd_compile + bwd_compile, 1),
    }))


if __name__ == "__main__":
    main()
