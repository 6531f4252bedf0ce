"""Benchmark: rendered pixels/s/chip at 1M Gaussians (BASELINE.md north star).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
reported against a nominal target of 1e8 rendered pixels/s (order of what a
consumer-GPU gsplat forward delivers at this scale); > 1.0 means faster.

Runs on the default platform (the real TPU chip under the driver).  Extra
diagnostics go to stderr; stdout carries only the JSON line.

Measurement-integrity contract (VERDICT r4 #1: the official artifact must
never carry a physically impossible number):

1. Any per-iter below 1 ms is impossible for this workload.  First the
   in-process guard clears the executable and reloads from the persistent
   compilation cache (up to 3 times — this recovered nothing in r4).
2. If still absurd, the persistent compilation cache is WIPED (the poisoned
   executable lives there) and the measurement re-runs in a FRESH
   subprocess (``--only fwd|bwd``), paying a full recompile.
3. If the fresh process still measures absurd, the JSON reports that field
   as null with ``"invalid": true`` and the process exits non-zero —
   fiction never reaches the machine-read artifact.

The JSON also carries ``spill_psnr_bound_db``: the measured PSNR of the
K=512 forward against a K=1024 forward of the same scene (the per-tile
window cut whose raw count is ``binning_spill``), so the artifact is
self-contained about how much rendered quality the spill costs.
"""

import argparse
import json
import shutil
import subprocess
import sys
import time

ABSURD_MS = 1.0
NOMINAL_BASELINE_PPS = 1e8
REPS = 10   # in-graph repetitions: amortizes host<->device dispatch


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build():
    """Build the benchmark closures; returns a dict of handles."""
    import os

    import jax

    if os.environ.get("BENCH_CPU"):
        # Off-hardware smoke mode (the env var alone is not honored with
        # the axon plugin installed; see .claude/skills/verify).
        jax.config.update("jax_platforms", "cpu")
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

    # Overridable for off-hardware smoke tests of the bench machinery
    # (absurd-guard escalation, subprocess re-measure, spill bound); the
    # driver runs the defaults.
    n = int(os.environ.get("BENCH_N", 1_000_000))
    width = int(os.environ.get("BENCH_W", 1280))
    height = int(os.environ.get("BENCH_H", 720))
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

    def make_opts(tile_capacity=512, max_intersections=1 << 21):
        return RenderOptions(
            rasterize_mode="antialiased",
            # 1<<21 = 2.10M: the scene generates ~1.77M bbox intersections
            # with the per-axis opacity-aware bbox (core/projection.
            # radius_xy), so the global buffer never drops work — at a
            # fraction of the binning cost of the 8N default.  The
            # remaining nonzero spill in the JSON is the per-tile K=512
            # window cut of depth-sorted tails in saturated tiles; its
            # pixel effect is measured live as spill_psnr_bound_db.
            max_intersections=max_intersections,
            tile_capacity=tile_capacity,
            backend=backend,
            pallas_batched=pallas_batched,
            # Quantized log-depth keys: skips the global depth argsort;
            # ordering of near-equal depths is arbitrary (same regime where
            # CUDA float radix keys stop discriminating). ~9% faster
            # binning at 1M.
            exact_binning=False,
        )

    opts = make_opts()

    m = params["means"]
    q = params["quats"]
    s = jnp.exp(params["scales"])
    o = jax.nn.sigmoid(params["opacities"][:, 0])
    c = sh0_to_rgb(params["features_dc"])
    inputs = (m, q, s, o, c)

    if backend == "pallas":
        from collab_splats_tpu.ops.rasterize import render_tiled_pallas

        def render_fn(*a, opts=opts):
            return render_tiled_pallas(*a, camera, opts)
    else:
        def render_fn(*a, opts=opts):
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

        return jax.lax.fori_loop(0, REPS, lambda i, a: body(i, a[0]),
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

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros(()))

    def spill_psnr_bound():
        """PSNR of the K=512 forward vs a K=1024 forward (window-cut cost).

        The K=1024 render composites (nearly) every spilled tail the K=512
        window drops, so the PSNR between the two color images bounds the
        pixel effect of ``binning_spill`` (scripts/tile_capacity_ab.py is
        the offline version; this is the in-bench self-contained one).
        """
        def color_at(cap, mi):
            o512 = make_opts(tile_capacity=cap, max_intersections=mi)
            if backend == "pallas":
                from collab_splats_tpu.ops.rasterize import (
                    render_tiled_pallas,
                )
                out, _ = render_tiled_pallas(*inputs, camera, o512)
            else:
                out, _ = render_tiled(*inputs, camera, o512)
            return out.color

        @jax.jit
        def psnr_pair():
            a = color_at(512, 1 << 21)
            b = color_at(1024, 1 << 21)
            mse = jnp.mean((a - b) ** 2)
            return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))

        return float(jax.block_until_ready(psnr_pair()))

    return {
        "jax": jax,
        "cache_dir": cache_dir,
        "inputs": inputs,
        "forward_loop": forward_loop,
        "fwd_bwd_loop": fwd_bwd_loop,
        "spill_psnr_bound": spill_psnr_bound,
        "width": width,
        "height": height,
    }


def timeit(jax, fn, inputs):
    """Compile + best-of-3 per-iter timing with the in-process absurd guard.

    Returns (compile_s, per_iter_s).  per_iter_s may still be absurd after
    the in-process retries — the caller decides what to do then.
    """
    t0 = time.time()
    jax.block_until_ready(fn(*inputs))
    compile_s = time.time() - t0

    def measure():
        # Best of 3: the shared tunnel chip shows run-to-run variance, and
        # a degraded relay/compile service (observed once at a round
        # boundary: 78 ms re-measured as 1930 ms) inflates every sample —
        # min is the honest device-time estimate.
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            jax.block_until_ready(fn(*inputs))
            best = min(best, (time.time() - t0) / REPS)
        return best

    per = measure()
    # Corrupt-executable guard: the remote compile service occasionally
    # hands back an executable that "runs" in microseconds without doing
    # the work (observed after service restarts).  Clear the in-memory
    # executable and reload from the persistent compilation cache.
    tries = 0
    while per * 1000 < ABSURD_MS and tries < 3:
        log(f"absurd per-iter {per*1000:.3f} ms: reloading executable "
            f"(attempt {tries + 1})")
        jax.clear_caches()
        t0 = time.time()
        jax.block_until_ready(fn(*inputs))
        log(f"  reload+1st {time.time() - t0:.1f}s")
        per = measure()
        tries += 1
    return compile_s, per


def subprocess_remeasure(which, cache_dir):
    """Fresh-process re-measure of one loop with the poisoned cache wiped.

    The corrupt executable observed in r4 survived in-process cache
    reloads, i.e. the poison lives in the persistent compilation cache (or
    the process state).  Wipe the cache and re-measure in a clean process;
    returns per_iter_s or None if the subprocess failed/was still absurd.
    """
    log(f"wiping compilation cache {cache_dir} and re-measuring '{which}' "
        "in a fresh subprocess")
    shutil.rmtree(cache_dir, ignore_errors=True)
    try:
        r = subprocess.run(
            [sys.executable, __file__, "--only", which],
            capture_output=True, text=True, timeout=3600,
        )
    except subprocess.TimeoutExpired:
        log("fresh-subprocess re-measure timed out")
        return None
    log(r.stderr[-2000:] if r.stderr else "(no stderr)")
    try:
        payload = json.loads(r.stdout.strip().splitlines()[-1])
        per = float(payload["per_iter_s"])
    except Exception as e:  # noqa: BLE001 — any parse failure = no result
        log(f"fresh-subprocess parse failure: {e}; stdout={r.stdout[-500:]}")
        return None
    if per * 1000 < ABSURD_MS:
        log(f"fresh subprocess STILL absurd ({per*1000:.3f} ms)")
        return None
    return per


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", choices=["fwd", "bwd"], default=None,
                    help="measure one loop and print {'per_iter_s': s} "
                         "(used by the fresh-subprocess re-measure)")
    args = ap.parse_args()

    h = build()
    jax = h["jax"]

    if args.only is not None:
        fn = h["forward_loop"] if args.only == "fwd" else h["fwd_bwd_loop"]
        compile_s, per = timeit(jax, fn, h["inputs"])
        log(f"--only {args.only}: compile+1st {compile_s:.1f}s, "
            f"per-iter {per*1000:.2f}ms")
        print(json.dumps({"per_iter_s": per, "compile_s": compile_s}))
        return

    fwd_compile, fwd_t = timeit(jax, h["forward_loop"], h["inputs"])
    spill = int(jax.block_until_ready(
        h["forward_loop"](*h["inputs"]))[1])
    log(f"binning spill: {spill} (nonzero would understate work and "
        "overstate pixels/s)")
    log(f"forward: compile+1st {fwd_compile:.1f}s, "
        f"per-iter {fwd_t*1000:.2f}ms")
    bwd_compile, bwd_t = timeit(jax, h["fwd_bwd_loop"], h["inputs"])
    log(f"fwd+bwd: compile+1st {bwd_compile:.1f}s, "
        f"per-iter {bwd_t*1000:.2f}ms")

    # Escalation: fresh subprocess with the persistent cache wiped.
    if fwd_t * 1000 < ABSURD_MS:
        fwd_t = subprocess_remeasure("fwd", h["cache_dir"])
    if bwd_t is not None and bwd_t * 1000 < ABSURD_MS:
        bwd_t = subprocess_remeasure("bwd", h["cache_dir"])

    invalid = fwd_t is None or bwd_t is None

    try:
        bound_db = round(h["spill_psnr_bound"](), 1)
        log(f"spill PSNR bound (K=512 vs K=1024): {bound_db} dB")
    except Exception as e:  # noqa: BLE001 — diagnostic, not the metric
        log(f"spill PSNR bound computation failed: {e}")
        bound_db = None

    pixels = h["width"] * h["height"]
    pps = (pixels / fwd_t) if fwd_t else None
    if pps is not None:
        log(f"pixels/s forward: {pps:.3e}")

    payload = {
        "metric": "rendered_pixels_per_s_per_chip_1M_gaussians",
        "value": round(pps, 1) if pps is not None else None,
        "unit": "pixels/s",
        "vs_baseline": (round(pps / NOMINAL_BASELINE_PPS, 4)
                        if pps is not None else None),
        "binning_spill": spill,
        "spill_psnr_bound_db": bound_db,
        "step_ms": round(bwd_t * 1000, 2) if bwd_t is not None else None,
        "compile_s": round(fwd_compile + bwd_compile, 1),
    }
    if invalid:
        payload["invalid"] = True
    print(json.dumps(payload))
    if invalid:
        sys.exit(1)


if __name__ == "__main__":
    main()
