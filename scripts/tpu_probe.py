"""One-command TPU perf probe: forward + train-step timing and top device ops.

Usage (run on the real TPU; first compile 2-6 min, cached after):

    python scripts/tpu_probe.py            # fwd + fwd/bwd timing
    python scripts/tpu_probe.py --profile  # also trace + top-op table

Timing methodology (see .claude/skills/verify/SKILL.md): per-call timings
through the tunnel are garbage, so everything runs inside a jitted
``fori_loop`` whose body is perturbed with ``jnp.roll(m, i)`` (epsilon
perturbations fold away and XLA hoists the body).
"""

import argparse
import collections
import glob
import gzip
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true",
                    help="jax.profiler trace + top-op table")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=1280)
    ap.add_argument("--height", type=int, default=720)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--skip-forward", action="store_true")
    ap.add_argument("--forward-only", action="store_true",
                    help="skip the fwd+bwd loop; --profile then traces the "
                         "forward loop")
    ap.add_argument("--pallas-batched", action="store_true",
                    help="fused forward via the batched Pallas kernel")
    ap.add_argument("--no-remat-compositing", action="store_true",
                    help="store analytic-VJP residuals across the chunk loop "
                         "instead of rematting each chunk's forward")
    ap.add_argument("--tile-chunk", type=int, default=64,
                    help="tiles per compositing chunk (lax.map step)")
    ap.add_argument("--no-pallas-bwd", action="store_true",
                    help="with --pallas-batched: keep the chunked XLA "
                         "moment backward instead of the batched Pallas "
                         "backward kernel")
    ap.add_argument("--no-fused-vjp", action="store_true",
                    help="legacy composite_chunk path instead of the fused "
                         "analytic compositing VJP")
    ap.add_argument("--no-ellipse-cull", action="store_true",
                    help="disable the exact ellipse-vs-tile-rect binning cull")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.core.sh import sh0_to_rgb
    from collab_splats_tpu.data.synthetic import (
        orbit_cameras, random_gaussian_params,
    )
    from collab_splats_tpu.ops.rasterize import render_tiled

    n, width, height, reps = args.n, args.width, args.height, args.reps
    params = random_gaussian_params(jax.random.PRNGKey(0), n, extent=1.5,
                                    scale_range=(0.002, 0.006))
    camera = orbit_cameras(1, radius=3.0, width=width, height=height,
                           focal=1.0 * width)[0]
    m = params["means"]; q = params["quats"]
    s = jnp.exp(params["scales"])
    o = jax.nn.sigmoid(params["opacities"][:, 0])
    c = sh0_to_rgb(params["features_dc"])
    opts = RenderOptions(rasterize_mode="antialiased",
                         max_intersections=1 << 21, tile_capacity=512,
                         backend="xla", exact_binning=False,
                         pallas_batched=args.pallas_batched,
                         pallas_batched_bwd=not args.no_pallas_bwd,
                         remat_compositing=not args.no_remat_compositing,
                         fused_vjp=not args.no_fused_vjp,
                         ellipse_cull=not args.no_ellipse_cull)

    def render_sum(m, q, s, o, c):
        out, _ = render_tiled(m, q, s, o, c, camera, opts,
                              tile_chunk=args.tile_chunk)
        return (jnp.sum(out.color) + jnp.sum(out.alpha) + jnp.sum(out.depth)
                + jnp.sum(out.median_depth) + jnp.sum(out.normal))

    @jax.jit
    def fwd_loop(m, q, s, o, c):
        def body(i, acc):
            return acc + render_sum(jnp.roll(m, i, axis=0), q, s, o, c)
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    @jax.jit
    def step_loop(m, q, s, o, c):
        def body(i, acc):
            g = jax.grad(render_sum, argnums=(0, 2, 3, 4))(
                jnp.roll(m, i, axis=0), q, s, o, c)
            return acc + g[0][0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    def timeit(name, fn):
        t0 = time.time(); jax.block_until_ready(fn(m, q, s, o, c))
        compile_s = time.time() - t0

        def measure():
            t0 = time.time(); jax.block_until_ready(fn(m, q, s, o, c))
            return (time.time() - t0) / reps

        per = measure()
        # Corrupt-executable guard (see bench.py): sub-ms per-iter is
        # impossible here; reload the executable from the persistent cache.
        tries = 0
        while per * 1000 < 1.0 and tries < 3:
            print(f"{name}: absurd per-iter {per*1000:.3f} ms — reloading "
                  f"executable (attempt {tries + 1})", flush=True)
            jax.clear_caches()
            jax.block_until_ready(fn(m, q, s, o, c))
            per = measure()
            tries += 1
        print(f"{name}: compile+1st {compile_s:.1f}s, "
              f"per-iter {per * 1000:.2f} ms", flush=True)
        return fn

    loop = None
    if not args.skip_forward:
        loop = timeit("forward", fwd_loop)
    if not args.forward_only:
        loop = timeit("fwd+bwd", step_loop)

    if args.profile:
        logdir = "/tmp/tpu_probe_trace"
        jax.profiler.start_trace(logdir)
        jax.block_until_ready(loop(m, q, s, o, c))
        jax.profiler.stop_trace()
        paths = glob.glob(logdir + "/**/*.trace.json.gz", recursive=True)
        if not paths:
            print(f"no trace files produced under {logdir}; "
                  "timing results above are still valid")
            return
        with gzip.open(sorted(paths)[-1], "rt") as f:
            tr = json.load(f)
        events = tr.get("traceEvents", [])
        pid_names = {}
        for e in events:
            if e.get("ph") == "M" and e.get("name") == "process_name":
                pid_names[e["pid"]] = e.get("args", {}).get("name", "")
        tpu = {p for p, nm in pid_names.items()
               if "TPU" in nm or "/device" in nm.lower()}
        agg, cnt = collections.Counter(), collections.Counter()
        for e in events:
            if e.get("ph") == "X" and e.get("pid") in tpu:
                agg[e.get("name", "?")] += e.get("dur", 0)
                cnt[e.get("name", "?")] += 1
        print(f"total device: {sum(agg.values()) / 1000:.1f} ms "
              f"over {reps} iters")
        for nm, us in agg.most_common(30):
            print(f"{us / 1000 / reps:9.2f} ms/iter  x{cnt[nm] // reps:<4d} "
                  f"{nm[:100]}")


if __name__ == "__main__":
    main()
