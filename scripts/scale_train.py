"""At-scale training run on the real TPU (VERDICT r2 #3, r4 #3/#4/#8).

Full Splatfacto densification schedule, progressive resolution (factor
4 -> 2 -> 1), warmup, dup/split/cull refinement with automatic capacity
growth preserving Adam moments, opacity resets, the depth-normal
phase-flip recompile at ``--reg-from`` (reference
regularization_from_iter=15000,
/root/reference/collab_splats/models/rade_gs_model.py:38 +
configs/rade_gs_method.py:30), and the spill counter.

Two ground-truth modes:

* default: a procedural scene of Gaussian clusters rendered by the model
  itself — exactly representable, isolates the *trainer*;
* ``--analytic-gt``: a host-side RAY-TRACED scene of textured primitives
  (data/analytic.py) — hard texture edges, hard shadows, Blinn-Phong
  speculars.  NOT representable by Gaussians, so PSNR measures
  *approximation* and densification feels real-photo pressure.  Seeds
  from unprojected surface pixels with their colors (the COLMAP-sparse-
  points initialization the real pipeline uses).

``--sh-degree 3`` trains the full spherical-harmonics stack with the
reference's degree schedule (one degree per 1000 steps).  ``--features``
trains the rade-features head at scale: 13-dim latents fused into the
16-channel rasterization, cosine distillation against hash-projection
extractor maps of the GT frames, decoder included (reference
rade_features_model.py:390-478,545-584).

Writes:
    <out>/history.jsonl    per-step metrics
    <out>/summary.json     final PSNR/SSIM, peak N, it/s, spill
    <out>/ckpt_*.npz       resumable checkpoints every --save-every
Usage:
    python scripts/scale_train.py [--steps 30000] [--out runs/scale_r5]
        [--analytic-gt] [--sh-degree 3] [--features] [--exact-binning]
        [--resume runs/scale_r5/ckpt_014000.npz]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_scene(key, n_objects=12, per_object=1500, width=640, height=360,
               n_cams=64):
    """GT params forming distinct anisotropic clusters + a ground slab."""
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.data.synthetic import orbit_cameras

    keys = jax.random.split(key, n_objects + 2)
    parts = []
    for i in range(n_objects):
        k1, k2, k3, k4, k5 = jax.random.split(keys[i], 5)
        center = jax.random.uniform(k1, (3,), minval=-1.0, maxval=1.0) \
            * jnp.array([1.2, 1.2, 0.5])
        means = center + 0.15 * jax.random.normal(k2, (per_object, 3))
        quats = jax.random.normal(k3, (per_object, 4))
        scales = jnp.log(
            jax.random.uniform(k4, (per_object, 3), minval=0.004,
                               maxval=0.03)
        )
        opac = jax.random.uniform(k5, (per_object, 1), minval=1.0,
                                  maxval=4.0)
        color = jax.random.uniform(keys[i], (1, 3), minval=0.1, maxval=1.0)
        fdc = (color - 0.5) / 0.2820948 + 0.3 * jax.random.normal(
            k2, (per_object, 3)
        )
        parts.append({"means": means, "quats": quats, "scales": scales,
                      "opacities": opac, "features_dc": fdc})
    # Ground slab.
    kg = keys[-1]
    ng = 4000
    g1, g2, g3 = jax.random.split(kg, 3)
    gm = jnp.concatenate([
        jax.random.uniform(g1, (ng, 2), minval=-1.6, maxval=1.6),
        jnp.full((ng, 1), -0.7) + 0.01 * jax.random.normal(g2, (ng, 1)),
    ], axis=1)
    parts.append({
        "means": gm,
        "quats": jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (ng, 1)),
        "scales": jnp.log(jnp.tile(jnp.array([[0.05, 0.05, 0.004]]),
                                   (ng, 1))),
        "opacities": jnp.full((ng, 1), 3.0),
        "features_dc": 0.2 * jax.random.normal(g3, (ng, 3)),
    })
    gt = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}
    n = gt["means"].shape[0]
    gt["features_rest"] = jnp.zeros((n, 0, 3), jnp.float32)
    cams = orbit_cameras(n_cams, radius=3.2, width=width, height=height,
                         focal=0.9 * width)
    return gt, cams


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=16500)
    ap.add_argument("--out", type=Path, default=Path("runs/scale_r3"))
    ap.add_argument("--analytic-gt", action="store_true",
                    help="ray-traced (non-Gaussian-representable) ground "
                         "truth instead of self-rendered Gaussian GT")
    ap.add_argument("--scene-spheres", type=int, default=10,
                    help="number of textured spheres in the analytic "
                         "scene (more objects -> more densification "
                         "pressure)")
    ap.add_argument("--sh-degree", type=int, default=0,
                    help="spherical-harmonics degree (reference trains 3)")
    ap.add_argument("--features", action="store_true",
                    help="train the rade-features head: 13-dim latents, "
                         "fused 16-channel rasterization, cosine "
                         "distillation + decoder")
    ap.add_argument("--eval-cams", type=int, default=8,
                    help="cameras per eval point (multi-camera mean; a "
                         "single eval camera shows 18 dB sampling "
                         "transients, VERDICT r4 weak #5)")
    ap.add_argument("--exact-binning", action="store_true")
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--seed-points", type=int, default=5000)
    ap.add_argument("--eval-every", type=int, default=500)
    ap.add_argument("--num-downscales", type=int, default=2)
    ap.add_argument("--res-schedule", type=int, default=3000)
    ap.add_argument("--reg-from", type=int, default=15000,
                    help="depth-normal regularization start iteration")
    ap.add_argument("--pallas-batched", action="store_true",
                    help="batched Pallas compositing kernels (fwd+bwd pair)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke tests; the env var "
                         "alone is not honored with the axon plugin)")
    ap.add_argument("--capacity", type=int, default=32768,
                    help="initial gaussian capacity (recompile headroom)")
    ap.add_argument("--save-every", type=int, default=2000,
                    help="checkpoint cadence (0 disables)")
    ap.add_argument("--resume", type=Path, default=None,
                    help="checkpoint to resume from: a step-*.ckpt.npz "
                         "file, or a run directory (picks the latest)")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.models import rade_gs
    from collab_splats_tpu.models.gaussians import pad_to_capacity
    from collab_splats_tpu.train import strategy
    from collab_splats_tpu.train.trainer import Trainer, TrainerConfig
    from collab_splats_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args.out.mkdir(parents=True, exist_ok=True)
    hist_path = args.out / "history.jsonl"

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    render_opts = RenderOptions(
        rasterize_mode="antialiased",
        exact_binning=bool(args.exact_binning),
        pallas_batched=bool(args.pallas_batched),
    )
    from collab_splats_tpu.core.sh import num_sh_bases, rgb_to_sh0
    from collab_splats_tpu.train import optim

    n_bases = num_sh_bases(args.sh_degree)

    if args.analytic_gt:
        from collab_splats_tpu.data import analytic
        from collab_splats_tpu.data.synthetic import orbit_cameras

        scene = analytic.default_scene(seed=7,
                                       n_spheres=args.scene_spheres)
        cams = orbit_cameras(64, radius=3.2, width=args.width,
                             height=args.height, focal=0.9 * args.width)
        print(f"ray-tracing {len(cams)} GT frames "
              f"({len(scene.sphere_radii)} spheres + plane + wall)...",
              flush=True)
        renders = [analytic.render_analytic(scene, c) for c in cams]
        images = [r["rgb"] for r in renders]
        cloud = analytic.seed_points_from_views(
            scene, cams, renders, args.seed_points, seed=args.seed
        )
        seed_means = jnp.asarray(cloud["points"])
        seed_rgb = jnp.clip(jnp.asarray(cloud["colors"]), 0.02, 0.98)
        print("gt frames done", flush=True)
    else:
        gt, cams = make_scene(jax.random.PRNGKey(1), width=args.width,
                              height=args.height)
        n_gt = int(gt["means"].shape[0])
        gt_alive = jnp.ones(n_gt, bool)
        eval_cfg = rade_gs.RadeGSConfig(
            sh_degree=0, background="black", render=render_opts,
            use_depth_normal_loss=False,
        )
        print(f"rendering {len(cams)} GT frames ({n_gt} gt gaussians)...",
              flush=True)
        render_gt = jax.jit(
            lambda c2w, K: rade_gs.get_outputs(
                gt, gt_alive,
                cams[0].replace(c2w=c2w, K=K), 0, eval_cfg, training=False,
            )[0]["rgb"]
        )
        images = [np.asarray(render_gt(c.c2w, c.K)) for c in cams]
        print("gt frames done", flush=True)
        kp = jax.random.PRNGKey(args.seed)
        sel = jax.random.choice(kp, n_gt, (args.seed_points,),
                                replace=False)
        seed_means = gt["means"][sel] \
            + 0.02 * jax.random.normal(kp, (args.seed_points, 3))
        seed_rgb = None

    if args.features:
        from collab_splats_tpu.models import rade_features
        from collab_splats_tpu.features.extractors import get_extractor
        from collab_splats_tpu.features.datamanager import _resize_chw

        extractor_names = ("clip-vit", "dinov2")
        print("extracting GT feature maps (offline extractors)...",
              flush=True)
        extractors = {nm: get_extractor(nm) for nm in extractor_names}
        features = []
        for im in images:
            features.append({nm: _resize_chw(ex(np.asarray(im)), 64)
                             for nm, ex in extractors.items()})
        feature_dims = tuple(
            (nm, tuple(features[0][nm].shape)) for nm in extractor_names
        )
        print(f"feature dims: {dict(feature_dims)}", flush=True)
        cfg = rade_features.RadeFeaturesConfig(
            sh_degree=args.sh_degree, background="random",
            render=render_opts,
            use_depth_normal_loss=True,
            regularization_from_iter=args.reg_from,
            feature_dims=feature_dims,
        )
        groups = dict(optim.RADE_FEATURES_GROUPS)
    else:
        features = None
        cfg = rade_gs.RadeGSConfig(
            sh_degree=args.sh_degree, background="random",
            render=render_opts,
            use_depth_normal_loss=True,
            regularization_from_iter=args.reg_from,
        )
        groups = None

    # Seed init (the COLMAP-points-like initialization the pipeline uses):
    # positions from the cloud; colors from the point colors when the GT
    # mode provides them (analytic), gray otherwise.
    if seed_rgb is None:
        dc = jnp.zeros((args.seed_points, 3))
    elif args.sh_degree > 0:
        dc = rgb_to_sh0(seed_rgb)
    else:
        dc = jnp.log(seed_rgb / (1.0 - seed_rgb))   # sigmoid^-1
    init = {
        "means": seed_means,
        "quats": jnp.tile(jnp.array([[1.0, 0, 0, 0]]),
                          (args.seed_points, 1)),
        "scales": jnp.log(jnp.full((args.seed_points, 3), 0.02)),
        "opacities": jnp.full((args.seed_points, 1), 0.0),
        "features_dc": dc,
        "features_rest": jnp.zeros((args.seed_points, n_bases - 1, 3)),
    }
    if args.features:
        init = rade_features.init_feature_params(
            jax.random.PRNGKey(args.seed + 1), init, cfg,
        )
    # Start with headroom: every capacity doubling is a full recompile of
    # the train/refine/eval step family (minutes each on the TPU tunnel);
    # 32k covers the first ~3 doublings a 5k seed would otherwise hit.
    capacity = max(args.capacity, args.seed_points)
    init = pad_to_capacity(init, capacity)
    alive = jnp.arange(capacity) < args.seed_points

    tconf = TrainerConfig(
        model=cfg,
        strategy=strategy.StrategyConfig(),     # full Splatfacto schedule
        max_iterations=args.steps,
        num_downscales=args.num_downscales,
        resolution_schedule=args.res_schedule,
        seed=args.seed,
        scene_scale=1.2,
    )
    tr = Trainer(tconf, cams, images, init, alive, groups=groups,
                 features=features)
    if args.resume is not None:
        resume_path = args.resume
        if resume_path.is_dir():
            from collab_splats_tpu.train.checkpoint import latest_checkpoint

            resume_path = latest_checkpoint(resume_path)
            if resume_path is None:
                raise SystemExit(f"no checkpoint under {args.resume}")
        tr.restore(resume_path)
        print(f"resumed from {resume_path} at step {tr.step}", flush=True)

    t0 = time.time()
    peak_n = args.seed_points
    spill_seen = 0
    nonfinite_seen = 0
    recent = []
    mode = "a" if args.resume is not None else "w"
    if args.resume is not None and hist_path.exists():
        # Drop history rows past the checkpoint step: resuming from a
        # checkpoint older than the last logged step would otherwise
        # duplicate steps in history.jsonl and skew the summary medians
        # (ADVICE r4).  The pre-kill tail is preserved next to the file
        # for kill/resume trajectory comparisons.
        lines = hist_path.read_text().splitlines()
        kept = [ln for ln in lines
                if json.loads(ln).get("step", 0) <= tr.step]
        if len(kept) != len(lines):
            (args.out / "history_prekill.jsonl").write_text(
                "\n".join(lines) + "\n")
            hist_path.write_text(
                ("\n".join(kept) + "\n") if kept else "")
            print(f"truncated history to step {tr.step} "
                  f"({len(lines) - len(kept)} rows moved to "
                  "history_prekill.jsonl)", flush=True)
    with open(hist_path, mode) as hf:
        for i in range(tr.step, args.steps):
            ts = time.time()
            m = tr.train_one_step()
            m["step"] = tr.step
            m["wall_s"] = time.time() - ts
            peak_n = max(peak_n, m["num_gaussians"])
            spill_seen = max(spill_seen, int(m.get("spilled", 0)))
            nonfinite_seen += int(m.get("nonfinite_grad", 0))
            if args.save_every and tr.step % args.save_every == 0:
                # Writes <out>/step-XXXXXXXX.ckpt.npz (save takes a dir).
                tr.save(args.out)
            if tr.step % args.eval_every == 0 or tr.step == args.steps:
                # Multi-camera mean: a single eval camera showed 18 dB
                # sampling transients in r4 (VERDICT weak #5).
                stride = max(len(cams) // max(args.eval_cams, 1), 1)
                evs = [tr.eval_image(c, im) for c, im in
                       zip(cams[::stride], images[::stride])]
                ev = {k: float(np.mean([e[k] for e in evs]))
                      for k in evs[0]}
                m["eval_psnr"] = ev["psnr"]
                m["eval_ssim"] = ev["ssim"]
                el = time.time() - t0
                print(
                    f"step {tr.step:6d}  psnr {ev['psnr']:6.2f}  "
                    f"N {m['num_gaussians']:7d}  cap "
                    f"{tr.alive.shape[0]:7d}  spill {m.get('spilled', 0)}  "
                    f"nfg {nonfinite_seen}  ds {tr.downscale_factor()}  "
                    f"{tr.step / el:5.1f} it/s  [{el:7.1f}s]",
                    flush=True,
                )
            hf.write(json.dumps(
                {k: (float(v) if isinstance(v, (int, float, np.floating))
                     else v) for k, v in m.items()}
            ) + "\n")
            recent.append(m)

    evs = [tr.eval_image(c, im) for c, im in
           zip(cams[::8], images[::8])]
    summary = {
        "steps": args.steps,
        "width": args.width, "height": args.height,
        "analytic_gt": bool(args.analytic_gt),
        "sh_degree": int(args.sh_degree),
        "features": bool(args.features),
        "exact_binning": bool(args.exact_binning),
        "final_psnr_mean": float(np.mean([e["psnr"] for e in evs])),
        "final_ssim_mean": float(np.mean([e["ssim"] for e in evs])),
        "peak_gaussians": int(peak_n),
        "final_gaussians": int(recent[-1]["num_gaussians"]),
        "capacity": int(tr.alive.shape[0]),
        "max_spill_seen": int(spill_seen),
        "nonfinite_grad_steps": int(nonfinite_seen),
        "wall_clock_s": time.time() - t0,
        "steady_it_per_s": float(
            1.0 / np.median([r["wall_s"] for r in recent[-2000:]])
        ),
        "reg_phase_steps": max(args.steps - args.reg_from, 0),
    }
    (args.out / "summary.json").write_text(json.dumps(summary, indent=1))
    print(json.dumps(summary, indent=1), flush=True)


if __name__ == "__main__":
    main()
