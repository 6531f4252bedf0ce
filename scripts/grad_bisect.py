"""Stage-by-stage TPU-vs-CPU gradient bisection at the scale_train state.

Computes gradients of progressively larger pipeline slices and compares
across platforms (run --cpu --save ref.npz first, then --ref ref.npz on
the TPU).  Stages:

    proj     sum of weighted Projection fields (projection bwd only)
    rsum     sum(rgb) through the full renderer
    l1       plain L1 loss (renderer + loss, no SSIM)
    full     rgb_loss (L1 + SSIM) — the probe's loss

Usage:
    python scripts/grad_bisect.py --cpu --save /tmp/gb_cpu.npz
    python scripts/grad_bisect.py --ref /tmp/gb_cpu.npz
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--save", type=Path, default=None)
    ap.add_argument("--ref", type=Path, default=None)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from collab_splats_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from scripts.grad_parity_probe import build
    from collab_splats_tpu.core.projection import project_gaussians
    from collab_splats_tpu.models import rade_gs
    from collab_splats_tpu.train import losses as L

    env = build(args.width, args.height)
    cam, cfg, alive, params = env["cam"], env["cfg"], env["alive"], env["init"]
    gt_img = jax.jit(env["gt_render"])(env["gt"], cam)
    opts = cfg.render

    def proj_loss(p):
        opac = jax.nn.sigmoid(p["opacities"][:, 0])
        pr = project_gaussians(
            p["means"], p["quats"], jnp.exp(p["scales"]),
            cam.viewmat(), cam.K, cam.width, cam.height,
            eps2d=opts.eps2d, opacities=opac,
        )
        live = alive & pr.valid
        m = live.astype(jnp.float32)
        return (jnp.sum(jnp.sin(pr.mean2d) * m[:, None])
                + jnp.sum(pr.conic * m[:, None]) * 1e-3
                + jnp.sum(pr.depth * m) * 1e-2
                + jnp.sum(pr.compensation * m)
                + jnp.sum(pr.plane * m[:, None]) * 1e-3)

    def render_rgb(p):
        outputs, _ = rade_gs.get_outputs(p, alive, cam, 0, cfg,
                                         training=True)
        return outputs["rgb"]

    def rsum_loss(p):
        return jnp.sum(render_rgb(p))

    def l1_loss(p):
        return jnp.mean(jnp.abs(render_rgb(p) - gt_img))

    def full_loss(p):
        outputs, _ = rade_gs.get_outputs(p, alive, cam, 0, cfg,
                                         training=True)
        return rade_gs.get_loss(outputs, gt_img, p, alive, 0, cfg)[0]

    stages = {"proj": proj_loss, "rsum": rsum_loss, "l1": l1_loss,
              "full": full_loss}
    out = {"platform": jax.default_backend()}
    for name, fn in stages.items():
        val, grads = jax.jit(jax.value_and_grad(fn))(params)
        out[f"{name}_loss"] = np.asarray(val)
        for k, v in grads.items():
            if v.size:
                out[f"{name}_{k}"] = np.asarray(v)
        print(f"{name}: loss {float(val):.6f}", flush=True)

    if args.save:
        np.savez(args.save, **out)
        print(f"saved {args.save}")
    if args.ref:
        ref = np.load(args.ref)
        for name in stages:
            print(f"-- {name} (loss {float(out[f'{name}_loss']):.6f} vs "
                  f"{float(ref[f'{name}_loss']):.6f})")
            for k in ["means", "quats", "scales", "opacities",
                      "features_dc"]:
                key = f"{name}_{k}"
                if key not in ref or key not in out:
                    continue
                v, r = out[key], ref[key]
                rel = np.linalg.norm(v - r) / (np.linalg.norm(r) + 1e-30)
                cos = float(np.sum(v * r) /
                            (np.linalg.norm(v) * np.linalg.norm(r) + 1e-30))
                print(f"   {k:12s} rel {rel:.3e} cos {cos:.4f} "
                      f"(norm {np.linalg.norm(v):.3e} vs "
                      f"{np.linalg.norm(r):.3e})")


if __name__ == "__main__":
    main()
