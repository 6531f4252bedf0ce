"""One-step TPU-vs-CPU gradient parity probe.

Renders the scale_train seed state (5k gaussians, 640x360 at the ds=4
schedule) and compares loss, rendered maps, and per-group gradients
between the platform backend (TPU under the driver) and a CPU f32
reference of the SAME function.  Pinpoints which pipeline stage still
diverges numerically (round-4: the TPU run trained ~7 dB worse at step
500 than the identical CPU run).

Usage:  python scripts/grad_parity_probe.py [--width 640 --height 360]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build(width, height, legacy=False):
    import jax
    import jax.numpy as jnp

    from scripts.scale_train import make_scene
    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.models import rade_gs
    from collab_splats_tpu.models.gaussians import pad_to_capacity
    from collab_splats_tpu.train import losses

    gt, cams = make_scene(jax.random.PRNGKey(1), width=width, height=height)
    n_gt = int(gt["means"].shape[0])
    cfg = rade_gs.RadeGSConfig(
        sh_degree=0, background="black",
        render=RenderOptions(rasterize_mode="antialiased",
                             exact_binning=False,
                             fused_vjp=not legacy),
    )
    gt_alive = jnp.ones(n_gt, bool)

    kp = jax.random.PRNGKey(42)
    sel = jax.random.choice(kp, n_gt, (5000,), replace=False)
    init = {
        "means": gt["means"][sel] + 0.02 * jax.random.normal(kp, (5000, 3)),
        "quats": jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (5000, 1)),
        "scales": jnp.log(jnp.full((5000, 3), 0.02)),
        "opacities": jnp.full((5000, 1), 0.0),
        "features_dc": jnp.zeros((5000, 3)),
        "features_rest": jnp.zeros((5000, 0, 3)),
    }
    init = pad_to_capacity(init, 8192)
    alive = jnp.arange(8192) < 5000
    cam = cams[3].downscaled(4)

    def gt_render(gt, cam):
        return rade_gs.get_outputs(gt, gt_alive, cam, 0, cfg,
                                   training=False)[0]["rgb"]

    # Callers (run_platform, grad_bisect) define their own loss closures
    # over the returned pieces; build() only assembles the scene/state.
    return locals()


def run_platform(platform, width, height, legacy=False):
    import jax

    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from collab_splats_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    env = build(width, height, legacy=legacy)
    cam, cfg = env["cam"], env["cfg"]
    rade_gs = sys.modules["collab_splats_tpu.models.rade_gs"]
    params, alive = env["init"], env["alive"]

    gt_img = jax.jit(env["gt_render"])(env["gt"], cam)

    def loss_fn(p):
        outputs, _ = rade_gs.get_outputs(p, alive, cam, 0, cfg,
                                         training=True)
        loss, _ = rade_gs.get_loss(outputs, gt_img, p, alive, 0, cfg)
        return loss, outputs

    (loss, outputs), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    out = {
        "platform": jax.default_backend(),
        "loss": np.asarray(loss),
        "rgb": np.asarray(outputs["rgb"]),
        "depth": np.asarray(outputs["depth"]),
        "gt": np.asarray(gt_img),
        "grads": {k: np.asarray(v) for k, v in grads.items()},
    }
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--save", type=Path, default=None,
                    help="save result npz instead of comparing (two-process "
                         "mode: save on one platform, compare on the other)")
    ap.add_argument("--ref", type=Path, default=None,
                    help="npz from a --save run to compare against")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--legacy", action="store_true",
                    help="legacy composite_chunk VJP instead of the fused "
                         "analytic compositing VJP")
    args = ap.parse_args()

    res = run_platform("cpu" if args.cpu else "native", args.width,
                       args.height, legacy=args.legacy)
    print(f"platform={res['platform']} loss={float(res['loss']):.6f}")
    if args.save:
        np.savez(args.save, loss=res["loss"], rgb=res["rgb"],
                 depth=res["depth"], gt=res["gt"],
                 **{f"grad_{k}": v for k, v in res["grads"].items()})
        print(f"saved {args.save}")
        return
    if args.ref:
        ref = np.load(args.ref)
        def rel(a, b):
            d = np.linalg.norm(a - b)
            return d / (np.linalg.norm(b) + 1e-30)
        print(f"gt image rel diff:  {rel(res['gt'], ref['gt']):.3e}")
        print(f"rgb map rel diff:   {rel(res['rgb'], ref['rgb']):.3e}")
        print(f"depth map rel diff: {rel(res['depth'], ref['depth']):.3e}")
        print(f"loss: {float(res['loss']):.6f} vs {float(ref['loss']):.6f}")
        for k, v in res["grads"].items():
            r = ref[f"grad_{k}"]
            if v.size == 0:
                continue
            cos = float(np.sum(v * r) /
                        (np.linalg.norm(v) * np.linalg.norm(r) + 1e-30))
            print(f"grad {k:14s} rel {rel(v, r):.3e}  cos {cos:.6f}")


if __name__ == "__main__":
    main()
