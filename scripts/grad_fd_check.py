"""Directional finite-difference check of the train-step gradient.

The TPU and CPU forwards agree to ~1e-4 at the scale_train seed state, but
their gradients differ by 1e3-1e4x (scripts/grad_parity_probe.py).  The
finite-difference directional derivative is therefore (nearly) the same
number on both platforms — comparing it against <grad, d> on each platform
identifies which backward is lying.

Usage:  python scripts/grad_fd_check.py [--cpu] [--eps 1e-3 ...]
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
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--group", default="means")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from collab_splats_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from scripts.grad_parity_probe import build
    from collab_splats_tpu.models import rade_gs

    env = build(args.width, args.height)
    cam, cfg, alive = env["cam"], env["cfg"], env["alive"]
    params = env["init"]
    gt_img = jax.jit(env["gt_render"])(env["gt"], cam)

    def loss_fn(p):
        outputs, _ = rade_gs.get_outputs(p, alive, cam, 0, cfg,
                                         training=True)
        return rade_gs.get_loss(outputs, gt_img, p, alive, 0, cfg)[0]

    loss_j = jax.jit(loss_fn)
    grad_j = jax.jit(jax.grad(loss_fn))

    g = grad_j(params)[args.group]
    d = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), g.shape), np.float64)
    d[5000:] = 0.0      # only alive rows
    d /= np.linalg.norm(d)
    dj = jnp.asarray(d, jnp.float32)
    dot = float(jnp.sum(g * dj))

    l0 = float(loss_j(params))
    print(f"platform={jax.default_backend()}  loss={l0:.6f}  "
          f"<grad,{args.group}-dir>={dot:.6e}")
    for eps in [1e-2, 1e-3, 1e-4]:
        pp = dict(params)
        pp[args.group] = params[args.group] + eps * dj
        pm = dict(params)
        pm[args.group] = params[args.group] - eps * dj
        fd = (float(loss_j(pp)) - float(loss_j(pm))) / (2 * eps)
        print(f"  eps={eps:.0e}  central-fd={fd:.6e}  "
              f"ratio grad/fd={dot / fd if fd else float('inf'):.4f}")


if __name__ == "__main__":
    main()
