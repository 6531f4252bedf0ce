"""Compiled-memory proof of the tile-sharded step's O(C/G + G*S) claim.

VERDICT r4 #7: the tile-sharded exchange (parallel/tiles.py band-routing
all_to_all) is *claimed* to shrink per-device compositing buffers from
O(C) (all-gather exchange) to O(C/G + G*send_cap); this script measures it
with XLA's compiled memory analysis instead of asserting it.

On a virtual 8-device CPU mesh it AOT-compiles the production sharded
train step (parallel/train.make_sharded_train_step) in both exchange
layouts at bench-scale shapes and reports
``compiled.memory_analysis().temp_size_in_bytes`` (the transient
activation pool — parameters/optimizer rows are sharded identically in
both layouts) across a ``send_cap`` sweep.

Usage:
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/shard_memory_report.py [--capacity 262144]
        [--width 1280 --height 720] [--json out.json]

(The script also forces the CPU platform in-process, so plain
``python scripts/shard_memory_report.py`` works under the axon plugin.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--capacity", type=int, default=262144)
    ap.add_argument("--width", type=int, default=1280)
    # 704 = 44 tile rows: divisible into 2 and 4 bands (the tile-sharded
    # band split requires rows % n_gauss == 0; 720p's 45 rows are not).
    ap.add_argument("--height", type=int, default=704)
    ap.add_argument("--max-intersections", type=int, default=1 << 20)
    ap.add_argument("--tile-capacity", type=int, default=256)
    ap.add_argument("--n-data", type=int, default=4)
    ap.add_argument("--n-gauss", type=int, default=2)
    ap.add_argument("--send-caps", type=str, default="full,1/2,1/4,1/8",
                    help="comma list; 'full' = C/G, '1/k' = C/(k*G)")
    ap.add_argument("--json", type=Path, default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.models import rade_gs
    from collab_splats_tpu.parallel import mesh as pmesh
    from collab_splats_tpu.parallel.train import (
        CameraBatch,
        make_sharded_train_step,
    )
    from collab_splats_tpu.train import optim, strategy

    assert len(jax.devices()) >= args.n_data * args.n_gauss, (
        f"need {args.n_data * args.n_gauss} virtual devices, have "
        f"{len(jax.devices())} — set "
        "XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )
    mesh = pmesh.make_mesh(n_data=args.n_data, n_gauss=args.n_gauss)
    C, G = args.capacity, args.n_gauss
    shard = C // G

    cfg = rade_gs.RadeGSConfig(
        sh_degree=0, background="black",
        render=RenderOptions(
            rasterize_mode="antialiased",
            max_intersections=args.max_intersections,
            tile_capacity=args.tile_capacity,
            exact_binning=False,
        ),
    )
    params_shape = {
        "means": (C, 3), "scales": (C, 3), "quats": (C, 4),
        "opacities": (C, 1), "features_dc": (C, 3),
        "features_rest": (C, 0, 3),
    }
    params_aval = {k: jax.ShapeDtypeStruct(s, jnp.float32)
                   for k, s in params_shape.items()}
    opt = optim.make_optimizer(
        optim.RADE_GS_GROUPS, optim.default_labels(params_aval)
    )
    opt_state_aval = jax.eval_shape(opt.init, params_aval)
    strat_aval = jax.eval_shape(lambda: strategy.init_state(C))
    alive_aval = jax.ShapeDtypeStruct((C,), jnp.bool_)
    cams_aval = CameraBatch(
        K=jax.ShapeDtypeStruct((args.n_data, 3, 3), jnp.float32),
        c2w=jax.ShapeDtypeStruct((args.n_data, 4, 4), jnp.float32),
    )
    imgs_aval = jax.ShapeDtypeStruct(
        (args.n_data, args.height, args.width, 3), jnp.float32
    )
    step_aval = jax.ShapeDtypeStruct((), jnp.int32)
    key_aval = jax.ShapeDtypeStruct((2,), jnp.uint32)

    def analyze(tile_sharded: bool, send_cap=None):
        fn = make_sharded_train_step(
            mesh, opt, cfg, args.width, args.height, C,
            opt_state_aval, reg_active=False,
            tile_sharded=tile_sharded, send_cap=send_cap,
        )
        t0 = time.time()
        compiled = (
            jax.jit(fn)
            .lower(params_aval, alive_aval, opt_state_aval, strat_aval,
                   cams_aval, imgs_aval, step_aval, key_aval)
            .compile()
        )
        ma = compiled.memory_analysis()
        row = {
            "layout": ("tile_sharded" if tile_sharded else "all_gather"),
            "send_cap": send_cap,
            "temp_bytes": int(getattr(ma, "temp_size_in_bytes", -1)),
            "argument_bytes": int(getattr(ma, "argument_size_in_bytes", -1)),
            "output_bytes": int(getattr(ma, "output_size_in_bytes", -1)),
            "compile_s": round(time.time() - t0, 1),
        }
        print(f"{row['layout']:<13} S={str(send_cap):>8}  "
              f"temp {row['temp_bytes']/2**20:9.1f} MiB  "
              f"args {row['argument_bytes']/2**20:9.1f} MiB  "
              f"[{row['compile_s']}s compile]", flush=True)
        return row

    print(f"mesh data={args.n_data} gauss={G}, C={C} (shard {shard}), "
          f"{args.width}x{args.height}, "
          f"m_cap={args.max_intersections}, K={args.tile_capacity}",
          flush=True)
    rows = [analyze(tile_sharded=False)]
    for tok in args.send_caps.split(","):
        tok = tok.strip()
        s = shard if tok == "full" else shard // int(tok.split("/")[1])
        rows.append(analyze(tile_sharded=True, send_cap=s))

    if args.json:
        args.json.write_text(json.dumps({
            "capacity": C, "n_data": args.n_data, "n_gauss": G,
            "width": args.width, "height": args.height,
            "max_intersections": args.max_intersections,
            "tile_capacity": args.tile_capacity,
            "rows": rows,
        }, indent=1))
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
