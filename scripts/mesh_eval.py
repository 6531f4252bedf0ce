"""Mesh geometry metrics for an analytic-GT training run (VERDICT r4 #3).

Loads a scale_train --analytic-gt checkpoint, extracts a TSDF mesh from
rendered depth maps (the reference's default Open3DTSDFFusion route,
/root/reference/collab_splats/utils/mesh.py:1472-1737), and measures mesh
accuracy / completeness against exact samples of the analytic scene's true
surfaces (reference metrics utils/utils.py:43-60).  Because the GT scene is
closed-form, this quantifies the depth-normal regularization phase's
geometry effect with no scanner noise: run it on the pre-reg checkpoint
(step 14000) and the final one and compare.

Usage:
    python scripts/mesh_eval.py runs/scale_r5/step-00014000.ckpt.npz \
        [--sh-degree 3] [--depth median_depth] [--voxel 0.03] [--cpu]
        [--out runs/scale_r5/mesh_14000]

Prints one JSON line with accuracy (90th-pct distance to GT, lower=better),
completeness (% GT surface within 0.05, higher=better), and mesh size.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt", type=Path)
    ap.add_argument("--sh-degree", type=int, default=3)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--depth", default="median_depth",
                    choices=["median_depth", "depth"])
    ap.add_argument("--voxel", type=float, default=0.03)
    ap.add_argument("--max-dim", type=int, default=320)
    ap.add_argument("--n-cams", type=int, default=32,
                    help="integration views (stride over the 64 orbit)")
    ap.add_argument("--gt-samples", type=int, default=200_000)
    ap.add_argument("--min-component", type=float, default=0.002,
                    help="clean_repair component cut as a fraction of "
                         "total faces.  The exporter default (0.05, the "
                         "reference's single-object setting) deletes "
                         "free-floating spheres wholesale in multi-object "
                         "scenes — each sphere is its own component at "
                         "~0.3%% of the faces.")
    ap.add_argument("--threshold", type=float, default=0.05)
    ap.add_argument("--out", type=Path, default=None,
                    help="write mesh.ply/splats.ply here")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.data import analytic
    from collab_splats_tpu.data.synthetic import orbit_cameras
    from collab_splats_tpu.meshing.exporters import (
        TSDFExporterConfig,
        TSDFFusionExporter,
    )
    from collab_splats_tpu.models import rade_gs
    from collab_splats_tpu.train.checkpoint import load_checkpoint
    from collab_splats_tpu.utils.cache import enable_compilation_cache
    from collab_splats_tpu.utils.metrics import (
        calculate_accuracy,
        calculate_completeness,
    )

    enable_compilation_cache()
    step, params, alive, _ = load_checkpoint(args.ckpt)
    print(f"checkpoint step {step}: "
          f"{int(np.asarray(alive).sum())} alive / {alive.shape[0]}",
          file=sys.stderr, flush=True)

    scene = analytic.default_scene(seed=7)
    cams = orbit_cameras(64, radius=3.2, width=args.width,
                         height=args.height, focal=0.9 * args.width)
    stride = max(len(cams) // args.n_cams, 1)

    mcfg = rade_gs.RadeGSConfig(
        sh_degree=args.sh_degree, background="black",
        render=RenderOptions(rasterize_mode="antialiased"),
        use_depth_normal_loss=False,
    )
    ecfg = TSDFExporterConfig(
        voxel_size=args.voxel,
        sdf_trunc=3.0 * args.voxel,
        depth_trunc=12.0,           # scene depths run ~0.5-7.5 world units
        depth_name=args.depth,
        max_dim=args.max_dim,
        align_floor=False,          # metrics compare in the GT world frame
        min_component_fraction=args.min_component,
    )
    t0 = time.time()
    exporter = TSDFFusionExporter(params, alive, mcfg, ecfg)
    result = exporter.main(cams[::stride], output_dir=args.out)
    verts, faces = result["vertices"], result["faces"]
    print(f"mesh: {len(verts)} verts, {len(faces)} faces "
          f"in {time.time() - t0:.1f}s", file=sys.stderr, flush=True)

    gt_pts = analytic.sample_gt_surface(scene, args.gt_samples)
    if len(verts) == 0:
        print(json.dumps({
            "ckpt": str(args.ckpt), "step": step, "n_vertices": 0,
            "accuracy_p90": None, "completeness_pct": 0.0,
            "note": "empty mesh (no surface crossed the TSDF iso level)",
        }))
        sys.exit(1)
    payload = {
        "ckpt": str(args.ckpt),
        "step": step,
        "depth_name": args.depth,
        "voxel_size": args.voxel,
        "n_vertices": int(len(verts)),
        "n_faces": int(len(faces)),
        "accuracy_p90": calculate_accuracy(verts, gt_pts),
        "completeness_pct": calculate_completeness(
            verts, gt_pts, threshold=args.threshold
        ),
        "threshold": args.threshold,
    }
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
