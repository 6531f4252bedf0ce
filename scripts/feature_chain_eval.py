"""End-to-end feature chain on a scale_train --features checkpoint.

VERDICT r4 #4, second half: after training rade-features at scale, drive
the full feature→mesh→query chain on the resulting checkpoint —

    1. load the checkpoint (13-dim latents + decoder subtree),
    2. extract a TSDF mesh with per-vertex latent transfer (the fused
       16-channel rasterization feeds the TSDF colors AND the KNN latent
       transfer; reference Open3DTSDFFusion.main, utils/mesh.py:1681-1702),
    3. decode per-vertex latents and run a text query against the
       extractor's text tower (reference Splatter.query_mesh,
       wrapper/splatter.py:502-565),
    4. write mesh.ply + a turbo-colormapped queried PLY + a JSON line of
       chain statistics.

Usage:
    python scripts/feature_chain_eval.py runs/scale_r5f \
        [--positive sphere] [--negative floor] [--out runs/scale_r5f/mesh]
        [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir", type=Path,
                    help="scale_train --features output dir (picks the "
                         "latest checkpoint) or a step-*.ckpt.npz file")
    ap.add_argument("--positive", nargs="+", default=["sphere"])
    ap.add_argument("--negative", nargs="+", default=["floor", "wall"])
    ap.add_argument("--method", default="pairwise",
                    choices=["standard", "pairwise"])
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--voxel", type=float, default=0.03)
    ap.add_argument("--max-dim", type=int, default=320)
    ap.add_argument("--n-cams", type=int, default=32)
    ap.add_argument("--out", type=Path, default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.core.options import RenderOptions
    from collab_splats_tpu.data.synthetic import orbit_cameras
    from collab_splats_tpu.features.extractors import get_extractor
    from collab_splats_tpu.meshing.exporters import (
        TSDFExporterConfig,
        TSDFFusionExporter,
    )
    from collab_splats_tpu.models import rade_features
    from collab_splats_tpu.train.checkpoint import (
        latest_checkpoint,
        load_checkpoint,
    )
    from collab_splats_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ckpt = args.run_dir
    if ckpt.is_dir():
        ckpt = latest_checkpoint(ckpt)
        if ckpt is None:
            raise SystemExit(f"no checkpoint under {args.run_dir}")
    step, params, alive, _ = load_checkpoint(ckpt)
    if "distill_features" not in params or "decoder" not in params:
        raise SystemExit(f"{ckpt} is not a rade-features checkpoint "
                         "(no distill_features/decoder)")
    latent_dim = params["distill_features"].shape[1]
    print(f"checkpoint step {step}: {int(np.asarray(alive).sum())} alive, "
          f"latent_dim {latent_dim}", file=sys.stderr, flush=True)

    # Reconstruct feature_dims from the decoder branch head shapes so the
    # decode path needs no sidecar config.
    feature_dims = []
    for k, v in params["decoder"].items():
        if k.startswith("branch_") and k.endswith("_w"):
            name = k[len("branch_"):-len("_w")]
            feature_dims.append((name, (int(v.shape[1]), 1, 1)))
    main_name = ("clip-vit" if any(n == "clip-vit" for n, _ in feature_dims)
                 else feature_dims[0][0])
    cfg = rade_features.RadeFeaturesConfig(
        sh_degree=0, background="black",
        render=RenderOptions(rasterize_mode="antialiased"),
        feature_dims=tuple(feature_dims),
        main_feature_name=main_name,
        similarity_method=args.method,
    )

    out_dir = args.out or (ckpt.parent / f"mesh_{step:06d}")
    cams = orbit_cameras(64, radius=3.2, width=args.width,
                         height=args.height, focal=0.9 * args.width)
    stride = max(len(cams) // args.n_cams, 1)
    ecfg = TSDFExporterConfig(
        voxel_size=args.voxel, sdf_trunc=3.0 * args.voxel,
        depth_trunc=12.0, max_dim=args.max_dim, align_floor=False,
    )
    exporter = TSDFFusionExporter(params, alive, cfg, ecfg)
    result = exporter.main(cams[::stride], output_dir=out_dir)
    verts = result["vertices"]
    vfeats = result.get("features")
    assert vfeats is not None and vfeats.shape == (len(verts), latent_dim), (
        "latent transfer missing from mesh result"
    )
    print(f"mesh: {len(verts)} verts, {len(result['faces'])} faces, "
          f"per-vertex latents {vfeats.shape}", file=sys.stderr, flush=True)

    # Text query through the decoder + text tower (hash-projection fallback
    # offline; released CLIP text transformer when weights exist).
    enc = get_extractor(main_name)
    prompts = list(args.positive) + list(args.negative)
    emb = jnp.asarray(enc.encode_text(prompts))
    sims = np.asarray(rade_features.query_vertices(
        params["decoder"], jnp.asarray(vfeats), emb, len(args.positive), cfg
    ))

    from collab_splats_tpu.data.ply import write_ply

    lo, hi = float(sims.min()), float(sims.max())
    norm = (sims - lo) / max(hi - lo, 1e-9)
    try:
        import matplotlib

        colors = matplotlib.colormaps["turbo"](norm)[:, :3]
    except Exception:  # noqa: BLE001 — colormap is presentation-only
        colors = np.stack([norm, np.zeros_like(norm), 1 - norm], axis=1)
    queried = out_dir / "mesh_queried.ply"
    write_ply(str(queried), verts, colors=colors.astype(np.float32),
              faces=result["faces"])

    print(json.dumps({
        "ckpt": str(ckpt), "step": step,
        "n_vertices": int(len(verts)), "latent_dim": int(latent_dim),
        "positive": args.positive, "negative": args.negative,
        "similarity_min": lo, "similarity_max": hi,
        "similarity_mean": float(sims.mean()),
        "queried_ply": str(queried),
    }))


if __name__ == "__main__":
    main()
