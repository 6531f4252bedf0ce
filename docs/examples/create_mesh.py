"""Mesh extraction + text query + clustering — script form of the
reference's ``create_mesh.ipynb`` (paper Fig. 3 pipeline, SURVEY.md §2a #19).

Usage:
    python docs/examples/create_mesh.py --output /tmp/demo/out \
        --positive "red disk" --negative object
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dataset dir")
    ap.add_argument("--output", required=True, help="pipeline output dir")
    ap.add_argument("--method", default="rade-features")
    ap.add_argument("--positive", nargs="+", default=[""])
    ap.add_argument("--negative", nargs="+", default=["object"])
    ap.add_argument("--voxel-size", type=float, default=0.02)
    args = ap.parse_args()

    from collab_splats_tpu.pipeline.splatter import Splatter
    from collab_splats_tpu.meshing.repair import face_components

    s = Splatter({
        "file_path": args.input,
        "method": args.method,
        "output_path": args.output,
    })
    result = s.mesh(mesher_type="TSDFFusion", voxel_size=args.voxel_size,
                    depth_trunc=4.0, align_floor=False)
    print(f"mesh: {len(result['vertices'])} verts, "
          f"{len(result['faces'])} faces")

    # Connected-component clustering (reference mesh_clustering).
    labels = face_components(result["vertices"], result["faces"])
    print(f"components: {labels.max() + 1}")

    # Semantic query over the mesh.
    if "features" in result:
        sims = s.query_mesh(
            args.positive, args.negative,
            output_fn=Path(args.output) / "mesh" / "queried.ply",
        )
        print(f"query sims: min {sims.min():.3f} max {sims.max():.3f}")


if __name__ == "__main__":
    main()
