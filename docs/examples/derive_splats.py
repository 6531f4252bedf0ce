"""Derive a splat model for a scene — script form of the reference's
``derive_splats.ipynb`` (SURVEY.md §2a #19).

Runs the full pipeline (preprocess -> train -> mesh) on a dataset directory
containing ``transforms.json`` (or generates a synthetic one with
``--synthetic``).

Usage:
    python docs/examples/derive_splats.py --input /path/to/scene --method rade-gs
    python docs/examples/derive_splats.py --synthetic /tmp/demo
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="dataset dir with transforms.json")
    ap.add_argument("--synthetic", help="generate a synthetic scene here")
    ap.add_argument("--method", default="rade-gs")
    ap.add_argument("--iterations", type=int, default=2000)
    ap.add_argument("--output")
    args = ap.parse_args()

    if args.synthetic:
        from collab_splats_tpu.data.synthetic import write_synthetic_dataset

        input_dir = Path(args.synthetic) / "input"
        write_synthetic_dataset(input_dir, n_cams=12, n_gaussians=400,
                                width=96, height=96)
        output = args.output or str(Path(args.synthetic) / "out")
    else:
        input_dir = Path(args.input)
        output = args.output or str(input_dir.parent / "out")

    from collab_splats_tpu.pipeline.splatter import Splatter

    s = Splatter({
        "file_path": str(input_dir),
        "method": args.method,
        "output_path": output,
    })
    s._training_config = {"max_iterations": args.iterations, "sh_degree": 0}
    s._meshing_config = {"voxel_size": 0.02, "depth_trunc": 4.0,
                         "align_floor": False}
    s.run_pipeline()
    print(f"Outputs in {output}")


if __name__ == "__main__":
    main()
