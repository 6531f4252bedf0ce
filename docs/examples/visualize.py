"""Render figure panels from a trained run — script form of the reference's
``visualization.ipynb`` (SURVEY.md §2a #19).

Usage:
    python docs/examples/visualize.py --input /tmp/demo/input \
        --output /tmp/demo/out --figure /tmp/demo/panels.png
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", default="rade-gs")
    ap.add_argument("--figure", default="panels.png")
    args = ap.parse_args()

    from collab_splats_tpu.data.datamanager import FullImageDatamanager
    from collab_splats_tpu.pipeline.splatter import Splatter
    from collab_splats_tpu.utils.visualization import save_figure, visualize_splat

    s = Splatter({
        "file_path": args.input,
        "method": args.method,
        "output_path": args.output,
    })
    step, params, alive, spec, model_cfg = s.load_model()
    dm = FullImageDatamanager.from_transforms_json(
        s.preproc_dir / "transforms.json"
    )
    cam = dm.train_cameras[0]
    panels = {
        mode: visualize_splat(params, alive, cam, model_cfg, mode)
        for mode in ("rgb", "depth", "median_depth", "normals",
                     "accumulation")
    }
    panels["ground truth"] = dm.train_images[0] / 255.0
    save_figure(panels, args.figure)
    print(f"saved {args.figure}")


if __name__ == "__main__":
    main()
