#!/usr/bin/env python
"""Generate the docs/notebooks/*.ipynb set from cell specs.

The reference ships three notebooks (derive_splats / create_mesh /
visualization, SURVEY.md §2a #19, docs/paper_figures.md); this repo keeps
the runnable logic in docs/examples/*.py and generates real .ipynb wrappers
here so notebook users get the same entry points.  Regenerate with:

    python scripts/make_notebooks.py
"""

from __future__ import annotations

import json
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]


def nb(cells):
    out = {
        "cells": [],
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }
    for kind, src in cells:
        cell = {
            "cell_type": kind,
            "metadata": {},
            "source": src.splitlines(keepends=True),
        }
        if kind == "code":
            cell["execution_count"] = None
            cell["outputs"] = []
        out["cells"].append(cell)
    return out


SETUP = """\
import sys
from pathlib import Path

sys.path.insert(0, str(Path.cwd().parent.parent))  # repo root
"""

DERIVE = [
    ("markdown", """\
# Derive splats

End-to-end pipeline on a scene directory: preprocess (SfM or an existing
`transforms.json`) → train a RaDe-GS / RaDe-Features model → extract a mesh.
Mirrors the reference's `derive_splats.ipynb`.  This demo builds a synthetic
orbit scene so it runs fully offline; point `file_path` at a real dataset
(video or image directory) to reproduce the fieldwork pipeline
(`configs/datasets/*.yaml`).
"""),
    ("code", SETUP),
    ("code", """\
from collab_splats_tpu.data.synthetic import write_synthetic_dataset

scene = Path("/tmp/nb_demo")
input_dir = scene / "input"
write_synthetic_dataset(input_dir, n_cams=12, n_gaussians=400,
                        width=96, height=96)
"""),
    ("code", """\
from collab_splats_tpu.pipeline.splatter import Splatter

splatter = Splatter({
    "file_path": str(input_dir),
    "method": "rade-gs",
    "output_path": str(scene / "out"),
})
splatter._training_config = {"max_iterations": 500, "sh_degree": 0}
splatter._meshing_config = {"voxel_size": 0.02, "depth_trunc": 4.0,
                            "align_floor": False}
splatter.run_pipeline()
"""),
    ("markdown", "Each stage is idempotent — re-running skips completed "
                 "stages unless `overwrite=True` (same resume semantics as "
                 "the reference wrapper)."),
]

CREATE_MESH = [
    ("markdown", """\
# Create mesh (+ semantic text query)

Load a trained run, extract a mesh with the default TSDF exporter, cluster
its components, then color the mesh by CLIP text-query similarity — the
reference's `create_mesh.ipynb` (paper Fig. 3 path).  Text queries use the
real CLIP towers when converted weights exist
(`scripts/convert_weights.py`); otherwise the offline hash-projection
stand-in keeps the pipeline runnable.
"""),
    ("code", SETUP),
    ("code", """\
from collab_splats_tpu.pipeline.splatter import Splatter

# Text queries need the rade-features head, so this notebook trains its
# own short feature run (idempotent: re-running reuses the checkpoints).
splatter = Splatter({
    "file_path": "/tmp/nb_demo/input",
    "method": "rade-features",
    "output_path": "/tmp/nb_demo/out_features",
})
splatter.preprocess()
splatter.train(max_iterations=500, sh_degree=0)
result = splatter.mesh(mesher_type="TSDFFusion", voxel_size=0.02,
                       depth_trunc=4.0, align_floor=False)
print(len(result["vertices"]), "vertices", len(result["faces"]), "faces")
"""),
    ("code", """\
from collab_splats_tpu.meshing.repair import face_components

labels = face_components(result["vertices"], result["faces"])
print("components:", labels.max() + 1)
"""),
    ("code", """\
sims = splatter.query_mesh(
    ["a red cube"], ["background"], method="pairwise",
    output_fn=Path("/tmp/nb_demo/out_features/mesh/queried.ply"),
)
print("similarity range:", sims.min(), sims.max())
"""),
]

VISUALIZATION = [
    ("markdown", """\
# Visualization

Render splat/mesh figure panels with the built-in visualizer — the
reference's `visualization.ipynb` (PyVista there; here every panel is
rendered through the framework's own TPU renderer, so figures come from the
exact production code path).
"""),
    ("code", SETUP),
    ("code", """\
from collab_splats_tpu.data.datamanager import FullImageDatamanager
from collab_splats_tpu.pipeline.splatter import Splatter
from collab_splats_tpu.utils.visualization import save_figure, visualize_splat

splatter = Splatter({
    "file_path": "/tmp/nb_demo/input",
    "method": "rade-gs",
    "output_path": "/tmp/nb_demo/out",
})
step, params, alive, spec, model_cfg = splatter.load_model()
dm = FullImageDatamanager.from_transforms_json(
    splatter.preproc_dir / "transforms.json"
)
cam = dm.train_cameras[0]
"""),
    ("code", """\
panels = {
    mode: visualize_splat(params, alive, cam, model_cfg, mode)
    for mode in ("rgb", "depth", "median_depth", "normals", "accumulation")
}
panels["ground truth"] = dm.train_images[0] / 255.0
save_figure(panels, "/tmp/nb_demo/panels.png")
"""),
    ("code", """\
splatter.plot_mesh(output_fn="/tmp/nb_demo/mesh_view.png")
"""),
]


def main() -> None:
    out_dir = ROOT / "docs" / "notebooks"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name, cells in [("derive_splats", DERIVE),
                        ("create_mesh", CREATE_MESH),
                        ("visualization", VISUALIZATION)]:
        path = out_dir / f"{name}.ipynb"
        path.write_text(json.dumps(nb(cells), indent=1))
        print("wrote", path)


if __name__ == "__main__":
    main()
