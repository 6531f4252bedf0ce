"""collab-splats-tpu: TPU-native Gaussian splatting (RaDe-GS + feature
splatting) in JAX/XLA/Pallas.

Public API surface (the TPU build's counterpart of
/root/reference/collab_splats/__init__.py:16-27).  Heavy submodules import
lazily so ``import collab_splats_tpu`` stays cheap.
"""

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "make_camera",
    "RenderOptions",
    "render_tiled",
    "render_tiled_pallas",
    "render_golden",
    "RadeGSConfig",
    "RadeFeaturesConfig",
    "Trainer",
    "TrainerConfig",
    "Splatter",
    "SplatViewer",
    "ConfigLoader",
    "parse_cli_overrides",
    "FullImageDatamanager",
    "TSDFFusionExporter",
    "GroupingClassifier",
]

_LAZY = {
    "Camera": "collab_splats_tpu.core.cameras",
    "make_camera": "collab_splats_tpu.core.cameras",
    "RenderOptions": "collab_splats_tpu.core.options",
    "render_tiled": "collab_splats_tpu.ops.rasterize",
    "render_tiled_pallas": "collab_splats_tpu.ops.rasterize",
    "render_golden": "collab_splats_tpu.core.golden",
    "RadeGSConfig": "collab_splats_tpu.models.rade_gs",
    "RadeFeaturesConfig": "collab_splats_tpu.models.rade_features",
    "Trainer": "collab_splats_tpu.train.trainer",
    "TrainerConfig": "collab_splats_tpu.train.trainer",
    "Splatter": "collab_splats_tpu.pipeline.splatter",
    "SplatViewer": "collab_splats_tpu.pipeline.viewer",
    "ConfigLoader": "collab_splats_tpu.pipeline.config",
    "parse_cli_overrides": "collab_splats_tpu.pipeline.config",
    "FullImageDatamanager": "collab_splats_tpu.data.datamanager",
    "TSDFFusionExporter": "collab_splats_tpu.meshing.exporters",
    "GroupingClassifier": "collab_splats_tpu.features.grouping",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'collab_splats_tpu' has no attribute {name!r}")
