"""Mesh exporters: render-integrate-extract pipelines over a trained splat.

TPU-native re-derivation of the reference's exporter suite
(utils/mesh.py:584-1737).  The default ``TSDFFusionExporter`` mirrors
``Open3DTSDFFusion.main()`` (mesh.py:1499-1737, call stack SURVEY.md §3.4):

  1. export ``splats.ply`` (means, SH0 colors, smallest-axis normals),
  2. one render per training frame -> TSDF integrate (depth map selected by
     ``depth_name``, default median_depth per base.yaml:34),
  3. iso-surface extraction + clean/repair,
  4. color / normal / latent-feature transfer to vertices,
  5. optional floor alignment,
  6. write mesh.ply + mesh_features.npz; return {"mesh", "features"}.

``GaussiansToPoissonExporter`` covers the point-based route (mesh.py:642-830)
with normal-equipped splat point clouds; full Poisson reconstruction is the
C++ module's job (cpp/) — until then the TSDF path is primary, matching the
reference's own default.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera
from ..core.projection import min_axis_normal
from ..core.sh import sh0_to_rgb
from ..data.ply import write_ply
from ..models import rade_gs
from ..models.gaussians import GaussianParams
from . import align, repair, transfer
from .marching import marching_tetrahedra, trilinear_sample
from .tsdf import TSDFConfig, integrate, volume_from_bounds


@dataclasses.dataclass(frozen=True)
class TSDFExporterConfig:
    """Defaults follow docs/splats/configs/base.yaml:32-42."""

    voxel_size: float = 0.01
    sdf_trunc: float = 0.03
    depth_trunc: float = 1.0
    depth_name: str = "median_depth"    # "median_depth" | "depth"
    alpha_thresh: float = 0.5
    max_dim: int = 384
    clean_repair: bool = True
    min_component_fraction: float = 0.05
    max_hole_edges: int = 64
    align_floor: bool = True
    transfer_k: int = 5


class TSDFFusionExporter:
    """The default mesh exporter (reference Open3DTSDFFusion)."""

    def __init__(
        self,
        params: GaussianParams,
        alive: jax.Array,
        model_config: rade_gs.RadeGSConfig,
        config: TSDFExporterConfig = TSDFExporterConfig(),
    ):
        self.params = params
        self.alive = alive
        self.model_config = model_config
        self.config = config

    def export_splats_ply(self, path: str | Path) -> None:
        """splats.ply: means + SH0 colors + smallest-axis normals
        (mesh.py:1543-1558)."""
        alive = np.asarray(self.alive)
        means = np.asarray(self.params["means"])[alive]
        colors = np.clip(
            np.asarray(sh0_to_rgb(self.params["features_dc"]))[alive], 0, 1
        )
        normals = np.asarray(
            min_axis_normal(self.params["quats"], jnp.exp(self.params["scales"]))
        )[alive]
        write_ply(str(path), means, colors=colors, normals=normals)

    def main(
        self,
        cameras: Sequence[Camera],
        output_dir: Optional[str | Path] = None,
    ) -> Dict[str, np.ndarray]:
        cfg = self.config
        mcfg = self.model_config
        alive_np = np.asarray(self.alive)
        pts = np.asarray(self.params["means"])[alive_np]
        lo, hi = pts.min(0) - 0.1, pts.max(0) + 0.1
        latent = mcfg.latent_dim
        tcfg, volume = volume_from_bounds(
            lo, hi, cfg.voxel_size, cfg.sdf_trunc, cfg.depth_trunc,
            feature_dim=latent, max_dim=cfg.max_dim,
        )

        render = jax.jit(
            lambda cam: rade_gs.get_outputs(
                self.params, self.alive, cam, 0, mcfg, training=False
            )[0]
        )
        integ = jax.jit(
            lambda vol, depth, rgb, cam, feats, alpha: integrate(
                vol, depth, rgb, cam, tcfg, features=feats, alpha=alpha,
                alpha_thresh=cfg.alpha_thresh,
            )
        )
        for cam in cameras:
            out = render(cam)
            depth = out[cfg.depth_name]
            feats = out.get("features") if latent else None
            volume = integ(volume, depth, out["rgb"], cam, feats,
                           out["accumulation"])

        tsdf = np.asarray(volume.tsdf)
        weight = np.asarray(volume.weight)
        verts_vox, faces = marching_tetrahedra(tsdf, mask=weight > 0)
        if len(faces) and cfg.clean_repair:
            verts_vox, faces = repair.clean_repair_mesh(
                verts_vox, faces, cfg.min_component_fraction,
                cfg.max_hole_edges,
            )

        verts = verts_vox * tcfg.voxel_size + np.asarray(tcfg.origin)
        colors = trilinear_sample(np.asarray(volume.color), verts_vox)
        normals_g = np.asarray(
            min_axis_normal(self.params["quats"], jnp.exp(self.params["scales"]))
        )[alive_np]
        vert_normals = np.asarray(
            transfer.knn_weighted_transfer(
                jnp.asarray(verts), jnp.asarray(pts), jnp.asarray(normals_g),
                k=cfg.transfer_k,
            )
        ) if len(verts) else np.zeros((0, 3), np.float32)

        vert_features = None
        if latent:
            lat = np.asarray(self.params["distill_features"])[alive_np]
            vert_features = np.asarray(
                transfer.knn_weighted_transfer(
                    jnp.asarray(verts), jnp.asarray(pts), jnp.asarray(lat),
                    k=cfg.transfer_k,
                )
            ) if len(verts) else np.zeros((0, latent), np.float32)

        floor_T = np.eye(4)
        if cfg.align_floor and len(verts) > 100:
            floor_T = align.floor_alignment_transform(verts)
            verts = align.apply_transform(verts, floor_T)
            vert_normals = vert_normals @ floor_T[:3, :3].T

        result = {
            "vertices": verts.astype(np.float32),
            "faces": faces,
            "colors": np.clip(colors, 0, 1).astype(np.float32),
            "normals": vert_normals.astype(np.float32),
            "floor_transform": floor_T,
        }
        if vert_features is not None:
            result["features"] = vert_features.astype(np.float32)

        if output_dir is not None:
            output_dir = Path(output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            self.export_splats_ply(output_dir / "splats.ply")
            write_ply(
                str(output_dir / "mesh.ply"), result["vertices"],
                colors=result["colors"], normals=result["normals"],
                faces=result["faces"],
            )
            np.savez(
                output_dir / "mesh_features.npz",
                features=result.get("features", np.zeros((0, 0))),
                floor_transform=floor_T,
            )
        return result


class GaussiansToPoissonExporter:
    """Point-cloud route (reference GaussiansToPoisson, mesh.py:642-830):
    exports the splat centers with normals + colors as an oriented point
    cloud ready for Poisson reconstruction (C++ module / external tool)."""

    def __init__(self, params, alive, model_config):
        self.params = params
        self.alive = alive
        self.model_config = model_config

    def main(self, output_dir: str | Path, opacity_thresh: float = 0.1):
        alive = np.asarray(self.alive)
        opac = np.asarray(jax.nn.sigmoid(self.params["opacities"][:, 0]))
        keep = alive & (opac > opacity_thresh)
        means = np.asarray(self.params["means"])[keep]
        colors = np.clip(
            np.asarray(sh0_to_rgb(self.params["features_dc"]))[keep], 0, 1
        )
        normals = np.asarray(
            min_axis_normal(self.params["quats"], jnp.exp(self.params["scales"]))
        )[keep]
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        write_ply(str(output_dir / "oriented_points.ply"), means,
                  colors=colors, normals=normals)
        return {"points": means, "colors": colors, "normals": normals}
