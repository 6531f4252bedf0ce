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
from .tsdf import integrate, volume_from_bounds


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


def gaussian_density_grid(
    params: GaussianParams,
    alive,
    lo: np.ndarray,
    hi: np.ndarray,
    resolution: int = 128,
    opacity_weighted: bool = True,
    chunk: int = 4096,
):
    """Evaluate the 3D Gaussian-mixture density on a dense grid.

    The field behind the reference's SuGaR ``LevelSetExtractor``
    (mesh.py:1044-1230) and ``MarchingCubesMesh`` (:1233-1359): sum of
    (optionally opacity-weighted) Gaussian densities.  Chunked dense JAX —
    each chunk is a [V_chunk, N] quadratic-form sweep on the TPU; the
    chunk size bounds the [V_chunk, N] working set (at N=500k alive
    gaussians, 4096 keeps it ~8 GB of fused reduction tiles where the
    old 1<<18 default needed a ~0.5 TB intermediate).

    Returns (density [R, R, R], voxel_size [3], origin [3]).
    """
    alive_np = np.asarray(alive)
    means = jnp.asarray(np.asarray(params["means"])[alive_np])
    scales = jnp.exp(jnp.asarray(np.asarray(params["scales"])[alive_np]))
    quats = jnp.asarray(np.asarray(params["quats"])[alive_np])
    opac = jax.nn.sigmoid(
        jnp.asarray(np.asarray(params["opacities"])[alive_np][:, 0])
    )
    if not opacity_weighted:
        opac = jnp.ones_like(opac)

    from ..core.projection import covariance3d

    cov = covariance3d(quats, scales)
    prec = jnp.linalg.inv(
        cov + 1e-9 * jnp.eye(3)[None]
    )                                                     # [N, 3, 3]

    lo = np.asarray(lo, np.float64)
    hi = np.asarray(hi, np.float64)
    voxel = (hi - lo) / (resolution - 1)
    xs = [jnp.asarray(lo[i] + voxel[i] * np.arange(resolution)) for i in range(3)]
    grid = jnp.stack(jnp.meshgrid(*xs, indexing="ij"), axis=-1).reshape(-1, 3)

    n_pts = grid.shape[0]
    n_chunks = -(-n_pts // chunk)
    grid = jnp.pad(grid, ((0, n_chunks * chunk - n_pts), (0, 0)))

    @jax.jit
    def eval_chunk(pts):
        d = pts[:, None, :] - means[None, :, :]           # [V, N, 3]
        q = jnp.einsum("vni,nij,vnj->vn", d, prec, d)
        return jnp.sum(opac[None, :] * jnp.exp(-0.5 * q), axis=1)

    dens = jax.lax.map(eval_chunk, grid.reshape(n_chunks, chunk, 3))
    dens = np.asarray(dens.reshape(-1)[:n_pts]).reshape(
        resolution, resolution, resolution
    )
    return dens, voxel.astype(np.float32), lo.astype(np.float32)


class LevelSetExtractor:
    """SuGaR-style level-set mesh (reference mesh.py:1044-1230): extract the
    iso-surface of the opacity-weighted Gaussian density field."""

    def __init__(self, params, alive, model_config,
                 level: float = 0.5, resolution: int = 128):
        self.params = params
        self.alive = alive
        self.model_config = model_config
        self.level = level
        self.resolution = resolution

    def main(self, output_dir=None) -> Dict[str, np.ndarray]:
        alive_np = np.asarray(self.alive)
        pts = np.asarray(self.params["means"])[alive_np]
        lo, hi = pts.min(0) - 0.1, pts.max(0) + 0.1
        dens, voxel, origin = gaussian_density_grid(
            self.params, self.alive, lo, hi, self.resolution
        )
        # Marching expects inside = negative.
        verts_vox, faces = marching_tetrahedra(-(dens - self.level))
        verts = verts_vox * voxel[None, :] + origin[None, :]
        colors = np.asarray(
            transfer.knn_weighted_transfer(
                jnp.asarray(verts), jnp.asarray(pts),
                jnp.clip(jnp.asarray(
                    sh0_to_rgb(self.params["features_dc"])
                )[alive_np], 0, 1),
                k=3,
            )
        ) if len(verts) else np.zeros((0, 3), np.float32)
        result = {"vertices": verts.astype(np.float32), "faces": faces,
                  "colors": colors}
        if output_dir is not None:
            output_dir = Path(output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            write_ply(str(output_dir / "mesh.ply"), result["vertices"],
                      colors=result["colors"], faces=result["faces"])
        return result


class MarchingCubesMeshExporter(LevelSetExtractor):
    """Density-threshold marching mesh (reference MarchingCubesMesh,
    mesh.py:1233-1359) — the same field at a configurable iso level."""


class DepthAndNormalMapsPoissonExporter:
    """Back-project rendered depth + normal maps into an oriented point
    cloud and run Poisson surface reconstruction over it (reference
    DepthAndNormalMapsPoisson, mesh.py:833-1041: Open3D
    ``create_from_point_cloud_poisson(depth=9)``; here the spectral grid
    solver in meshing/poisson.py)."""

    def __init__(self, params, alive, model_config,
                 depth_name: str = "median_depth", alpha_thresh: float = 0.5,
                 stride: int = 2, grid_res: int = 256, screen: float = 0.0):
        self.params = params
        self.alive = alive
        self.model_config = model_config
        self.depth_name = depth_name
        self.alpha_thresh = alpha_thresh
        self.stride = stride
        self.grid_res = grid_res
        self.screen = screen

    def main(self, cameras: Sequence[Camera], output_dir=None):
        from ..core.cameras import camera_rays

        all_pts, all_normals, all_colors = [], [], []
        render = jax.jit(
            lambda cam: rade_gs.get_outputs(
                self.params, self.alive, cam, 0, self.model_config,
                training=False,
            )[0]
        )
        for cam in cameras:
            out = render(cam)
            depth = np.asarray(out[self.depth_name])
            alpha = np.asarray(out["accumulation"])
            rgb = np.asarray(out["rgb"])
            normal_cam = np.asarray(out["normal_cam"])
            rays = np.asarray(camera_rays(cam))
            s = self.stride
            mask = alpha[::s, ::s] > self.alpha_thresh
            p_cam = (rays * depth[..., None])[::s, ::s][mask]
            n_cam = normal_cam[::s, ::s][mask]
            c = rgb[::s, ::s][mask]
            # Camera -> world (COLMAP camera space).
            w2c = np.asarray(cam.viewmat())
            R = w2c[:3, :3]
            pts_w = (p_cam - w2c[:3, 3]) @ R
            n_w = n_cam @ R
            all_pts.append(pts_w)
            all_normals.append(n_w)
            all_colors.append(c)
        pts = np.concatenate(all_pts) if all_pts else np.zeros((0, 3))
        normals = np.concatenate(all_normals) if all_normals else np.zeros((0, 3))
        colors = np.concatenate(all_colors) if all_colors else np.zeros((0, 3))
        nn = np.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals / np.clip(nn, 1e-8, None)

        from .poisson import poisson_reconstruct

        verts, faces, vcols = poisson_reconstruct(
            pts, normals, grid_res=self.grid_res, screen=self.screen,
            colors=np.clip(colors, 0, 1),
        )
        if output_dir is not None:
            output_dir = Path(output_dir)
            output_dir.mkdir(parents=True, exist_ok=True)
            write_ply(str(output_dir / "oriented_points.ply"),
                      pts.astype(np.float32),
                      colors=np.clip(colors, 0, 1).astype(np.float32),
                      normals=normals.astype(np.float32))
            if len(verts):
                write_ply(str(output_dir / "mesh.ply"), verts,
                          colors=vcols, faces=faces)
        return {"points": pts, "normals": normals, "colors": colors,
                "vertices": verts, "faces": faces,
                "vertex_colors": vcols}


class GaussiansToPoissonExporter:
    """Point-cloud route (reference GaussiansToPoisson, mesh.py:642-830):
    splat centers with min-axis normals + colors feed the spectral Poisson
    solver (meshing/poisson.py), replacing the reference's Open3D
    ``create_from_point_cloud_poisson`` call at mesh.py:812-816."""

    def __init__(self, params, alive, model_config, grid_res: int = 256,
                 screen: float = 0.0):
        self.params = params
        self.alive = alive
        self.model_config = model_config
        self.grid_res = grid_res
        self.screen = screen

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
        from .poisson import poisson_reconstruct

        verts, faces, vcols = poisson_reconstruct(
            means, normals, grid_res=self.grid_res, screen=self.screen,
            colors=colors,
        )
        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        write_ply(str(output_dir / "oriented_points.ply"), means,
                  colors=colors, normals=normals)
        if len(verts):
            write_ply(str(output_dir / "mesh.ply"), verts,
                      colors=vcols, faces=faces)
        return {"points": means, "colors": colors, "normals": normals,
                "vertices": verts, "faces": faces, "vertex_colors": vcols}
