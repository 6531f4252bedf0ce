"""Sharded training step: camera-parallel x gaussian-sharded `shard_map`.

The multi-chip answer to the reference's single-GPU loop (SURVEY.md §2c):

    mesh = (data: cameras, gauss: gaussian table)

Per device, per step:
  1. activate + project the **local Gaussian shard** (O(C/G) work),
  2. `all_gather` the compact projected quantities over ``gauss`` (forward
     comm: ~56 B/gaussian, far less than the SH-laden raw parameters),
  3. bin + composite the full set against this device's camera,
  4. backward: the all-gather transposes to a `reduce_scatter` routing pixel
     gradients back to each shard owner; camera-parallel gradients are then
     `psum`'d over ``data``,
  5. per-shard Adam update (optimizer moments never leave the shard),
  6. densification statistics are psum'd over ``data`` and kept sharded.

Everything is one `shard_map`-decorated jitted function; XLA overlaps the
collectives with local compute where profitable.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..core.cameras import Camera
from ..core.projection import Projection, project_gaussians
from ..models import rade_gs
from ..ops.rasterize import (
    absgrad_sink_shape,
    pack_per_gauss,
    render_from_projections,
)
from ..ops.segsum import spread_masked
from ..train import losses
from ..train.strategy import StrategyState
from .mesh import DATA_AXIS, GAUSS_AXIS


class CameraBatch(NamedTuple):
    """A batch of B cameras with shared static image size."""

    K: jax.Array    # [B, 3, 3]
    c2w: jax.Array  # [B, 4, 4]


def _spec_for_capacity(tree, capacity: int):
    """PartitionSpec pytree: shard leading axes of capacity-sized leaves."""

    def spec(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return P(GAUSS_AXIS)
        return P()

    return jax.tree_util.tree_map(spec, tree)


def make_sharded_train_step(
    mesh: Mesh,
    optimizer,
    model_config: rade_gs.RadeGSConfig,
    width: int,
    height: int,
    capacity: int,
    opt_state_template,
    reg_active: bool = False,
    tile_sharded: bool = False,
    send_cap: int | None = None,
):
    """Build the jitted sharded train step.

    Args:
        mesh: (data, gauss) mesh from parallel.mesh.make_mesh.
        optimizer: optax transformation (from train.optim.make_optimizer).
        model_config: static model config.
        width, height: static camera size for this step variant.
        capacity: Gaussian capacity C (multiple of the gauss axis size).
        opt_state_template: an opt state (or jax.eval_shape of it) used to
            derive the sharding spec pytree.
        reg_active: static depth-normal phase flag.
        tile_sharded: route projected Gaussians to per-device tile *bands*
            with one ``all_to_all`` (parallel/tiles.py) instead of
            all-gathering the full projection set — per-device compositing
            buffers become O(C/G + G*send_cap) instead of O(C).  Requires
            the padded tile grid to split into ``G`` bands (see
            ``tiles.band_rows``).  Densification statistics are computed
            per (band-tile, splat) exactly as in the all-gather path and
            routed back to the owning shard with the reverse all_to_all.
        send_cap: per-(source device, band) routing slab capacity S for the
            tile-sharded path; defaults to the shard size C/G (never drops
            a Gaussian).  Production pods shrink it toward the expected
            per-band overlap count; overflow drops the farthest Gaussians
            and is counted in the ``spilled`` metric.

    Returns:
        step(params, alive, opt_state, strat_state, cams: CameraBatch,
             images [B,H,W,3], step_idx, key)
          -> (params, opt_state, strat_state, metrics dict)

        ``B`` must equal the data-axis size (one camera per data shard);
        the wrapper raises otherwise rather than silently dropping extras.
    """
    n_gauss = mesh.shape[GAUSS_AXIS]
    assert capacity % n_gauss == 0
    shard = capacity // n_gauss
    cfg = model_config
    opts = cfg.render
    if tile_sharded:
        from .tiles import band_rows

        s_cap = send_cap or shard
        band_px = band_rows(height, opts.tile_size, n_gauss) * opts.tile_size

    params_spec = {
        k: P(GAUSS_AXIS) for k in
        ["means", "scales", "quats", "opacities", "features_dc",
         "features_rest"]
    }
    if cfg.latent_dim:
        params_spec["distill_features"] = P(GAUSS_AXIS)
    opt_spec = _spec_for_capacity(opt_state_template, capacity)
    strat_spec = StrategyState(P(GAUSS_AXIS), P(GAUSS_AXIS), P(GAUSS_AXIS))
    cam_spec = CameraBatch(P(DATA_AXIS), P(DATA_AXIS))

    in_specs = (
        params_spec,            # params
        P(GAUSS_AXIS),          # alive
        opt_spec,               # opt_state
        strat_spec,             # strat_state
        cam_spec,               # cameras
        P(DATA_AXIS),           # images
        P(),                    # step
        P(),                    # key
    )
    out_specs = (
        params_spec,
        opt_spec,
        strat_spec,
        {"loss": P(), "psnr": P(), "spilled": P()},
    )

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    def step(params, alive, opt_state, strat_state, cams, images, step_idx, key):
        # Local camera: one per data index (replicated along gauss).
        camera = Camera(
            K=cams.K[0], c2w=cams.c2w[0], width=width, height=height
        )
        image = images[0]
        data_idx = jax.lax.axis_index(DATA_AXIS)
        bg_key = jax.random.fold_in(key, data_idx)
        viewmat = camera.viewmat()
        if tile_sharded:
            sink_shape = absgrad_sink_shape(
                width, band_px, n_gauss * s_cap, opts
            )
        else:
            sink_shape = absgrad_sink_shape(width, height, capacity, opts)
        sink = jnp.zeros(sink_shape, jnp.float32)

        def _image_loss(out):
            """Loss + outputs from full-image maps (shared by both paths)."""
            bg = rade_gs.background_color(cfg, bg_key, True)
            rgb = jnp.clip(
                out.color[..., :3] + (1.0 - out.alpha[..., None]) * bg,
                0.0, 1.0,
            )
            outputs = {"rgb": rgb, "spilled": out.spilled}
            loss = losses.rgb_loss(rgb, image, cfg.ssim_lambda)
            if reg_active and cfg.use_depth_normal_loss:
                from ..core.cameras import depth_pair_to_normal

                has_hit = out.alpha > 0.0
                bf = lambda x: jnp.where(
                    has_hit, x, jax.lax.stop_gradient(jnp.max(x))
                )
                dn = depth_pair_to_normal(
                    camera, bf(out.depth), bf(out.median_depth)
                )
                err = 1.0 - jnp.sum(out.normal[None] * dn, axis=-1)
                outputs["depth_normal_error_map"] = err[0][..., None]
                outputs["middepth_normal_error_map"] = err[1][..., None]
                loss = loss + losses.depth_normal_loss(
                    outputs["depth_normal_error_map"],
                    outputs["middepth_normal_error_map"],
                    cfg.depth_ratio, cfg.depth_normal_lambda,
                )
            return loss, outputs

        def loss_fn_routed(p, snk):
            from .tiles import render_tile_sharded

            colors = rade_gs.compute_colors(p, camera, step_idx, cfg)
            opac = jax.nn.sigmoid(p["opacities"][:, 0]) * alive

            def _proj(means, quats, scales, op):
                return project_gaussians(
                    means, quats, scales, viewmat, camera.K, width, height,
                    eps2d=opts.eps2d, near_plane=opts.near_plane,
                    far_plane=opts.far_plane, radius_clip=opts.radius_clip,
                    opacities=op,
                )

            proj = jax.checkpoint(_proj)(
                p["means"], p["quats"], jnp.exp(p["scales"]), opac
            )
            # Dead capacity rows: invisible anyway, but excluding them from
            # validity keeps them out of routing slabs and tile windows.
            proj = proj._replace(valid=proj.valid & alive.astype(bool))
            if opts.rasterize_mode == "antialiased":
                opac = opac * proj.compensation
            out, meta, route = render_tile_sharded(
                proj, opac, colors, camera, opts, n_gauss, s_cap,
                absgrad_sink=snk,
            )
            loss, outputs = _image_loss(out)
            # The full-image maps (and hence this loss) are replicated on
            # every gauss-axis member; scaling by 1/G makes the transposed
            # collectives (reduce-scatter of the band all_gather, reverse
            # all_to_all of the routing) sum member cotangents to exactly
            # the unsharded gradient.  Metrics un-scale below.
            return loss / n_gauss, (outputs, meta, route, proj)

        def loss_fn(p, snk):
            colors = rade_gs.compute_colors(p, camera, step_idx, cfg)
            opac = jax.nn.sigmoid(p["opacities"][:, 0]) * alive

            # Shard-local projection packed into ONE differentiable matrix
            # (the same [*, 12+C] column layout render_from_projections
            # builds) plus one small non-differentiable binning pack.  The
            # exchange is then two all_gathers instead of ~11 per-field
            # ones, and the backward is a single reduce_scatter on the
            # packed matrix.  jax.checkpoint = the remat_projection policy
            # of render_tiled: recompute the shard projection in the
            # backward instead of staging its [*, 1] residuals.
            def _pack(means, quats, scales, opac, colors):
                pj = project_gaussians(
                    means, quats, scales, viewmat, camera.K, width, height,
                    eps2d=opts.eps2d, near_plane=opts.near_plane,
                    far_plane=opts.far_plane, radius_clip=opts.radius_clip,
                    opacities=opac,
                )
                op = opac
                if opts.rasterize_mode == "antialiased":
                    op = op * pj.compensation
                per_gauss = pack_per_gauss(pj, op, pj.normal, colors)
                live = pj.valid & alive.astype(bool)  # dead rows: no binning
                binpack = jnp.concatenate(
                    [pj.mean2d, pj.depth[:, None], pj.radius[:, None],
                     live[:, None].astype(jnp.float32),
                     pj.radius_xy], axis=1,
                )
                return per_gauss, jax.lax.stop_gradient(binpack)

            per_gauss, binpack = jax.checkpoint(_pack)(
                p["means"], p["quats"], jnp.exp(p["scales"]), opac, colors
            )
            gather = lambda x: jax.lax.all_gather(
                x, GAUSS_AXIS, axis=0, tiled=True
            )
            per_gauss_full = gather(per_gauss)
            bp = gather(binpack)
            # Minimal Projection view for binning + strategy statistics
            # (bin_gaussians reads mean2d/depth/radius_xy/valid only; conic/
            # plane/normal ride inside per_gauss).
            zeros2 = jnp.zeros((bp.shape[0], 2), jnp.float32)
            proj_full = Projection(
                mean2d=bp[:, 0:2], depth=bp[:, 2],
                conic=jnp.zeros((bp.shape[0], 3), jnp.float32),
                radius=bp[:, 3],
                compensation=jnp.ones((bp.shape[0],), jnp.float32),
                plane=zeros2,
                normal=jnp.zeros((bp.shape[0], 3), jnp.float32),
                valid=bp[:, 4] > 0.5,
                radius_xy=bp[:, 5:7],
            )

            out, meta = render_from_projections(
                proj_full, None, None, None, camera, opts,
                absgrad_sink=snk, per_gauss=per_gauss_full,
            )
            loss, outputs = _image_loss(out)
            return loss, (outputs, meta)

        if tile_sharded:
            (loss, (outputs, meta, route, proj_local)), (pgrads, sink_grad) = \
                jax.value_and_grad(
                    loss_fn_routed, argnums=(0, 1), has_aux=True
                )(params, sink)
            loss = loss * n_gauss   # un-scale the replication correction
        else:
            (loss, (outputs, meta)), (pgrads, sink_grad) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(params, sink)

        # Dead rows must not update: the segment-sum gradient reduction's
        # prefix-difference rounding (ops/segsum.py precision note) can
        # leave ~1e-9 noise on never-rendered rows, which Adam's
        # normalization amplifies to a full-lr drift.  Zero them exactly.
        amask = alive.astype(jnp.float32)
        pgrads = {
            k: g * amask.reshape((-1,) + (1,) * (g.ndim - 1))
            if hasattr(g, "ndim") and g.ndim >= 1 and g.shape[0] == shard
            else g
            for k, g in pgrads.items()
        }

        # Camera-parallel gradient all-reduce (mean over the data axis).
        n_data = jax.lax.axis_size(DATA_AXIS)
        pgrads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, DATA_AXIS) / n_data, pgrads
        )

        updates, opt_state = optimizer.update(pgrads, opt_state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)

        scale = 0.5 * max(width, height)
        if tile_sharded:
            # Per-(band-tile, splat) |grad| accumulated into RECEIVED slab
            # rows, then routed back to the owning shard with the reverse
            # all_to_all (out[i][j] = in[j][i]: on source s, block d holds
            # the stats band owner d computed for rows s sent it) — the
            # same per-tile abs granularity as the all-gather path, with
            # per-device stat buffers O(G*S + C/G) instead of O(C).
            idx = meta.bins.tile_gauss.reshape(-1)
            msk = meta.bins.tile_mask.reshape(-1)
            g = jnp.where(msk[:, None], jnp.abs(sink_grad).reshape(-1, 2), 0.0)
            n_slab = n_gauss * s_cap
            slab = jnp.zeros((n_slab, 2), jnp.float32).at[
                spread_masked(idx, msk, n_slab)
            ].add(g, mode="drop")
            back = jax.lax.all_to_all(
                slab.reshape(n_gauss, s_cap, 2), GAUSS_AXIS,
                split_axis=0, concat_axis=0, tiled=True,
            ).reshape(-1, 2)                       # [(band, slot), 2]
            flat_gid = route.slot_gid.reshape(-1)
            flat_valid = route.slot_valid.reshape(-1)
            contrib = jnp.where(flat_valid[:, None], back, 0.0)
            guv = jnp.zeros((shard, 2), jnp.float32).at[
                spread_masked(flat_gid, flat_valid, shard)
            ].add(contrib, mode="drop")
            grad_ndc = jnp.sqrt(
                (guv[:, 0] * scale) ** 2 + (guv[:, 1] * scale) ** 2
            )
            grad_ndc = jax.lax.psum(grad_ndc, DATA_AXIS)
            visible = jax.lax.psum(
                proj_local.valid.astype(jnp.float32), DATA_AXIS
            )
            radii_frac = jax.lax.pmax(
                proj_local.radius / float(max(width, height)), DATA_AXIS
            )
            strat_state = StrategyState(
                grad_accum=strat_state.grad_accum + grad_ndc,
                count=strat_state.count + visible,
                max_radii=jnp.maximum(strat_state.max_radii, radii_frac),
            )
        else:
            # Densification statistics: full-C scatter, psum over data,
            # reslice.
            idx = meta.bins.tile_gauss.reshape(-1)
            msk = meta.bins.tile_mask.reshape(-1)
            g = jnp.where(msk[:, None], jnp.abs(sink_grad).reshape(-1, 2), 0.0)
            # Collision-free scatter indices (masked contributions zeroed)
            # and both columns in one row scatter — see
            # ops/segsum.spread_masked.
            sidx = spread_masked(idx, msk, capacity)
            guv = jnp.zeros((capacity, 2), jnp.float32).at[sidx].add(
                g, mode="drop"
            )
            gu, gv = guv[:, 0], guv[:, 1]
            grad_ndc = jnp.sqrt((gu * scale) ** 2 + (gv * scale) ** 2)
            grad_ndc = jax.lax.psum(grad_ndc, DATA_AXIS)
            # meta.proj here is the gathered full set; visibility psum'd
            # over data.
            visible = jax.lax.psum(
                meta.proj.valid.astype(jnp.float32), DATA_AXIS
            )
            radii_frac = jax.lax.pmax(
                meta.proj.radius / float(max(width, height)), DATA_AXIS
            )
            g0 = jax.lax.axis_index(GAUSS_AXIS) * shard
            sl = lambda x: jax.lax.dynamic_slice(x, (g0,), (shard,))
            strat_state = StrategyState(
                grad_accum=strat_state.grad_accum + sl(grad_ndc),
                count=strat_state.count + sl(visible),
                max_radii=jnp.maximum(strat_state.max_radii, sl(radii_frac)),
            )

        metrics = {
            "loss": jax.lax.pmean(loss, DATA_AXIS),
            "psnr": jax.lax.pmean(losses.psnr(outputs["rgb"], image), DATA_AXIS),
            "spilled": jax.lax.pmax(outputs["spilled"], DATA_AXIS),
        }
        return params, opt_state, strat_state, metrics

    jitted = jax.jit(step, static_argnames=())
    n_data = mesh.shape[DATA_AXIS]

    def checked(params, alive, opt_state, strat_state, cams, images,
                step_idx, key):
        b = cams.K.shape[0]
        if b != n_data:
            raise ValueError(
                f"sharded step needs exactly one camera per data shard: "
                f"got {b} cameras for data axis size {n_data}"
            )
        return jitted(params, alive, opt_state, strat_state, cams, images,
                      step_idx, key)

    return checked


def make_sharded_refine_step(
    strategy_cfg,
    scene_scale: float = 1.0,
):
    """Sharded densify/prune (VERDICT round-1 Next #5).

    ``train.strategy.refine`` is pure jittable XLA on full [C] arrays, so
    the TPU-native way to shard it is NOT a hand-written shard_map but
    plain ``jit`` over the already-gauss-sharded params/state from
    :func:`make_sharded_train_step`: GSPMD propagates the input shardings
    through the cumsums/sorts/scatters and inserts the (cheap, every-100-
    steps) collectives itself.  Because it is the *same program* as the
    single-device refine, sharded trajectories match single-device ones to
    float tolerance — tested in tests/test_parallel.py.

    Returns refine(params, alive, opt_state, strat_state, key,
                   allow_split, scale_cull, screen_cull)
        -> (params, alive, opt_state, strat_state, counts)
    (same state-argument order as Trainer._refine_step and
    make_sharded_train_step).
    """
    from ..train import strategy

    @functools.partial(
        jax.jit,
        static_argnames=("allow_split", "scale_cull", "screen_cull",
                         "allow_dup"),
    )
    def refine_step(params, alive, opt_state, strat_state, key,
                    allow_split=True, scale_cull=False, screen_cull=False,
                    allow_dup=True):
        res = strategy.refine(
            params, alive, strat_state, key, strategy_cfg,
            scene_scale=scene_scale, allow_split=allow_split,
            scale_cull=scale_cull, screen_size_cull=screen_cull,
            allow_dup=allow_dup,
        )
        opt_state = strategy.zero_opt_rows(opt_state, res.written)
        return res.params, res.alive, opt_state, res.state, (
            res.n_dup, res.n_split, res.n_cull, res.dropped
        )

    return refine_step
