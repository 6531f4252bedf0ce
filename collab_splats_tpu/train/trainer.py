"""Training engine: jitted train step + host-side refinement schedule.

TPU-native replacement for the nerfstudio Trainer/VanillaPipeline stack the
reference delegates to (SURVEY.md §2b N2, call stack §3.2):

* one fully jitted train step: render -> loss -> backward -> per-group Adam
  update -> densification-statistic accumulation (the absgrad sink cotangent
  rides the same backward pass);
* host-side schedule mirroring the reference cadence: 30k iterations,
  refine every 100 steps inside [500, 15000), opacity reset every 3000,
  depth-normal loss enabled from iteration 15000 (one recompile — the phase
  flag is static);
* fixed-capacity densification with automatic host-side capacity growth
  (recompile amortized over thousands of steps).

The loop is deliberately thin — all hot work is inside `jit`; the host only
selects cameras and sequences refinement.
"""

from __future__ import annotations

import dataclasses
import functools
import time
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.cameras import Camera
from ..models import rade_gs
from ..models.gaussians import GaussianParams, grow_capacity, num_alive
from ..ops.rasterize import absgrad_sink_shape
from . import losses, optim, strategy


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    """Mirrors the reference method registration cadence
    (configs/rade_gs_method.py:24-30)."""

    max_iterations: int = 30000
    steps_per_eval_image: int = 100
    steps_per_eval_all_images: int = 1000
    steps_per_save: int = 2000
    model: rade_gs.RadeGSConfig = rade_gs.RadeGSConfig()
    strategy: strategy.StrategyConfig = strategy.StrategyConfig()
    scene_scale: float = 1.0
    capacity_headroom: float = 1.5   # grow arrays when occupancy * this > C
    seed: int = 42
    optimize_camera_poses: bool = False  # per-camera SO3xR3 deltas
    use_bilateral_grid: bool = False     # per-image appearance grids
    # Progressive resolution (Splatfacto `_get_downscale_factor`, consumed by
    # the reference at rade_gs_model.py:132 / rade_features_model.py:245):
    # train at 1/2^k resolution early, halving the factor every
    # `resolution_schedule` steps.  Each factor is one extra jit
    # specialization (static camera size), compiled once per phase.
    num_downscales: int = 0
    resolution_schedule: int = 3000
    # Datasets up to this size are cached in HBM; larger ones stay host
    # numpy and stream one frame per step (see Trainer.__init__).
    dataset_hbm_budget_bytes: int = 4 << 30


class Trainer:
    """Single-host trainer over a full-image dataset."""

    def __init__(
        self,
        config: TrainerConfig,
        cameras: Sequence[Camera],
        images: Sequence[np.ndarray],
        params: GaussianParams,
        alive: jax.Array,
        groups: Optional[Dict[str, optim.GroupSpec]] = None,
        checkpoint_fn: Optional[Callable] = None,
        features: Optional[Sequence[Dict]] = None,
        writers: Optional[Sequence] = None,
    ):
        assert len(cameras) == len(images)
        from ..utils.cache import enable_compilation_cache

        enable_compilation_cache()  # multi-minute TPU compiles, cached on disk
        self.config = config
        self.cameras = list(cameras)
        # Device-cache the dataset only while it fits a modest HBM budget:
        # eagerly uploading every frame (and feature map) pins the whole
        # capture in HBM for the trainer's lifetime (~24 GB for 1000
        # frames at 1080p, more with features), competing with the
        # parameter/optimizer tables.  Past the budget, frames stay host
        # numpy and the jitted step device_puts the one selected frame per
        # call (the production streaming pattern).
        total_bytes = sum(np.asarray(im).size * 4 for im in images)
        if features is not None:
            total_bytes += sum(
                np.asarray(v).size * 4 for f in features for v in f.values()
            )
        on_device = total_bytes <= config.dataset_hbm_budget_bytes
        to_arr = (lambda x: jnp.asarray(x, jnp.float32)) if on_device \
            else (lambda x: np.asarray(x, np.float32))
        self.images = [to_arr(im) for im in images]
        self.features = (
            [{k: to_arr(v) for k, v in f.items()} for f in features]
            if features is not None
            else None
        )
        self.params = params
        self.alive = alive
        self.groups = dict(groups or optim.RADE_GS_GROUPS)
        if config.optimize_camera_poses and "camera_opt" not in self.params:
            from . import camera_opt as co

            self.params = dict(self.params)
            self.params["camera_opt"] = co.init_camera_opt(len(cameras))
            self.groups["camera_opt"] = co.CAMERA_OPT_GROUP
            params = self.params
        if config.use_bilateral_grid and "bilateral_grid" not in self.params:
            from . import bilateral

            self.params = dict(self.params)
            self.params["bilateral_grid"] = bilateral.init_bilateral_grids(
                len(cameras)
            )
            self.groups["bilateral_grid"] = bilateral.BILATERAL_GROUP
            params = self.params
        self.optimizer = optim.make_optimizer(
            self.groups, optim.default_labels(params)
        )
        self.opt_state = self.optimizer.init(params)
        self.strat_state = strategy.init_state(alive.shape[0])
        self.key = jax.random.PRNGKey(config.seed)
        self.step = 0
        self.checkpoint_fn = checkpoint_fn
        # Metric sinks (utils/writers.py: jsonl / tensorboard / wandb),
        # mirroring the reference's nerfstudio --vis options.
        self.writers = list(writers or [])
        self.history: List[Dict[str, float]] = []

    # ------------------------------------------------------------------ jit
    @functools.partial(
        jax.jit, static_argnames=("self", "reg_active", "downscale")
    )
    def _train_step(
        self,
        params,
        alive,
        opt_state,
        strat_state,
        key,
        step,
        camera: Camera,
        image,
        features_gt,
        cam_idx,
        reg_active: bool,
        downscale: int = 1,
    ):
        cfg = self.config.model
        bg_key, _ = jax.random.split(key)
        if downscale > 1:
            # `camera` arrives already downscaled (floor-division sizes);
            # average-pool the full-res GT to match — the same box filter
            # Splatfacto's `_downscale_if_required` applies to GT images.
            ih, iw = camera.height * downscale, camera.width * downscale
            image = jnp.asarray(image)[:ih, :iw].reshape(
                camera.height, downscale, camera.width, downscale, -1
            ).mean(axis=(1, 3))
        if cfg.render.backend == "pallas":
            from ..ops.rasterize import pallas_sink_shape

            sink_shape = pallas_sink_shape(
                camera.width, camera.height, alive.shape[0], cfg.render
            )
        else:
            sink_shape = absgrad_sink_shape(
                camera.width, camera.height, alive.shape[0], cfg.render
            )
        sink = jnp.zeros(sink_shape, jnp.float32)

        def loss_fn(p, snk):
            cam = camera
            if "camera_opt" in p:
                from . import camera_opt as co

                cam = co.apply_pose_adjustment(camera, p["camera_opt"][cam_idx])
            outputs, meta = rade_gs.get_outputs(
                p, alive, cam, step, cfg, rng=bg_key, training=True,
                compute_error_maps=reg_active, absgrad_sink=snk,
            )
            if "bilateral_grid" in p:
                from . import bilateral

                outputs = dict(outputs)
                outputs["rgb"] = bilateral.apply_bilateral_grid(
                    p["bilateral_grid"][cam_idx], outputs["rgb"]
                )
            if features_gt is not None:
                from ..models import rade_features

                loss, ldict = rade_features.get_loss(
                    outputs, image, features_gt, p, alive, step, cfg,
                    reg_active=reg_active,
                )
            else:
                loss, ldict = rade_gs.get_loss(
                    outputs, image, p, alive, step, cfg, reg_active=reg_active
                )
            if "bilateral_grid" in p:
                from . import bilateral

                ldict["tv_loss"] = 10.0 * bilateral.total_variation_loss(
                    p["bilateral_grid"]
                )
                loss = loss + ldict["tv_loss"]
            return loss, (outputs, meta, ldict)

        (loss, (outputs, meta, ldict)), (pgrads, sink_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, sink)

        # Dead rows must not update: the segment-sum gradient reduction's
        # prefix-difference rounding (ops/segsum.py precision note) can leave
        # ~1e-9 noise on never-rendered rows, which Adam's normalization
        # amplifies to a full-lr drift.  Zero capacity-row grads exactly.
        cap = alive.shape[0]
        amask = alive.astype(jnp.float32)
        pgrads = {
            k: g * amask.reshape((-1,) + (1,) * (g.ndim - 1))
            if hasattr(g, "ndim") and g.ndim >= 1 and g.shape[0] == cap
            else g
            for k, g in pgrads.items()
        }

        # Non-finite gradient guard: a single degenerate splat can emit an
        # inf/NaN gradient that would poison every Adam moment — observed
        # as a one-step unrecoverable collapse (runs/scale_r4, step 1037,
        # before the projection sqrt-clamp fix).  Cost is one fused
        # isfinite reduce; a bad step is skipped (params, opt state, and
        # strategy statistics all keep their previous values) and counted.
        finite = jnp.array(True)
        for g in jax.tree_util.tree_leaves((pgrads, sink_grad)):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))

        def _keep(new, old):
            return jnp.where(finite, new, old) if hasattr(new, "shape") \
                else new

        updates, new_opt = self.optimizer.update(pgrads, opt_state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, params, updates
        )
        params = jax.tree_util.tree_map(_keep, new_params, params)
        opt_state = jax.tree_util.tree_map(_keep, new_opt, opt_state)
        if cfg.render.backend == "pallas":
            new_strat = strategy.update_state_from_isect(
                strat_state, meta, sink_grad
            )
        else:
            new_strat = strategy.update_state(strat_state, meta, sink_grad)
        strat_state = jax.tree_util.tree_map(_keep, new_strat, strat_state)

        metrics = {
            "nonfinite_grad": 1 - finite.astype(jnp.int32),
            "loss": loss,
            "psnr": losses.psnr(outputs["rgb"], image),
            "spilled": outputs["spilled"],
            # In-graph so the host loop needs no separate num_alive
            # dispatch per step (a per-op round trip over the TPU tunnel).
            "num_gaussians": jnp.sum(alive.astype(jnp.int32)),
            **ldict,
        }
        return params, opt_state, strat_state, metrics

    @functools.partial(
        jax.jit,
        static_argnames=("self", "allow_split", "scale_cull", "screen_cull",
                         "allow_dup"),
    )
    def _refine_step(
        self, params, alive, opt_state, strat_state, key,
        allow_split: bool, scale_cull: bool, screen_cull: bool,
        allow_dup: bool = True,
    ):
        res = strategy.refine(
            params, alive, strat_state, key, self.config.strategy,
            scene_scale=self.config.scene_scale,
            allow_split=allow_split, scale_cull=scale_cull,
            screen_size_cull=screen_cull, allow_dup=allow_dup,
        )
        opt_state = strategy.zero_opt_rows(opt_state, res.written)
        return res.params, res.alive, opt_state, res.state, (
            res.n_dup, res.n_split, res.n_cull, res.dropped
        )

    # ----------------------------------------------------------------- host
    def downscale_factor(self, step: Optional[int] = None) -> int:
        """Progressive-resolution factor at ``step`` (Splatfacto
        ``_get_downscale_factor``): 2^max(num_downscales - step // schedule, 0).
        Evaluation always renders at full resolution (factor 1)."""
        cfg = self.config
        if cfg.num_downscales <= 0:
            return 1
        s = self.step if step is None else step
        return 2 ** max(
            cfg.num_downscales - s // max(cfg.resolution_schedule, 1), 0
        )

    def train_one_step(self) -> Dict[str, float]:
        cfg = self.config
        scfg = cfg.strategy
        # Host-side, step-keyed camera draw: a device-side draw would cost a
        # device round trip per step, and keying by step keeps resumed runs
        # on the identical camera sequence.
        idx = int(
            np.random.RandomState(self.config.seed * 9973 + self.step).randint(
                len(self.cameras)
            )
        )
        camera, image = self.cameras[idx], self.images[idx]
        features_gt = self.features[idx] if self.features is not None else None
        step_key = jax.random.fold_in(self.key, 4 * self.step + 1)
        reg_active = (
            cfg.model.use_depth_normal_loss
            and self.step >= cfg.model.regularization_from_iter
        )
        d = self.downscale_factor()
        self.params, self.opt_state, self.strat_state, metrics = self._train_step(
            self.params, self.alive, self.opt_state, self.strat_state,
            step_key, self.step, camera.downscaled(d), image, features_gt,
            idx, reg_active, downscale=d,
        )
        self.step += 1

        if scfg.is_refine_step(self.step) and self.step < cfg.max_iterations:
            # Splatfacto refine schedule: densify (dup+split, then cull)
            # inside the window and past the post-reset pause; after
            # stop_split_at, cull-only passes iff
            # continue_cull_post_densification; otherwise skip entirely.
            densify = scfg.densify_active(self.step, len(self.cameras))
            cull_only = (
                not scfg.splits_allowed(self.step)
                and scfg.continue_cull_post_densification
            )
            if densify or cull_only:
                self._maybe_grow_capacity()
                rkey = jax.random.fold_in(self.key, 4 * self.step + 2)
                (self.params, self.alive, self.opt_state, self.strat_state,
                 counts) = self._refine_step(
                    self.params, self.alive, self.opt_state, self.strat_state,
                    rkey,
                    allow_split=densify,
                    allow_dup=densify,
                    scale_cull=scfg.scale_cull_active(self.step),
                    screen_cull=scfg.screen_size_active(self.step),
                )
                metrics["refine_dup"], metrics["refine_split"], \
                    metrics["refine_cull"], metrics["refine_dropped"] = [
                    int(x) for x in counts
                ]
        if scfg.is_reset_step(self.step):
            self.params = strategy.reset_opacity(self.params, scfg)
            # Zero the opacity Adam moments, else accumulated momentum undoes
            # the clamp within a few steps (gsplat/Splatfacto both do this).
            self.opt_state = optim.zero_group_moments(
                self.opt_state, "opacities"
            )

        # ONE device->host transfer for the whole metrics dict: per-key
        # float() costs a tunnel round trip each.
        out = {k: float(v) for k, v in jax.device_get(metrics).items()}
        out["num_gaussians"] = int(out["num_gaussians"])
        self.history.append(out)
        return out

    def _maybe_grow_capacity(self):
        c = self.alive.shape[0]
        n = int(num_alive(self.alive))
        if n * self.config.capacity_headroom > c:
            new_c = int(c * 2)
            old_opt, old_strat = self.opt_state, self.strat_state
            self.params, self.alive = grow_capacity(self.params, self.alive, new_c)
            # Preserve Adam moments for surviving rows; only new slots start
            # from zero (reference semantics — a full moment reset causes a
            # transient optimization shock at every growth event).
            self.opt_state = optim.graft_opt_state(
                self.optimizer.init(self.params), old_opt
            )
            self.strat_state = optim.graft_opt_state(
                strategy.init_state(new_c), old_strat
            )

    def train(
        self,
        num_steps: Optional[int] = None,
        log_every: int = 100,
        log_fn: Callable = print,
        eval_cameras: Optional[Sequence[Camera]] = None,
        eval_images: Optional[Sequence] = None,
    ):
        """Run the training loop.

        When eval data is given, follows the reference's cadence
        (configs/rade_gs_method.py:26-29): one eval image every
        ``steps_per_eval_image`` steps, the full eval set every
        ``steps_per_eval_all_images``; results land in ``self.history``
        under ``eval_psnr`` / ``eval_all_psnr``.
        """
        # `or` would turn an explicit 0 (already-complete resume) into a
        # full extra default run.
        if num_steps is None:
            num_steps = self.config.max_iterations
        do_eval = eval_cameras is not None and len(eval_cameras) > 0
        t0 = time.time()
        for _ in range(num_steps):
            m = self.train_one_step()
            if do_eval and self.step % self.config.steps_per_eval_image == 0:
                i = (self.step // self.config.steps_per_eval_image) % len(
                    eval_cameras
                )
                ev = self.eval_image(eval_cameras[i], eval_images[i])
                self.history[-1]["eval_psnr"] = ev["psnr"]
                self.history[-1]["eval_ssim"] = ev["ssim"]
            if (
                do_eval
                and self.step % self.config.steps_per_eval_all_images == 0
            ):
                evs = [
                    self.eval_image(c, im)
                    for c, im in zip(eval_cameras, eval_images)
                ]
                self.history[-1]["eval_all_psnr"] = float(
                    np.mean([e["psnr"] for e in evs])
                )
                log_fn(
                    f"step {self.step:6d}  eval-all psnr "
                    f"{self.history[-1]['eval_all_psnr']:.2f}"
                )
            for w in self.writers:
                w.write(self.step, self.history[-1])
            if self.step % log_every == 0:
                rate = self.step / max(time.time() - t0, 1e-9)
                log_fn(
                    f"step {self.step:6d}  loss {m['loss']:.4f}  "
                    f"psnr {m['psnr']:.2f}  N {m['num_gaussians']}  "
                    f"{rate:.1f} it/s"
                )
            if self.checkpoint_fn and self.step % self.config.steps_per_save == 0:
                self.checkpoint_fn(self)
        return self.history

    # --------------------------------------------------------------- resume
    def save(self, directory) -> None:
        """Write a resumable checkpoint (params + opt + strategy state)."""
        from . import checkpoint as ckpt

        ckpt.save_checkpoint(
            directory, self.step, self.params, self.alive,
            opt_state=self.opt_state, strat_state=self.strat_state,
            metadata={"capacity": int(self.alive.shape[0])},
        )

    def restore(self, path) -> None:
        """Resume from a checkpoint written by :meth:`save`.

        Parameters and the alive mask are restored exactly; Adam moments are
        restored leaf-by-leaf where shapes still match (capacity growth
        after the save resets the affected moments, which is also what the
        reference's nerfstudio resume does after densification).
        """
        from . import checkpoint as ckpt

        step, params, alive, extras = ckpt.load_checkpoint(path)
        self.step = step
        self.params = params
        self.alive = alive
        self.opt_state = self.optimizer.init(params)
        flat, treedef = jax.tree_util.tree_flatten_with_path(self.opt_state)
        restored = []
        for keypath, leaf in flat:
            key = "opt/" + "/".join(str(p) for p in keypath)
            val = extras.get(key)
            if val is not None and hasattr(leaf, "shape") and \
                    val.shape == leaf.shape:
                restored.append(jnp.asarray(val))
            else:
                restored.append(leaf)
        self.opt_state = jax.tree_util.tree_unflatten(treedef, restored)
        # Same keypath rendering as save_checkpoint's _flatten (GetAttrKey
        # renders as ".grad_accum" — a hand-built "strat/grad_accum" key
        # silently never matched and resumes lost the densification stats).
        self.strat_state = strategy.init_state(alive.shape[0])
        flat_s, treedef_s = jax.tree_util.tree_flatten_with_path(
            self.strat_state
        )
        restored_s = []
        for keypath, leaf in flat_s:
            key = "strat/" + "/".join(str(p) for p in keypath)
            val = extras.get(key)
            if val is not None and val.shape == leaf.shape:
                restored_s.append(jnp.asarray(val))
            else:
                restored_s.append(leaf)
        self.strat_state = jax.tree_util.tree_unflatten(treedef_s, restored_s)

    # ----------------------------------------------------------------- eval
    # Module-level jit wrapper: a fresh `jax.jit(...)` per call would discard
    # the compilation cache and recompile on every eval image.
    _eval_outputs = staticmethod(
        jax.jit(
            rade_gs.get_outputs,
            static_argnames=("config", "training", "compute_error_maps"),
        )
    )

    def eval_image(self, camera: Camera, image) -> Dict[str, float]:
        outputs, _ = self._eval_outputs(
            self.params, self.alive, camera, self.step, self.config.model,
            rng=None, training=False,
        )
        metrics = {
            "psnr": float(losses.psnr(outputs["rgb"], jnp.asarray(image))),
            "ssim": float(losses.ssim(outputs["rgb"], jnp.asarray(image))),
        }
        from ..utils import lpips as lp

        if lp.lpips_available():
            metrics["lpips"] = lp.lpips(outputs["rgb"], image)
        return metrics
