"""Densify / prune strategy with static shapes (fixed capacity + alive mask).

TPU-native re-derivation of gsplat's ``DefaultStrategy`` as consumed by the
reference (rade_gs_model.py:19,192-198,456-458 via nerfstudio Splatfacto):

* accumulate per-Gaussian screen-space gradient statistics every step
  (``absgrad``-style: absolute values of the per-tile means2d gradients,
  recovered from the rasterizer's additive sink — see ops/rasterize.py);
* every ``refine_every`` steps inside the densification window: duplicate
  small high-gradient Gaussians, split large ones into
  ``n_split_samples`` resampled children, cull transparent / oversized ones;
* periodically clamp opacities down (reset).

The GPU implementation reallocates tensors each refine; under ``jit`` shapes
must be static, so parameters live in capacity-C arrays with an ``alive``
mask and refinement is a pure C-sized scatter program: freed slots are
ranked with a cumsum, new children are assigned to free slots by rank, and
overflow beyond capacity is dropped and counted (the trainer grows capacity
host-side when occupancy crosses a threshold, amortizing recompiles).

Defaults follow nerfstudio SplatfactoModelConfig (densify_grad_thresh 8e-4
on NDC-scaled gradients, densify_size_thresh 0.01, cull_alpha_thresh 0.1,
cull_scale_thresh 0.5, refine_every 100, warmup 500, stop_split_at 15000,
reset every 30 refines), the values the reference trains with.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.projection import quat_to_rotmat
from ..models.gaussians import GaussianParams
from ..ops.rasterize import RenderMeta
from ..ops.segsum import spread_masked


@dataclasses.dataclass(frozen=True)
class StrategyConfig:
    warmup_length: int = 500
    refine_every: int = 100
    densify_grad_thresh: float = 0.0008
    densify_size_thresh: float = 0.01
    n_split_samples: int = 2
    split_scale_factor: float = 1.6
    cull_alpha_thresh: float = 0.1
    cull_scale_thresh: float = 0.5
    cull_screen_size: float = 0.15
    split_screen_size: float = 0.05
    stop_screen_size_at: int = 4000
    reset_alpha_every: int = 30          # in units of refine_every
    stop_split_at: int = 15000
    continue_cull_post_densification: bool = True
    use_absgrad: bool = True

    def is_refine_step(self, step: int) -> bool:
        return (
            step > self.warmup_length
            and step % self.refine_every == 0
        )

    def is_reset_step(self, step: int) -> bool:
        # Splatfacto resets ``refine_every`` steps after each interval
        # boundary (step % interval == refine_every), not on the boundary
        # itself — the offset matters because densification is paused for
        # num_train_data + refine_every steps after every reset.
        period = self.reset_alpha_every * self.refine_every
        return (
            step > 0
            and step % period == self.refine_every
            and step < self.stop_split_at
        )

    def splits_allowed(self, step: int) -> bool:
        return step < self.stop_split_at

    def densify_active(self, step: int, num_train_data: int) -> bool:
        """Whether dup/split run at this refine step (Splatfacto
        ``do_densification``): inside the densification window AND past
        the post-opacity-reset pause — refining right after a reset would
        cull on clamped opacities and densify on stats gathered while
        opacities were clamped."""
        period = self.reset_alpha_every * self.refine_every
        return (
            step < self.stop_split_at
            and step % period > num_train_data + self.refine_every
        )

    def scale_cull_active(self, step: int) -> bool:
        return step > self.reset_alpha_every * self.refine_every

    def screen_size_active(self, step: int) -> bool:
        return step < self.stop_screen_size_at


class StrategyState(NamedTuple):
    grad_accum: jax.Array   # [C] accumulated NDC-scaled grad norms
    count: jax.Array        # [C] visibility counts
    max_radii: jax.Array    # [C] max screen radius as a fraction of max(W,H)


def init_state(capacity: int) -> StrategyState:
    z = jnp.zeros((capacity,), jnp.float32)
    return StrategyState(grad_accum=z, count=z, max_radii=z)


def update_state(
    state: StrategyState,
    meta: RenderMeta,
    sink_grad: jax.Array,
) -> StrategyState:
    """Accumulate densification statistics after one backward pass.

    Args:
        meta: rasterizer meta (projection + bins) from the forward.
        sink_grad: [T, K, 2] cotangent of the absgrad sink — the exact
            per-(tile, splat) screen-space gradient of the loss w.r.t. the
            2D means.  Absolute values are scatter-summed per Gaussian
            (gsplat's ``absgrad`` statistic at tile granularity) and scaled
            to NDC units (x max(W,H)/2) to match the Splatfacto threshold.
    """
    c = state.grad_accum.shape[0]
    idx = meta.bins.tile_gauss.reshape(-1)
    mask = meta.bins.tile_mask.reshape(-1)
    g = jnp.abs(sink_grad).reshape(-1, 2)
    g = jnp.where(mask[:, None], g, 0.0)
    # Collision-free scatter indices (contributions at masked slots are
    # zeroed above) — see ops/segsum.spread_masked.
    idx = spread_masked(idx, mask, c)
    # One 2-column row scatter (1-D scatters cost ~10x more per element).
    guv = jnp.zeros((c, 2), jnp.float32).at[idx].add(g, mode="drop")
    return _accumulate(state, meta, guv)


def update_state_from_isect(
    state: StrategyState,
    meta: RenderMeta,
    sink_grad: jax.Array,
) -> StrategyState:
    """Like :func:`update_state` but for the Pallas path's per-intersection
    sink cotangent [2, M]; intersections map to Gaussians via
    ``meta.bins.sorted_gid`` (segments never overlap, so a plain
    scatter-add accumulates the absgrad statistic)."""
    c = state.grad_accum.shape[0]
    gid = (
        meta.aligned_gid if meta.aligned_gid is not None
        else meta.bins.sorted_gid
    )
    # Only slots inside real tile segments carry gradients; the backward
    # kernel zero-fills the rest, so an unmasked scatter-add is safe.
    g = jnp.abs(sink_grad).T                              # [M, 2]
    guv = jnp.zeros((c, 2), jnp.float32).at[gid].add(g, mode="drop")
    return _accumulate(state, meta, guv)


def _accumulate(
    state: StrategyState, meta: RenderMeta, guv: jax.Array
) -> StrategyState:
    """Shared statistics tail: NDC scaling (x max(W,H)/2, the Splatfacto
    threshold convention), grad norm, visibility counts, max radii."""
    scale = 0.5 * max(meta.width, meta.height)
    grad_ndc = jnp.sqrt(
        (guv[:, 0] * scale) ** 2 + (guv[:, 1] * scale) ** 2
    )
    visible = meta.proj.valid
    radii_frac = meta.proj.radius / float(max(meta.width, meta.height))
    return StrategyState(
        grad_accum=state.grad_accum + grad_ndc,
        count=state.count + visible.astype(jnp.float32),
        max_radii=jnp.maximum(state.max_radii, radii_frac),
    )


def reset_opacity(params: GaussianParams, cfg: StrategyConfig) -> GaussianParams:
    """Clamp opacities to at most 2 * cull_alpha_thresh (Splatfacto reset)."""
    cap = 2.0 * cfg.cull_alpha_thresh
    logit_cap = float(jnp.log(cap / (1.0 - cap)))
    out = dict(params)
    out["opacities"] = jnp.minimum(params["opacities"], logit_cap)
    return out


class RefineResult(NamedTuple):
    params: GaussianParams
    alive: jax.Array
    written: jax.Array       # [C] rows newly written (optimizer state -> 0)
    state: StrategyState     # reset accumulators
    n_dup: jax.Array
    n_split: jax.Array
    n_cull: jax.Array
    dropped: jax.Array       # children dropped for lack of capacity


def refine(
    params: GaussianParams,
    alive: jax.Array,
    state: StrategyState,
    key: jax.Array,
    cfg: StrategyConfig,
    scene_scale: float = 1.0,
    allow_split: bool = True,
    scale_cull: bool = False,
    screen_size_cull: bool = False,
    allow_dup: bool = True,
) -> RefineResult:
    """One densify/prune pass (static shapes; jit-safe).

    The static flags come from :class:`StrategyConfig` schedule helpers and
    are resolved host-side by the trainer at each refine step.
    ``allow_split=False, allow_dup=False`` gives the cull-only pass the
    reference runs after ``stop_split_at`` (Splatfacto's
    ``continue_cull_post_densification`` branch).
    """
    c = alive.shape[0]
    alive_f = alive
    opac = jax.nn.sigmoid(params["opacities"][:, 0])
    scales = jnp.exp(params["scales"])
    scale_max = jnp.max(scales, axis=-1)

    avg_grad = state.grad_accum / jnp.clip(state.count, 1.0, None)
    high_grad = alive_f & (avg_grad > cfg.densify_grad_thresh) & (state.count > 0)

    size_thresh = cfg.densify_size_thresh * scene_scale
    big_world = scale_max > size_thresh
    big_screen = state.max_radii > cfg.split_screen_size

    is_split = high_grad & big_world
    if screen_size_cull:
        is_split = is_split | (high_grad & big_screen)
    if not allow_split:
        is_split = jnp.zeros_like(is_split)
    is_dup = high_grad & ~big_world & ~is_split
    if not allow_dup:
        is_dup = jnp.zeros_like(is_dup)

    culled = alive_f & (opac < cfg.cull_alpha_thresh)
    if scale_cull:
        culled = culled | (alive_f & (scale_max > cfg.cull_scale_thresh * scene_scale))
        if screen_size_cull:
            culled = culled | (alive_f & (state.max_radii > cfg.cull_screen_size))
    is_dup = is_dup & ~culled
    is_split = is_split & ~culled

    # Free slots come from dead/culled rows only.  A split source is
    # removed ONLY when all of its children fit (all-or-nothing): letting
    # sources free their own slot first allowed a full table to delete
    # high-gradient Gaussians outright (source removed, children dropped).
    free = (~alive_f) | culled
    n_free = jnp.sum(free.astype(jnp.int32))

    # rank -> slot mapping for free slots.
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1
    ranks = jnp.where(free, free_rank, c)
    slot_of_rank = jnp.full((c,), c, jnp.int32).at[ranks].set(
        jnp.arange(c, dtype=jnp.int32), mode="drop"
    )

    n_dup = jnp.sum(is_dup.astype(jnp.int32))
    split_rank = jnp.cumsum(is_split.astype(jnp.int32)) - 1
    dup_rank = jnp.cumsum(is_dup.astype(jnp.int32)) - 1
    n_items_split = cfg.n_split_samples
    total_split = jnp.sum(is_split.astype(jnp.int32))
    # Split children rank FIRST (they replace their removed source — losing
    # them to a dup's copy is a net deletion); a split fits iff its last
    # child's rank is in range.
    split_fits = is_split & (
        (split_rank + 1) * n_items_split <= n_free
    )
    survivors = alive_f & ~culled & ~split_fits

    new_params = dict(params)
    written = jnp.zeros((c,), bool)

    from ..models.gaussians import NON_GAUSSIAN_KEYS

    def is_gauss_array(v):
        return hasattr(v, "shape") and v.ndim >= 1 and v.shape[0] == c

    def scatter_rows(dst_params, written, targets, source_params):
        safe_t = jnp.where(targets < c, targets, c)
        out = {}
        for k, v in dst_params.items():
            if k not in NON_GAUSSIAN_KEYS and is_gauss_array(v):
                out[k] = v.at[safe_t].set(source_params[k], mode="drop")
            else:  # e.g. nested decoder subtree: untouched by refinement
                out[k] = v
        written = written.at[safe_t].set(True, mode="drop")
        return out, written

    # --- splits: n_split_samples children per source, resampled positions,
    # scales shrunk by split_scale_factor (source removed iff all children
    # placed — see split_fits above).
    rot = quat_to_rotmat(params["quats"])
    split_scales = jnp.log(
        jnp.clip(scales / cfg.split_scale_factor, 1e-10, None)
    )
    for j in range(n_items_split):
        eps = jax.random.normal(jax.random.fold_in(key, j), (c, 3))
        offset = jnp.einsum("nij,nj->ni", rot, scales * eps)
        child = dict(params)
        child["means"] = params["means"] + offset
        child["scales"] = split_scales
        item_rank = split_rank * n_items_split + j
        targets = jnp.where(
            split_fits,
            slot_of_rank[jnp.clip(item_rank, 0, c - 1)],
            c,
        )
        new_params, written = scatter_rows(new_params, written, targets, child)

    # --- duplications: one copy per source, ranked after all split
    # children.
    dup_item_rank = total_split * n_items_split + dup_rank
    dup_targets = jnp.where(
        is_dup & (dup_item_rank < n_free),
        slot_of_rank[jnp.clip(dup_item_rank, 0, c - 1)],
        c,
    )
    new_params, written = scatter_rows(new_params, written, dup_targets, params)

    new_alive = survivors | written
    wanted = n_dup + total_split * n_items_split
    dropped = wanted - jnp.sum(written.astype(jnp.int32))

    return RefineResult(
        params=new_params,
        alive=new_alive,
        written=written,
        state=init_state(c),
        n_dup=n_dup,
        n_split=total_split,
        n_cull=jnp.sum(culled.astype(jnp.int32)),
        dropped=dropped,
    )


def zero_opt_rows(opt_state, written: jax.Array):
    """Zero optimizer moment rows for newly written Gaussians.

    Applied generically over the optax state pytree: any leaf whose leading
    dimension equals the capacity is masked (Adam mu/nu; the scalar step
    counts pass through untouched).
    """
    c = written.shape[0]

    def fix(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == c:
            mask = written.reshape((c,) + (1,) * (leaf.ndim - 1))
            return jnp.where(mask, jnp.zeros_like(leaf), leaf)
        return leaf

    return jax.tree_util.tree_map(fix, opt_state)
