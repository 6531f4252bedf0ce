"""Per-group optimizers with the reference's exact LR table.

Re-creates the nerfstudio optimizer stack consumed by the reference
(configs/rade_gs_method.py:44-84, configs/rade_features_method.py:44-95):
one Adam(eps=1e-15) per parameter group, with nerfstudio-style exponential
decay schedules (log-space lerp with optional sine warmup) on selected
groups.  Built on optax `multi_transform` so the whole update is one fused
jitted transformation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class GroupSpec:
    lr: float
    lr_final: Optional[float] = None
    max_steps: int = 30000
    warmup_steps: int = 0
    lr_pre_warmup: float = 1e-8
    eps: float = 1e-15


# The reference optimizer table (configs/rade_gs_method.py:44-84 and
# rade_features_method.py:72-81).
RADE_GS_GROUPS: Dict[str, GroupSpec] = {
    "means": GroupSpec(lr=1.6e-4, lr_final=1.6e-6, max_steps=30000),
    "features_dc": GroupSpec(lr=2.5e-3),
    "features_rest": GroupSpec(lr=2.5e-3 / 20.0),
    "opacities": GroupSpec(lr=5e-2),
    "scales": GroupSpec(lr=5e-3),
    "quats": GroupSpec(lr=1e-3),
}

RADE_FEATURES_GROUPS: Dict[str, GroupSpec] = {
    **RADE_GS_GROUPS,
    "distill_features": GroupSpec(lr=2.5e-3, lr_final=5e-4, max_steps=10000),
    "decoder": GroupSpec(lr=1e-3),
}


def nerfstudio_exponential_decay(spec: GroupSpec) -> optax.Schedule:
    """nerfstudio ExponentialDecayScheduler semantics: sine warmup from
    ``lr_pre_warmup`` to ``lr``, then log-space lerp from ``lr`` to
    ``lr_final`` over ``max_steps``."""
    lr_final = spec.lr_final if spec.lr_final is not None else spec.lr

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if spec.warmup_steps > 0:
            warm = spec.lr_pre_warmup + (spec.lr - spec.lr_pre_warmup) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / spec.warmup_steps, 0.0, 1.0)
            )
        else:
            warm = jnp.asarray(spec.lr, jnp.float32)
        t = jnp.clip(
            (step - spec.warmup_steps) / max(spec.max_steps - spec.warmup_steps, 1),
            0.0,
            1.0,
        )
        decayed = jnp.exp(
            jnp.log(spec.lr) * (1.0 - t) + jnp.log(lr_final) * t
        )
        return jnp.where(step < spec.warmup_steps, warm, decayed)

    return schedule


def make_optimizer(
    groups: Dict[str, GroupSpec],
    param_labels,
) -> optax.GradientTransformation:
    """Build the multi-group optimizer.

    Args:
        groups: group name -> spec.
        param_labels: pytree (matching the params pytree) of group-name
            strings, e.g. ``{"means": "means", ...}``; decoder params may all
            map to the label "decoder".
    """
    transforms = {}
    for name, spec in groups.items():
        transforms[name] = optax.chain(
            optax.scale_by_adam(eps=spec.eps),
            optax.scale_by_schedule(nerfstudio_exponential_decay(spec)),
            optax.scale(-1.0),
        )
    return optax.multi_transform(transforms, param_labels)


def default_labels(params: Dict[str, jax.Array]):
    """Label each top-level param array with its own name."""
    return {k: k for k in params}


def zero_group_moments(opt_state, label: str):
    """Zero the Adam moment arrays of one ``multi_transform`` group.

    Used on opacity reset: gsplat's DefaultStrategy and nerfstudio's
    Splatfacto both zero the opacity optimizer state when opacities are
    clamped, otherwise the accumulated momentum immediately pushes
    opacities back up and the reset's pruning effect is lost.  The step
    count (scalar leaves) is preserved so bias correction stays consistent.
    """
    inner = dict(opt_state.inner_states)
    if label not in inner:
        return opt_state

    def fix(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1:
            return jnp.zeros_like(leaf)
        return leaf

    inner[label] = jax.tree_util.tree_map(fix, inner[label])
    return opt_state._replace(inner_states=inner)


def graft_opt_state(fresh_state, old_state):
    """Copy surviving optimizer-state rows from ``old_state`` into a freshly
    initialized ``fresh_state`` after capacity growth.

    Leaves with identical shapes (scalars like Adam's step count, and any
    group untouched by growth) are taken from the old state verbatim;
    capacity-major arrays keep their old rows and zero-init the new slots —
    matching the reference stack, which preserves moments for existing
    Gaussians and only zeroes new ones (nerfstudio splatfacto
    dup_in_all_optim / gsplat DefaultStrategy semantics).
    """

    def graft(new_leaf, old_leaf):
        if not hasattr(old_leaf, "shape") or not hasattr(new_leaf, "shape"):
            return old_leaf
        if old_leaf.shape == new_leaf.shape:
            return old_leaf
        if (
            old_leaf.ndim >= 1
            and new_leaf.ndim == old_leaf.ndim
            and new_leaf.shape[1:] == old_leaf.shape[1:]
            and new_leaf.shape[0] >= old_leaf.shape[0]
        ):
            return new_leaf.at[: old_leaf.shape[0]].set(old_leaf)
        return new_leaf

    return jax.tree_util.tree_map(graft, fresh_state, old_state)
