"""Checkpoint save / load / resume.

Replaces the nerfstudio checkpoint path the reference delegates to
(SURVEY.md §5: ``steps_per_save=2000``, ``.ckpt`` under
``output/<method>/<run>/``, restored via ``eval_setup`` at
utils/model_loading.py:28-35).  Format: one ``step-XXXXXXXX.ckpt.npz`` per
save holding the flattened train-state pytree plus a JSON sidecar with the
static config — dependency-light, host-portable, and loadable without
rebuilding the training pipeline.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    flat = {}
    leaves, treedef = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in leaves:
        key = "/".join(str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(
    directory: str | Path,
    step: int,
    params: Dict[str, jax.Array],
    alive: jax.Array,
    opt_state: Any = None,
    strat_state: Any = None,
    metadata: Optional[Dict] = None,
) -> Path:
    """Write ``step-{step:08d}.ckpt.npz`` (+ metadata.json once)."""
    directory = Path(directory)
    directory.mkdir(parents=True, exist_ok=True)
    payload = {}
    for k, v in params.items():
        if isinstance(v, dict):  # nested subtrees (decoder, ...)
            for k2, v2 in v.items():
                payload[f"params/{k}/{k2}"] = np.asarray(v2)
        else:
            payload[f"params/{k}"] = np.asarray(v)
    payload["alive"] = np.asarray(alive)
    if opt_state is not None:
        payload.update(
            {f"opt/{k}": v for k, v in _flatten(opt_state).items()}
        )
    if strat_state is not None:
        payload.update(
            {f"strat/{k}": v for k, v in _flatten(strat_state).items()}
        )
    path = directory / f"step-{step:08d}.ckpt.npz"
    np.savez_compressed(path, **payload)
    if metadata is not None:
        with open(directory / "metadata.json", "w") as f:
            json.dump({"step": step, **metadata}, f, indent=2, default=str)
    return path


def latest_checkpoint(directory: str | Path) -> Optional[Path]:
    directory = Path(directory)
    if not directory.exists():
        return None
    ckpts = sorted(directory.glob("step-*.ckpt.npz"))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path: str | Path) -> Tuple[int, Dict[str, jnp.ndarray],
                                               jnp.ndarray, Dict[str, np.ndarray]]:
    """Load params + alive (+ raw extra arrays) from a checkpoint file.

    Returns (step, params, alive, extras) where ``extras`` holds the raw
    ``opt/...`` / ``strat/...`` arrays for callers that restore optimizer
    state (see Trainer.restore).
    """
    path = Path(path)
    m = re.match(r"step-(\d+)\.ckpt\.npz", path.name)
    step = int(m.group(1)) if m else 0
    data = np.load(path)
    params: Dict[str, jnp.ndarray] = {}
    for k in data.files:
        if not k.startswith("params/"):
            continue
        parts = k.split("/")
        if len(parts) == 2:
            params[parts[1]] = jnp.asarray(data[k])
        else:  # nested subtree, e.g. params/decoder/hidden_w
            params.setdefault(parts[1], {})[parts[2]] = jnp.asarray(data[k])
    alive = jnp.asarray(data["alive"])
    extras = {
        k: data[k] for k in data.files
        if not k.startswith("params/") and k != "alive"
    }
    return step, params, alive, extras
