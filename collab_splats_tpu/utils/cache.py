"""Persistent XLA compilation cache.

Renderer/train-step compiles take 2-6 *minutes* on the TPU compile service
(BENCH_r01.json recorded 343 s for the forward bench alone).  The persistent
cache makes every repeat invocation — re-runs of bench.py, resumed training,
per-resolution eval variants seen before — load in seconds instead.

Call :func:`enable_compilation_cache` once per process before the first
``jit`` compilation.  Safe to call multiple times; honors an explicit
``JAX_COMPILATION_CACHE_DIR`` if the user already set one.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
    "collab_splats_tpu", "jax_cache",
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable the persistent compilation cache and return its directory."""
    import jax

    path = (
        cache_dir
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or _DEFAULT_DIR
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache every program that took noticeable time to compile; tiny
    # programs recompile faster than a disk round-trip.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
