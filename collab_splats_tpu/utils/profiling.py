"""Profiling and timing helpers — first-class, unlike the reference
(SURVEY.md §5: the reference ships no tracing at all).

Two tools:

* :func:`trace` — a context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace of everything executed inside it.
* :func:`timed` — honest steady-state timing of a jittable function on this
  environment's devices: runs the body inside a jitted ``fori_loop`` with a
  *traced* repetition count and reports ``(t(r2) - t(r1)) / (r2 - r1)``,
  which cancels dispatch/tunnel overhead and defeats loop-invariant
  hoisting (the per-call wall clock through the axon tunnel is meaningless,
  and epsilon-perturbation tricks fold away in f32 — see
  .claude/skills/verify/SKILL.md).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace for TensorBoard / Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(
    fn: Callable[..., jax.Array],
    *args,
    reps: tuple = (2, 10),
    perturb: Optional[int] = 0,
) -> float:
    """Steady-state seconds per invocation of ``fn(*args) -> scalar``.

    Args:
        fn: function returning a scalar (summed into the loop carry).
        perturb: index of an array argument to ``jnp.roll`` by the loop
            counter (prevents XLA hoisting the loop-invariant body); None
            disables.
    """

    @jax.jit
    def looped(r, *a):
        def body(i, acc):
            if perturb is not None:
                a2 = list(a)
                a2[perturb] = jnp.roll(a2[perturb], i, axis=0)
                return acc + fn(*a2)
            return acc + fn(*a)

        return jax.lax.fori_loop(0, r, body, jnp.zeros(()))

    jax.block_until_ready(looped(1, *args))  # compile
    r1, r2 = reps
    t0 = time.time()
    jax.block_until_ready(looped(r1, *args))
    t_a = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(looped(r2, *args))
    t_b = time.time() - t0
    return max(t_b - t_a, 0.0) / (r2 - r1)
