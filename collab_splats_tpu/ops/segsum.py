"""Scatter-free gradient reduction for the intersection expansion gather.

The compositor expands the per-gaussian table [N, D] into per-intersection
rows [M, D] with one row gather (``table[idx]``).  Autodiff transposes that
gather into a [M, D] -> [N, D] scatter-add, which is the slowest op class on
TPU: profiled at 146 ms/step at 1M gaussians / 720p (half the whole train
step), even with collision-free indices.

``expand_rows`` keeps the forward gather but replaces the backward with a
sorted segment-sum built only from TPU-fast primitives:

    sort (idx, iota)            -- group cotangent rows by gaussian id
    row gather  ct[order]       -- [M, D] contiguous rows
    blocked cumsum              -- inclusive prefix sum over M
    searchsorted (sort method)  -- per-gaussian segment boundaries
    two row gathers + subtract  -- segment sums = prefix differences

Microbenched at M=2M, D=15, N=1M on TPU v5e: the whole backward is ~12 ms
vs 146 ms for the scatter-add it replaces.

Precision note: a segment sum computed as a difference of two running
prefixes loses ~eps * |prefix| absolute accuracy.  Cotangents are
mixed-sign, so the prefix is a random walk of magnitude ~sqrt(M)·sigma
while segment sums are ~sqrt(s)·sigma — relative error ~1e-4 at M=2M,
i.e. bf16-level noise on gradients, well inside training tolerance.
The parity test (tests/test_segsum.py) bounds it against the exact
scatter backward.

Reference behavior being served: gsplat-rade's rasterize_backward CUDA
kernel reduces per-intersection gradients to per-gaussian gradients with
atomics (SURVEY.md §2b N1); this is the TPU-native equivalent.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def spread_masked(idx: jax.Array, mask: jax.Array, n: int) -> jax.Array:
    """Replace masked entries of ``idx`` with a uniform spread over [0, n).

    Keeps every index in range for gathers/scatters and avoids funneling
    all dead slots onto one row (which makes a scatter-add collision-bound
    and a sorted reduction lopsided).  Precondition: the caller zeroes the
    masked rows' contributions, so *where* they land never affects results.
    """
    spread = jnp.arange(idx.shape[0], dtype=jnp.int32) % jnp.int32(n)
    return jnp.where(mask, idx, spread)


def inclusive_cumsum_blocked(x: jax.Array, block: int = 512) -> jax.Array:
    """Inclusive cumsum of ``x`` [M, D] along axis 0, computed as
    per-block cumsums plus a prefix of block totals (two short scans
    instead of one M-long scan; also better-conditioned than a single
    running sum)."""
    m, d = x.shape
    nb = -(-m // block)
    xp = jnp.pad(x, ((0, nb * block - m), (0, 0))).reshape(nb, block, d)
    inner = jnp.cumsum(xp, axis=1)
    tot = inner[:, -1]
    pref = jnp.cumsum(tot, axis=0) - tot
    return (inner + pref[:, None, :]).reshape(nb * block, d)[:m]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def expand_rows(table: jax.Array, idx: jax.Array, n: int) -> jax.Array:
    """``table[idx]`` with a sorted-segment-sum backward (see module doc).

    Args:
        table: [N, D] float rows.
        idx: [M] int32 row indices, all in [0, N).
        n: static row count (== table.shape[0]; static so the backward
           can build the [N, D] gradient without a traced shape).

    Returns:
        [M, D] gathered rows; d(out)/d(table) avoids the scatter-add.
    """
    del n
    return table[idx]


def _expand_fwd(table, idx, n):
    del n
    return table[idx], idx


def _use_pallas_segsum() -> bool:
    """Pallas segment-sum backward on TPU; pure-XLA elsewhere.

    Override with COLLAB_SPLATS_SEGSUM=xla|pallas (A/B measurement)."""
    import os

    force = os.environ.get("COLLAB_SPLATS_SEGSUM")
    if force == "xla":
        return False
    if force == "pallas":
        return True
    try:
        import jax as _jax

        return _jax.default_backend() == "tpu"
    except Exception:
        return False


def _expand_bwd(n, idx, ct):
    if _use_pallas_segsum():
        from .pallas.segsum_kernel import expand_bwd_pallas

        return expand_bwd_pallas(n, idx, ct), None
    d = ct.shape[1]
    # Move the cotangent rows into gid order THROUGH the sort network
    # (payload sort): microbenched at 7 ms for [2M, 15] — the same data
    # moved with an explicit row gather after an iota-payload sort costs
    # ~50 ms (indexed row ops are ~25 ns/row on TPU regardless of order).
    sorted_ops = jax.lax.sort(
        (idx.astype(jnp.int32),) + tuple(ct[:, j] for j in range(d)),
        num_keys=1,
    )
    sidx = sorted_ops[0]
    cts = jnp.stack(sorted_ops[1:], axis=1)           # [M, D], gid-ordered
    csum = inclusive_cumsum_blocked(cts)
    csum = jnp.concatenate(
        [jnp.zeros((1, d), ct.dtype), csum], axis=0
    )                                                 # [M+1, D]; csum[k] = sum of first k
    # hi[g] = #entries <= g.  The segment sum is csum[hi[g]] - csum[lo[g]]
    # with lo[g] = hi[g-1], so after ONE monotone row gather A = csum[hi]
    # the lo term is just A shifted by one row — no second gather.
    # hi itself comes from a scatter-max of (position+1) keyed by the
    # sorted gid plus a forward-fill cummax (the binning inversion trick):
    # measured ~19 ms vs ~25 ms for searchsorted(method="sort"), whose
    # internal concat-sort re-sorts M+N keys (scripts/segsum_bench.py
    # v11/v12 vs v6/v10).
    pos1 = jnp.arange(1, sidx.shape[0] + 1, dtype=jnp.int32)
    hi = jnp.zeros((n,), jnp.int32).at[sidx].max(pos1, mode="drop")
    hi = jax.lax.associative_scan(jnp.maximum, hi)
    a = csum[hi]                                      # [N, D]
    grad_table = a - jnp.concatenate([jnp.zeros((1, d), ct.dtype), a[:-1]])
    return grad_table, None


expand_rows.defvjp(_expand_fwd, _expand_bwd)
