"""Microbench variants of the segsum backward's payload sort (NOTES_ROUND3 #3).

The in-graph `sort.573` costs ~19.8 ms/step at M=2M, D=15 while an earlier
microbench of the same sort read 7.1 ms — suspected cause is the ct[:, j]
column-extraction layout feeding the sort.  Variants (jitted fori_loop,
roll-perturbed keys; reductions are *position-weighted* so XLA cannot fold
the sort away — a plain sum over sorted payloads is order-invariant and
constant-folds, which burned one bench run):

  v0  current backward sort: lax.sort((idx,) + tuple(ct[:, j]))
  v1  transpose first:       ctt = ct.T (one copy), payload rows ctt[j]
  v3  full _expand_bwd as shipped
  v4  full backward with transposed-row extraction

Run on the real TPU: python scripts/segsum_bench.py [v0 v1 v3 v4]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from collab_splats_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from collab_splats_tpu.ops.segsum import (
        _expand_bwd,
        inclusive_cumsum_blocked,
    )

    m, d, n, reps = 1 << 21, 15, 1 << 20, 10
    k0, k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 4)
    idx = jax.random.randint(k0, (m,), 0, n, dtype=jnp.int32)
    ct = jax.random.normal(k1, (m, d), dtype=jnp.float32)
    wm = jax.random.normal(k2, (m,), dtype=jnp.float32)   # positional weights
    wn = jax.random.normal(k3, (n,), dtype=jnp.float32)

    def v0(idx, ct):
        out = jax.lax.sort(
            (idx,) + tuple(ct[:, j] for j in range(d)), num_keys=1)
        return sum(jnp.dot(o, wm) for o in out[1:])

    def v1(idx, ct):
        ctt = ct.T
        out = jax.lax.sort(
            (idx,) + tuple(ctt[j] for j in range(d)), num_keys=1)
        return sum(jnp.dot(o, wm) for o in out[1:])

    def v3(idx, ct):
        g, _ = _expand_bwd(n, idx, ct)
        return jnp.dot(wn, jnp.sum(g, axis=1))

    def _bwd_transposed(n, idx, ct):
        ctt = ct.T
        sorted_ops = jax.lax.sort(
            (idx.astype(jnp.int32),) + tuple(ctt[j] for j in range(d)),
            num_keys=1)
        sidx = sorted_ops[0]
        cts = jnp.stack(sorted_ops[1:], axis=1)
        csum = inclusive_cumsum_blocked(cts)
        csum = jnp.concatenate([jnp.zeros((1, d), ct.dtype), csum], axis=0)
        hi = jnp.searchsorted(
            sidx, jnp.arange(n, dtype=jnp.int32), side="right", method="sort"
        ).astype(jnp.int32)
        a = csum[hi]
        return a - jnp.concatenate([jnp.zeros((1, d), ct.dtype), a[:-1]])

    def v4(idx, ct):
        g = _bwd_transposed(n, idx, ct)
        return jnp.dot(wn, jnp.sum(g, axis=1))

    variants = {"v0": v0, "v1": v1, "v3": v3, "v4": v4}
    names = sys.argv[1:] or list(variants)

    def bench(name, fn):
        @jax.jit
        def loop(idx, ct):
            def body(i, acc):
                return acc + fn(jnp.roll(idx, i), ct)
            return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

        t0 = time.time(); jax.block_until_ready(loop(idx, ct))
        c = time.time() - t0
        t0 = time.time(); jax.block_until_ready(loop(idx, ct))
        per = (time.time() - t0) / reps
        print(f"{name}: compile+1st {c:.1f}s, per-iter {per * 1000:.2f} ms",
              flush=True)

    for nm in names:
        bench(nm, variants[nm])


if __name__ == "__main__":
    main()
