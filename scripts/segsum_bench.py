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

    # --- isolation variants: where do v3's extra ~61 ms (over v0) go? ---
    from collab_splats_tpu.core.compositing import cumsum_mxu

    def _sorted_parts(idx, ct):
        out = jax.lax.sort(
            (idx,) + tuple(ct[:, j] for j in range(d)), num_keys=1)
        return out[0], out[1:]

    def v5(idx, ct):
        # sort + TRANSPOSED [D, M] blocked-MXU cumsum (no [M, D] stack).
        sidx, parts = _sorted_parts(idx, ct)
        cts_t = jnp.stack(parts, axis=0)              # [D, M] row-contig
        csum_t = cumsum_mxu(cts_t)
        return (jnp.dot(csum_t.sum(axis=0), wm)
                + jnp.sum(sidx).astype(jnp.float32) * 1e-9)

    def v6(idx, ct):
        # v5 + searchsorted boundaries.
        sidx, parts = _sorted_parts(idx, ct)
        cts_t = jnp.stack(parts, axis=0)
        csum_t = cumsum_mxu(cts_t)
        hi = jnp.searchsorted(
            sidx, jnp.arange(n, dtype=jnp.int32), side="right", method="sort"
        ).astype(jnp.int32)
        return (jnp.dot(csum_t.sum(axis=0), wm)
                + jnp.sum(hi.astype(jnp.float32)) * 1e-9)

    def v7(idx, ct):
        # full backward: transposed-MXU cumsum + transpose-back + row gather.
        sidx, parts = _sorted_parts(idx, ct)
        cts_t = jnp.stack(parts, axis=0)
        csum_t = cumsum_mxu(cts_t)
        csum = jnp.concatenate(
            [jnp.zeros((d, 1), ct.dtype), csum_t], axis=1).T   # [M+1, D]
        hi = jnp.searchsorted(
            sidx, jnp.arange(n, dtype=jnp.int32), side="right", method="sort"
        ).astype(jnp.int32)
        a = csum[hi]
        g = a - jnp.concatenate([jnp.zeros((1, d), ct.dtype), a[:-1]])
        return jnp.dot(wn, jnp.sum(g, axis=1))

    def v8(idx, ct):
        # boundary row-gather alone: monotone hi into a fixed [M+1, D].
        csum = jnp.concatenate([jnp.zeros((1, d), ct.dtype), ct], axis=0)
        hi = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(1), (n,), 0, m, dtype=jnp.int32))
        # Depend on idx so roll-perturbation sticks; `* 0` would be folded
        # by XLA's algebraic simplifier, so gate on an always-false
        # data-dependent predicate instead (values are >= 0 by construction,
        # which the compiler cannot prove).
        hi = jnp.where(idx[:n] < 0, hi + idx[:n], hi)
        a = csum[hi]
        g = a - jnp.concatenate([jnp.zeros((1, d), ct.dtype), a[:-1]])
        return jnp.dot(wn, jnp.sum(g, axis=1))

    def _csum_md(parts):
        # [M, D] inclusive prefix along axis 0: 512-blocked triangular
        # matmul on the MXU (no [M, D]-layout reduce-window, no transpose).
        cts = jnp.stack(parts, axis=1)                # [M, D]
        b = 512
        nb = m // b
        iota = jnp.arange(b)
        tri = (iota[:, None] >= iota[None, :]).astype(cts.dtype)
        xb = cts.reshape(nb, b, d)
        inner = jnp.einsum("ij,bjd->bid", tri, xb,
                           precision=jax.lax.Precision.HIGHEST)
        tot = jnp.sum(xb, axis=1)                     # [nb, d]
        pref = jnp.cumsum(tot, axis=0) - tot
        return (inner + pref[:, None, :]).reshape(m, d)

    def _hi_scatter(sidx):
        # hi[g] = #entries <= g, via scatter-max of (position+1) keyed by
        # gid + a forward-fill cummax over [N] (binning's inversion trick;
        # replaces searchsorted's concat-sort + extraction gather).
        pos1 = jnp.arange(1, m + 1, dtype=jnp.int32)
        h = jnp.zeros((n,), jnp.int32).at[sidx].max(pos1, mode="drop")
        return jax.lax.associative_scan(jnp.maximum, h)

    def v10(idx, ct):
        # full backward: axis-0 MXU scan in [M, D] + searchsorted + v8 gather.
        sidx, parts = _sorted_parts(idx, ct)
        csum = jnp.concatenate(
            [jnp.zeros((1, d), ct.dtype), _csum_md(parts)], axis=0)
        hi = jnp.searchsorted(
            sidx, jnp.arange(n, dtype=jnp.int32), side="right", method="sort"
        ).astype(jnp.int32)
        a = csum[hi]
        g = a - jnp.concatenate([jnp.zeros((1, d), ct.dtype), a[:-1]])
        return jnp.dot(wn, jnp.sum(g, axis=1))

    def v11(idx, ct):
        # sort + scatter-max/cummax hi (no cumsum; isolates hi cost).
        sidx, parts = _sorted_parts(idx, ct)
        hi = _hi_scatter(sidx)
        return (sum(jnp.dot(o, wm) for o in parts)
                + jnp.sum(hi.astype(jnp.float32)) * 1e-9)

    def v12(idx, ct):
        # full backward: axis-0 MXU scan + scatter-max hi + monotone gather.
        sidx, parts = _sorted_parts(idx, ct)
        csum = jnp.concatenate(
            [jnp.zeros((1, d), ct.dtype), _csum_md(parts)], axis=0)
        hi = _hi_scatter(sidx)
        a = csum[hi]
        g = a - jnp.concatenate([jnp.zeros((1, d), ct.dtype), a[:-1]])
        return jnp.dot(wn, jnp.sum(g, axis=1))

    def v9(idx, ct):
        # bf16 payload sort (halved sort bytes), f32 downstream.
        ctb = ct.astype(jnp.bfloat16)
        out = jax.lax.sort(
            (idx,) + tuple(ctb[:, j] for j in range(d)), num_keys=1)
        return sum(jnp.dot(o.astype(jnp.float32), wm) for o in out[1:])

    variants = {"v0": v0, "v1": v1, "v3": v3, "v4": v4, "v5": v5,
                "v6": v6, "v7": v7, "v8": v8, "v9": v9, "v10": v10,
                "v11": v11, "v12": v12}
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
