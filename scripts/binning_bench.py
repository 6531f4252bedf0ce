"""Microbench: binning building blocks on the real TPU.

Times the candidate implementations of the two row-gather floors in
``ops/tiles.bin_gaussians`` (profiled ~24 ms of the 1M/720p forward):

  v1  packed[gid] row gather (current): [M, 10] rows by the cummax gid
  v2  scan-fill: scatter packed rows at segment starts, forward-fill with
      a (gid-tagged select) associative scan — no per-row gather
  v3  windowed_gather block=8 (current)
  v4  windowed_gather block=32
  v5  g_full expand gather [T*K, 16] rows (current, for reference)
  v6  16-operand payload sort (current segsum backward head)
  v7  2-operand sort + padded [M, 16] row gather (candidate replacement)

Timing: jitted fori_loop, body perturbed by rolling an input; report
(t - t_small)/reps style deltas are avoided — each variant keeps a real
data dependence via jnp.roll(x, i).
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

    m_cap = 1 << 21
    n = 1_000_000
    t_tiles, k_cap = 3600, 512
    reps = 10
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    packed10 = jax.random.normal(k1, (n, 10), jnp.float32)
    gid = jnp.sort(jax.random.randint(k2, (m_cap,), 0, n, jnp.int32))
    counts = jnp.bincount(gid, length=n).astype(jnp.int32)
    offsets = jnp.cumsum(counts) - counts
    starts_t = jnp.sort(jax.random.randint(k3, (t_tiles,), 0, m_cap - k_cap,
                                           jnp.int32))
    per_gauss16 = jax.random.normal(k4, (n, 16), jnp.float32)
    flat_idx = jax.random.randint(key, (t_tiles * k_cap,), 0, n, jnp.int32)
    ct15 = jax.random.normal(k2, (m_cap, 15), jnp.float32)
    idx_u = jax.random.randint(k3, (m_cap,), 0, n, jnp.int32)

    def timeit(name, build):
        fn = jax.jit(build)
        t0 = time.time()
        jax.block_until_ready(fn(0))
        compile_s = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(fn(0))
        per = (time.time() - t0) / reps
        tries = 0
        while per * 1000 < 0.01 and tries < 3:
            jax.clear_caches()
            jax.block_until_ready(fn(0))
            t0 = time.time()
            jax.block_until_ready(fn(0))
            per = (time.time() - t0) / reps
            tries += 1
        print(f"{name:34s} {per * 1e3:8.2f} ms  (compile {compile_s:.0f}s)",
              flush=True)

    # v1: current row gather by cummax gid.
    def v1(_):
        def body(i, acc):
            g = packed10[jnp.roll(gid, i)]
            return acc + g[0, 0] + g[-1, -1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    # v2: scatter rows at first slots + select-carry associative scan.
    def v2(_):
        def body(i, acc):
            pk = jnp.roll(packed10, i, axis=0)
            seed_pos = jnp.where(counts > 0, offsets, m_cap)
            tag0 = jnp.full((m_cap,), -1, jnp.int32).at[seed_pos].max(
                jnp.arange(n, dtype=jnp.int32), mode="drop")
            rows0 = jnp.zeros((m_cap, 10), pk.dtype).at[seed_pos].set(
                pk, mode="drop")

            def comb(a, b):
                ta, ra = a
                tb, rb = b
                pickb = (tb >= ta)
                return (jnp.where(pickb, tb, ta),
                        jnp.where(pickb[:, None], rb, ra))

            tag, rows = jax.lax.associative_scan(comb, (tag0, rows0))
            return acc + rows[0, 0] + rows[-1, -1] + tag[-1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    from collab_splats_tpu.ops.tiles import windowed_gather

    def mk_windowed(block):
        def f(_):
            def body(i, acc):
                tg = windowed_gather(jnp.roll(gid, i), starts_t, k_cap,
                                     block=block)
                return acc + tg[0, 0] + tg[-1, -1]
            return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))
        return f

    def v5(_):
        def body(i, acc):
            g = per_gauss16[jnp.roll(flat_idx, i)]
            return acc + g[0, 0] + g[-1, -1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    def v6(_):
        def body(i, acc):
            ct = jnp.roll(ct15, i, axis=0)
            ops = jax.lax.sort(
                (idx_u,) + tuple(ct[:, j] for j in range(15)), num_keys=1)
            return acc + ops[1][0] + ops[8][-1]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    def v7(_):
        def body(i, acc):
            ct = jnp.roll(ct15, i, axis=0)
            ct16 = jnp.pad(ct, ((0, 0), (0, 1)))
            _, order = jax.lax.sort(
                (idx_u, jnp.arange(m_cap, dtype=jnp.int32)), num_keys=1)
            rows = ct16[order]
            return acc + rows[0, 0] + rows[-1, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.zeros(()))

    timeit("v1 packed[gid] row gather [M,10]", v1)
    timeit("v2 scan-fill rows (assoc select)", v2)
    timeit("v3 windowed_gather block=8", mk_windowed(8))
    timeit("v4 windowed_gather block=32", mk_windowed(32))
    timeit("v5 g_full gather [T*K,16]", v5)
    timeit("v6 16-op payload sort", v6)
    timeit("v7 2-op sort + [M,16] row gather", v7)


if __name__ == "__main__":
    main()
