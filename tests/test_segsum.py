"""expand_rows (scatter-free gather backward) parity vs plain autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from collab_splats_tpu.ops.segsum import expand_rows, inclusive_cumsum_blocked


def test_cumsum_blocked_matches_plain():
    x = jax.random.normal(jax.random.PRNGKey(0), (1000, 7))
    np.testing.assert_allclose(
        inclusive_cumsum_blocked(x, block=64),
        jnp.cumsum(x, axis=0),
        rtol=1e-5, atol=1e-5,
    )


@pytest.mark.parametrize("m,n,d", [(333, 50, 5), (4096, 1000, 15), (64, 200, 3)])
def test_expand_rows_grad_matches_gather(m, n, d):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    table = jax.random.normal(k1, (n, d))
    idx = jax.random.randint(k2, (m,), 0, n, dtype=jnp.int32)
    ct_w = jax.random.normal(k3, (m, d))

    def f_fast(t):
        return jnp.sum(expand_rows(t, idx, n) * ct_w)

    def f_ref(t):
        return jnp.sum(t[idx] * ct_w)

    out_fast = expand_rows(table, idx, n)
    np.testing.assert_array_equal(out_fast, table[idx])

    g_fast = jax.grad(f_fast)(table)
    g_ref = jax.grad(f_ref)(table)
    np.testing.assert_allclose(g_fast, g_ref, rtol=1e-4, atol=1e-4)


def test_expand_rows_grad_under_jit_and_vmap():
    n, m, d = 100, 500, 4
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    table = jax.random.normal(k1, (3, n, d))
    idx = jax.random.randint(k2, (m,), 0, n, dtype=jnp.int32)

    def loss(t):
        return jnp.sum(expand_rows(t, idx, n) ** 2)

    g = jax.jit(jax.vmap(jax.grad(loss)))(table)
    g_ref = jax.vmap(jax.grad(lambda t: jnp.sum(t[idx] ** 2)))(table)
    np.testing.assert_allclose(g, g_ref, rtol=1e-4, atol=1e-4)


def test_expand_rows_empty_segments():
    # Gaussians never referenced must get exactly zero gradient.
    n, d = 50, 3
    table = jnp.ones((n, d))
    idx = jnp.array([3, 3, 7, 49], dtype=jnp.int32)
    g = jax.grad(lambda t: jnp.sum(expand_rows(t, idx, n)))(table)
    expected = np.zeros((n, d))
    expected[3] = 2.0
    expected[7] = 1.0
    expected[49] = 1.0
    np.testing.assert_allclose(g, expected, rtol=1e-6, atol=1e-6)


class TestWindowedGather:
    """windowed_gather must equal the plain clipped element gather for every
    offset alignment and boundary case (it is select-only by design — a
    one-hot reduction variant was miscompiled to a quantizing bf16 matmul
    on TPU; see the ops/tiles.py docstring)."""

    def test_matches_element_gather(self):
        from collab_splats_tpu.ops.tiles import windowed_gather
        key = jax.random.PRNGKey(0)
        for m in (37, 64, 1000, 1021):
            src = jax.random.randint(
                jax.random.fold_in(key, m), (m,), 0, 1 << 24, dtype=jnp.int32
            )
            for k_cap in (8, 32):
                # Cover every offset mod block, plus boundary starts.
                starts = jnp.array(
                    [0, 1, 2, 3, 4, 5, 6, 7, m - 1, m - k_cap if m > k_cap
                     else 0, m // 2], dtype=jnp.int32)
                got = windowed_gather(src, starts, k_cap)
                win = starts[:, None] + jnp.arange(k_cap, dtype=jnp.int32)
                # Lanes past the end read padding; callers mask them, so
                # compare only in-range lanes.
                in_range = win < m
                want = src[jnp.clip(win, 0, m - 1)]
                np.testing.assert_array_equal(
                    np.asarray(jnp.where(in_range, got, 0)),
                    np.asarray(jnp.where(in_range, want, 0)),
                    err_msg=f"m={m} k_cap={k_cap}",
                )


class TestPallasSegmentSum:
    """The Pallas one-hot-matmul segment-sum (ops/pallas/segsum_kernel.py)
    — the TPU backward of expand_rows — must match the exact scatter-add,
    including id skew, absent ids, and non-multiple sizes.  Interpret mode
    on CPU; the same kernel lowers on hardware (probed on the real chip)."""

    def test_matches_scatter_add(self):
        from collab_splats_tpu.ops.pallas.segsum_kernel import (
            expand_bwd_pallas,
        )

        rng = np.random.RandomState(3)
        for (m, d, n) in [(3000, 15, 1000), (2048, 3, 513), (1500, 7, 97)]:
            idx = jnp.asarray(rng.randint(0, n, m), jnp.int32)
            ct = jnp.asarray(rng.randn(m, d), jnp.float32)
            got = expand_bwd_pallas(n, idx, ct, interpret=True)
            ref = jnp.zeros((n, d)).at[idx].add(ct)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"m={m} d={d} n={n}")

    def test_skewed_ids_exact(self):
        """All rows concentrated on a handful of ids (one output block does
        all the work; most blocks see zero rows)."""
        from collab_splats_tpu.ops.pallas.segsum_kernel import (
            expand_bwd_pallas,
        )

        rng = np.random.RandomState(4)
        idx = jnp.asarray(rng.randint(0, 5, 4096), jnp.int32)
        ct = jnp.asarray(rng.randn(4096, 15), jnp.float32)
        got = expand_bwd_pallas(600, idx, ct, interpret=True)
        ref = jnp.zeros((600, 15)).at[idx].add(ct)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)
