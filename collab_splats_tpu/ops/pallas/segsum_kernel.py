"""Pallas sorted-segment-sum: the gradient-reduction hot op as MXU matmuls.

Replaces the XLA tail of ``ops/segsum._expand_bwd`` (blocked cumsum +
boundary fill + [M+1, D] -> [N, D] boundary row gather, ~35-55 ms in-graph
at M=2M/D=15/N=1M on v5e) with one kernel built on the only two things the
TPU does at speed of light: contiguous DMA and matmuls.

Formulation: with rows sorted by gaussian id, ``grad = S^T @ cts`` where S
is the [M, N] one-hot membership matrix.  Blocked over (output gaussians,
input rows), each [CHUNK] row chunk contributes
``cts_chunk [D, CHUNK] @ onehot [CHUNK, NB]`` to a [D, NB] accumulator —
an exact sum (no prefix-difference cancellation, unlike the cumsum
formulation it replaces).  Because the ids are sorted, output block i only
needs input rows [bounds[i], bounds[i+1]), computed XLA-side by a 2049-
query searchsorted; total chunk work is <= M/CHUNK + 2 * n_blocks
regardless of id skew.

Layout: the payload arrives TRANSPOSED [D_pad, M_pad] (minor dim = M:
lane-tileable, and chunk slices at 128-multiples are DMA-legal), with the
sorted gid riding as the last row *as float32* (exact for ids < 2^24) so
the kernel needs no separate integer operand.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_BLOCK = 512     # output gaussians per grid program
CHUNK = 1024      # input rows per inner iteration (multiple of 128)


def _kernel(bounds_ref, cts_hbm, out_ref, scratch, sem):
    i = pl.program_id(0)
    g_lo = i * N_BLOCK
    b0 = bounds_ref[i]
    b1 = bounds_ref[i + 1]
    c0 = (b0 // CHUNK) * CHUNK
    trips = jnp.maximum(pl.cdiv(b1 - c0, CHUNK), 1)

    d_pad = out_ref.shape[0]
    # int32 iota: Mosaic rejects float iota vectors (tpu.iota must be int).
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (N_BLOCK, CHUNK), 0)

    def body(t, acc):
        start = pl.multiple_of(c0 + t * CHUNK, CHUNK)
        dma = pltpu.make_async_copy(
            cts_hbm.at[:, pl.ds(start, CHUNK)], scratch, sem
        )
        dma.start()
        dma.wait()
        # gid row rides as f32 (exact < 2^24); compare in int32 (padding
        # id -1.0 casts to -1, never matching a block column).
        gid = scratch[d_pad - 1 : d_pad, :].astype(jnp.int32)  # [1, CHUNK]
        onehot = (col_ids + g_lo == gid).astype(jnp.float32)
        # [D_pad, CHUNK] @ [CHUNK, NB] contraction on the MXU, f32-exact.
        # HIGHEST: f32-accurate multi-pass bf16 on the MXU (Mosaic lowers only
        # DEFAULT|HIGHEST) — the default
        # single pass truncates the payload to bf16 (~1e-2 relative error
        # measured on hardware); the one-hot operand is exact either way.
        return acc + jax.lax.dot_general(
            scratch[:, :], onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    out_ref[:, :] = jax.lax.fori_loop(
        0, trips, body, jnp.zeros((d_pad, N_BLOCK), jnp.float32)
    )


@functools.partial(jax.jit, static_argnums=(2, 3))
def segment_sum_sorted(cts_t: jax.Array, bounds: jax.Array, n_pad: int,
                       interpret: bool = False):
    """Segment sums of gid-sorted rows.

    Args:
        cts_t: [D_pad, M_pad] f32; row ``D_pad - 1`` is the sorted gaussian
            id as float32 (< 2^24), padding columns carry id -1.  M_pad
            must be a multiple of CHUNK with >= CHUNK slack past the last
            real row.  D_pad must be a multiple of 8.
        bounds: [n_pad // N_BLOCK + 1] int32 row bounds per output block
            (``searchsorted(sidx, block_edges)``), clipped to
            ``M_pad - CHUNK``.
        n_pad: padded output rows (multiple of N_BLOCK).

    Returns:
        [D_pad, n_pad] f32 segment sums (last row = per-id row counts *
        id — discarded by the caller).
    """
    d_pad, m_pad = cts_t.shape
    assert m_pad % CHUNK == 0 and d_pad % 8 == 0 and n_pad % N_BLOCK == 0
    grid = (n_pad // N_BLOCK,)
    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (d_pad, N_BLOCK), lambda i, *_: (0, i),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((d_pad, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d_pad, n_pad), jnp.float32),
        interpret=interpret,
    )(bounds, cts_t)


def expand_bwd_pallas(n: int, idx: jax.Array, ct: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """Full ``expand_rows`` backward with the Pallas segment-sum tail.

    Same contract as ``ops.segsum._expand_bwd`` (which dispatches here on
    TPU): [M, D] cotangent rows + [M] indices -> [N, D] per-row sums.
    The payload sort is shared with the XLA path; everything after it
    (cumsum + boundary fill + boundary gather, ~35-55 ms in-graph) becomes
    one kernel (~4 ms) — and the sums are exact instead of
    prefix-difference approximate.
    """
    import os

    d = ct.shape[1]
    m = idx.shape[0]
    if os.environ.get("COLLAB_SPLATS_SEGSUM_SORT") == "gather":
        # A/B variant: 2-operand (idx, iota) sort + ONE [M, D] row gather.
        # The binning sort (2 int32 operands, same M) profiles at 3.2 ms
        # and row gathers at ~6 ns/row (g_full: 11.5 ms for 1.87M rows),
        # so this should land ~16 ms vs the 19.5 ms 16-operand payload
        # sort — but an earlier microbench note claimed ~50 ms for the
        # gather form; this flag exists to settle it in-graph.
        sidx, order = jax.lax.sort(
            (idx.astype(jnp.int32),
             jnp.arange(m, dtype=jnp.int32)), num_keys=1,
        )
        sorted_rows = ct[order]                         # [M, D] row gather
        sorted_cols = tuple(sorted_rows[:, j] for j in range(d))
    else:
        # One explicit [M, D] -> [D, M] transpose so every sort operand is
        # a contiguous row: with ct[:, j] column extractions the variadic
        # sort ran 19.5 ms in-graph vs its 7.6 ms microbench (strided
        # operand layouts).  The optimization barrier pins the transpose
        # as a real materialization — without it XLA fuses the transpose
        # back into each row extraction and the sort operands are strided
        # again (measured: the in-graph sort stayed at 19.5 ms despite
        # the .T).
        ct_t = jax.lax.optimization_barrier(ct.T)
        sorted_ops = jax.lax.sort(
            (idx.astype(jnp.int32),) + tuple(ct_t[j] for j in range(d)),
            num_keys=1,
        )
        sidx = sorted_ops[0]
        sorted_cols = sorted_ops[1:]
    d_pad = -(-(d + 1) // 8) * 8
    m_pad = (-(-m // CHUNK) + 1) * CHUNK
    pad_m = m_pad - m
    zero_row = jnp.zeros((m_pad,), jnp.float32)
    rows = [jnp.pad(r, (0, pad_m)) for r in sorted_cols]
    rows += [zero_row] * (d_pad - 1 - d)
    # gid row LAST (kernel reads scratch[d_pad - 1]); padding columns get
    # id -1 so they can never match an output block.
    rows.append(jnp.pad(sidx.astype(jnp.float32), (0, pad_m),
                        constant_values=-1.0))
    cts_t = jnp.stack(rows, axis=0)

    n_pad = -(-n // N_BLOCK) * N_BLOCK
    edges = (jnp.arange(n_pad // N_BLOCK + 1, dtype=jnp.int32) * N_BLOCK)
    bounds = jnp.searchsorted(sidx, edges, side="left").astype(jnp.int32)
    bounds = jnp.clip(bounds, 0, m_pad - CHUNK)
    grad_t = segment_sum_sorted(cts_t, bounds, n_pad, interpret)
    return grad_t[:d, :n].T
