"""Pallas run-length-decode binning expansion: slots -> (sort key, gid).

Replaces the XLA middle of ``ops/tiles.bin_gaussians`` — the seed
scatter-max (6.9 ms), the cummax forward-fill, and the ``packed[gid]``
[M, 10] row gather (12.9 ms) that together dominate binning at 1M
gaussians / 720p — with one kernel built on comparisons + one-hot MXU
matmuls (the same two primitives as ``segsum_kernel``).

Formulation: slot ``s`` of the intersection buffer belongs to the unique
gaussian ``g`` with ``offsets[g] <= s < ends[g]`` (``ends = offsets +
counts``; zero-count gaussians own nothing).  For a block of S slots the
owning gaussians span a window of rows bounded by two scalar-prefetched
``searchsorted`` results, so each grid program:

    1. DMAs GW-column slices of the [16, N] per-gaussian matrix,
    2. builds the ownership one-hot ``own[s, w] = (off_w <= s) & (end_w > s)``,
    3. contracts ``cols [16, GW] x own [S, GW] -> vals [16, S]`` on the MXU
       (HIGHEST: exact for one-hot x f32), gathering every per-gaussian
       field each slot needs in ONE matmul,
    4. computes the (tile << rank_bits | rank) sort key, the exact
       ellipse-tile cull (shares ``ops.tiles._min_sigma_rect``), and the
       gaussian id on the VPU, slot-per-lane.

All integer fields ride as f32 (exact below 2^24; ``bin_gaussians`` caps
``max_intersections`` at 2^24).  Total work is bounded: windows advance
monotonically with slots, so trips ~= N/GW + n_blocks regardless of how
counts are distributed.

Reference behavior being served: gsplat-rade's map_gaussian_to_intersects
CUDA kernel (SURVEY.md §2b N1) writes (tile|depth key, gid) pairs with
one thread per gaussian; this is the TPU-native equivalent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S_BLOCK = 2048    # slots per grid program (lane-major; multiple of 128)
GW = 512          # gaussian-window columns per inner trip (multiple of 128)

# Rows of the per-gaussian column matrix (f32, integers exact < 2^24).
C_OFF, C_END, C_NCOLS, C_TILE0, C_RANK, C_GIDX, C_ONE = 0, 1, 2, 3, 4, 5, 6
C_MU, C_MV, C_A, C_B, C_C, C_THR = 7, 8, 9, 10, 11, 12
C_ROWS = 16       # padded to a full sublane tile


def _exact_floor_div(num: jax.Array, den: jax.Array) -> jax.Array:
    """floor(num / den) for non-negative integer-valued f32 inputs.

    One f32 divide (which may land 1 ulp either side of an exact integer
    quotient) + two exact correction selects.
    """
    q = jnp.floor(num / jnp.maximum(den, 1.0))
    r = num - q * den
    q = jnp.where(r < 0.0, q - 1.0, q)
    r = num - q * den
    return jnp.where(r >= den, q + 1.0, q)


def _make_kernel(ntx: int, tile_size: int, rank_bits: int, num_tiles: int,
                 ellipse_cull: bool):
    from ..tiles import _min_sigma_rect

    sentinel = int(num_tiles << rank_bits)  # python int: a jnp scalar here
    # would be a captured tracer constant, which pallas_call rejects.

    def kernel(lo_ref, hi_ref, cols_hbm, out_ref, scratch, sem):
        i = pl.program_id(0)
        lo = lo_ref[i]
        trips = jnp.maximum(pl.cdiv(hi_ref[i] - lo, GW), 1)

        s0 = i * S_BLOCK
        # Slot ids as f32 (exact < 2^24), in both layouts the kernel needs
        # (two iotas — Mosaic rejects sublane<->lane reshapes).
        slot_f = (
            jax.lax.broadcasted_iota(jnp.int32, (1, S_BLOCK), 1) + s0
        ).astype(jnp.float32)                             # [1, S]
        slot_c = (
            jax.lax.broadcasted_iota(jnp.int32, (S_BLOCK, 1), 0) + s0
        ).astype(jnp.float32)                             # [S, 1]

        def body(t, acc):
            start = pl.multiple_of(lo + t * GW, GW)
            dma = pltpu.make_async_copy(
                cols_hbm.at[:, pl.ds(start, GW)], scratch, sem
            )
            dma.start()
            dma.wait()
            # own[s, w] = offsets_w <= s < ends_w  (one-hot over w).
            offs = scratch[C_OFF : C_OFF + 1, :]          # [1, GW]
            ends = scratch[C_END : C_END + 1, :]
            own = ((offs <= slot_c) & (ends > slot_c)).astype(jnp.float32)
            # cols [16, GW] x own [S, GW] -> [16, S]: every field the slot
            # needs, gathered by one MXU contraction (exact: one operand
            # is one-hot, HIGHEST keeps the f32 payload multi-pass).
            return acc + jax.lax.dot_general(
                scratch[:, :], own,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )

        vals = jax.lax.fori_loop(
            0, trips, body, jnp.zeros((C_ROWS, S_BLOCK), jnp.float32)
        )

        valid = vals[C_ONE : C_ONE + 1, :] > 0.5          # [1, S]
        local = slot_f - vals[C_OFF : C_OFF + 1, :]
        ncols = vals[C_NCOLS : C_NCOLS + 1, :]
        dy = _exact_floor_div(local, ncols)
        dx = local - dy * ncols
        tile_f = vals[C_TILE0 : C_TILE0 + 1, :] + dy * float(ntx) + dx
        tile_i = tile_f.astype(jnp.int32)
        key = tile_i * jnp.int32(1 << rank_bits) \
            + vals[C_RANK : C_RANK + 1, :].astype(jnp.int32)

        if ellipse_cull:
            ty = _exact_floor_div(tile_f, float(ntx))
            tx = (tile_f - ty * float(ntx)) * float(tile_size)
            ty = ty * float(tile_size)
            min_sig = _min_sigma_rect(
                vals[C_MU : C_MU + 1, :], vals[C_MV : C_MV + 1, :],
                vals[C_A : C_A + 1, :], vals[C_B : C_B + 1, :],
                vals[C_C : C_C + 1, :],
                tx, tx + float(tile_size), ty, ty + float(tile_size),
            )
            valid = valid & (min_sig <= vals[C_THR : C_THR + 1, :])

        key = jnp.where(valid, key, sentinel)
        gid = jnp.where(valid, vals[C_GIDX : C_GIDX + 1, :], 0.0) \
            .astype(jnp.int32)
        out_ref[0:1, :] = key
        out_ref[1:2, :] = gid
        out_ref[2:8, :] = jnp.zeros((6, S_BLOCK), jnp.int32)

    return kernel


@functools.partial(jax.jit,
                   static_argnums=(3, 4, 5, 6, 7, 8, 9))
def decode_bin_keys(cols: jax.Array, lo: jax.Array, hi: jax.Array,
                    m_blocks: int,
                    ntx: int, tile_size: int, rank_bits: int,
                    num_tiles: int, ellipse_cull: bool,
                    interpret: bool = False):
    """Expand the per-gaussian table into per-slot (sort key, gid).

    Args:
        cols: [16, N_pad] f32 per-gaussian fields in the ``C_*`` row layout
            (integers as exact f32; padding columns have off == end so they
            own nothing).  N_pad must be a multiple of GW.
        lo: [m_blocks] int32 gaussian-window starts per slot block,
            multiples of GW, <= N_pad - GW.
        hi: [m_blocks] int32 gaussian-window end bounds per slot block
            (cover the owner of the block's last slot), multiples of GW.
        m_blocks: number of S_BLOCK slot blocks.

    Returns:
        [m_blocks * 8, S_BLOCK] int32; per block, row 0 = sort key (invalid
        slots get ``num_tiles << rank_bits``), row 1 = gaussian id (0 where
        invalid), rows 2-7 zero padding (sublane-tile alignment).
    """
    n_pad = cols.shape[1]
    assert cols.shape[0] == C_ROWS and n_pad % GW == 0
    kernel = _make_kernel(ntx, tile_size, rank_bits, num_tiles,
                          ellipse_cull)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(m_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (8, S_BLOCK), lambda i, *_: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((C_ROWS, GW), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((m_blocks * 8, S_BLOCK), jnp.int32),
        interpret=interpret,
    )(lo, hi, cols)
