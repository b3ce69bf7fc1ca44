"""Fused Pallas TPU kernel: Hamming match with on-chip top-2 reduction.

The XLA path (ops.hamming.match_descriptors) materializes the full
[N1, N2] distance matrix in HBM before the top-2 scan — at production
sizes (4096 x 4096 per pair, hundreds of pairs in flight) that is pure
HBM bandwidth waste: the matrix is read exactly once.

This kernel tiles N1 over the grid and streams N2 through VMEM: each
[TILE_M, 512] x [512, TILE_N] block similarity runs on the MXU and its
top-2/argmin reduction happens in registers/VMEM before the next block
loads, so only the [N1] results ever leave the chip.

Masking: invalid set-2 descriptors carry a +BIG bias (bias vector rides
in VMEM); invalid set-1 rows are filtered by the caller.

Status: bit-exact with the XLA path on TPU hardware. Wall-clock on a
single 4096x4096 pair is currently ~0.8x of the XLA path (the fused
matmul XLA emits is already excellent at this size); the kernel's win is
memory — no [N1, N2] intermediate (67 MB/pair at 4096^2) — which matters
when many pairs run concurrently. Selected via OC_TPU_MATCH_BACKEND=pallas.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from opencalibration_tpu.ops.hamming import (
    DESCRIPTOR_BITS,
    LOWE_RATIO,
    _unpack_pm1,
)

TILE_M = 256
TILE_N = 512
_BIG = 1e9  # python float: jnp constants can't be captured by pallas kernels


def _match_kernel(a_ref, b_ref, bias_ref, best_ref, second_ref, idx_ref):
    """Grid dim 0 tiles set 1. a_ref: [TILE_M, 512] int8 (+-1/0),
    b_ref: [N2, 512] int8, bias_ref: [1, N2] f32 (0 valid, BIG invalid).
    Outputs per row of the tile: best/second distance (bits) + best index.
    """
    n2 = b_ref.shape[0]
    n_chunks = n2 // TILE_N

    a = a_ref[:]  # [TILE_M, 512] int8

    def body(c, carry):
        best, second, idx = carry
        b_blk = b_ref[pl.ds(c * TILE_N, TILE_N), :]
        sim = jax.lax.dot_general(
            a, b_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [TILE_M, TILE_N] int8 x int8 on the MXU
        d = 0.5 * (jnp.float32(DESCRIPTOR_BITS) - sim.astype(jnp.float32))
        d = d + bias_ref[0, pl.ds(c * TILE_N, TILE_N)][None, :]

        m1 = jnp.min(d, axis=1)
        am = jnp.argmin(d, axis=1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        d2 = jnp.where(cols == am[:, None], jnp.float32(_BIG), d)
        m2 = jnp.min(d2, axis=1)
        gidx = am + c * TILE_N

        # merge (m1, m2, gidx) into the running top-2
        new_best = jnp.minimum(best, m1)
        new_idx = jnp.where(m1 < best, gidx, idx)
        # second best = min of all distances except the new best's column:
        # candidates are old best/second and the chunk's m1/m2 minus winner
        cand_a = jnp.where(m1 < best, best, m1)  # loser of the best duel
        new_second = jnp.minimum(jnp.minimum(second, m2), cand_a)
        return new_best, new_second, new_idx

    init = (
        jnp.full((TILE_M,), jnp.float32(_BIG), jnp.float32),
        jnp.full((TILE_M,), jnp.float32(_BIG), jnp.float32),
        jnp.zeros((TILE_M,), jnp.int32),
    )
    best, second, idx = jax.lax.fori_loop(0, n_chunks, body, init)
    row = pl.program_id(0)
    best_ref[row, :] = best
    second_ref[row, :] = second
    idx_ref[row, :] = idx


def _pad_to(x, n, axis=0, fill=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    shape = list(x.shape)
    shape[axis] = pad
    return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=axis)


@functools.partial(jax.jit, static_argnames=("ratio", "interpret"))
def match_descriptors_pallas(
    packed1, packed2, valid1, valid2, ratio: float = LOWE_RATIO,
    interpret: bool = False,
):
    """Drop-in equivalent of ops.hamming.match_descriptors backed by the
    fused kernel. Returns (idx2 [N1] int32, distance [N1] f32 normalized,
    matched [N1] bool)."""
    n1, n2 = packed1.shape[0], packed2.shape[0]
    n1p = ((n1 + TILE_M - 1) // TILE_M) * TILE_M
    n2p = ((n2 + TILE_N - 1) // TILE_N) * TILE_N

    a = _pad_to(_unpack_pm1(packed1, DESCRIPTOR_BITS), n1p)
    b = _pad_to(_unpack_pm1(packed2, DESCRIPTOR_BITS), n2p)
    bias = jnp.where(_pad_to(valid2, n2p, fill=False), 0.0, _BIG).astype(jnp.float32)[None, :]

    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=(n1p // TILE_M,),
        in_specs=[
            pl.BlockSpec((TILE_M, a.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # full-array outputs, one row written per grid step: 2-d with a
            # 128-lane last dim keeps Mosaic and XLA layouts agreed (1-d
            # f32 outputs and (1, 128) blocks both trip layout checks)
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n1p // TILE_M, TILE_M), jnp.float32),
            jax.ShapeDtypeStruct((n1p // TILE_M, TILE_M), jnp.float32),
            jax.ShapeDtypeStruct((n1p // TILE_M, TILE_M), jnp.int32),
        ),
        interpret=interpret,
    )(a, b, bias)

    best = best.reshape(-1)[:n1]
    second = second.reshape(-1)[:n1]
    idx = idx.reshape(-1)[:n1]
    distance = best / jnp.float32(DESCRIPTOR_BITS)
    second_n = second / jnp.float32(DESCRIPTOR_BITS)
    matched = valid1 & (best < _BIG) & (distance < jnp.float32(ratio) * second_n)
    return idx, distance, matched
