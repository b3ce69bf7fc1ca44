"""Binary-descriptor Hamming matching as MXU matmuls.

TPU-native re-design of the reference's brute-force XOR+POPCNT matcher
(reference src/match/match_features.cpp:54-103): instead of a scalar loop
over std::bitset pairs, descriptors are unpacked to {-1, +1} int8 vectors and
the full N1 x N2 Hamming-distance matrix is one int8 matmul on the MXU:

    sim[i, j]     = sum_b a[i, b] * b[j, b]        (= BITS - 2 * hamming)
    hamming[i, j] = (BITS - sim[i, j]) / 2

Padding bits are encoded as 0 so they contribute nothing to the similarity.
The Lowe ratio test (0.8, match_features.cpp:94) runs as a masked top-2 over
rows of the distance matrix.

Descriptors are 486-bit AKAZE-MLDB-compatible bitstrings
(reference include/opencalibration/types/feature_2d.hpp:11) stored packed as
uint32 words, padded to 512 bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DESCRIPTOR_BITS = 486  # reference types/feature_2d.hpp:11
WORD_BITS = 32
DESCRIPTOR_WORDS = (DESCRIPTOR_BITS + WORD_BITS - 1) // WORD_BITS  # 16
PADDED_BITS = DESCRIPTOR_WORDS * WORD_BITS  # 512
LOWE_RATIO = 0.8  # reference match_features.cpp:94


def pack_bits(bits) -> jnp.ndarray:
    """Pack boolean [..., BITS] (bit k = word k//32, bit k%32) into uint32 words."""
    bits = jnp.asarray(bits, jnp.uint32)
    n_bits = bits.shape[-1]
    n_words = (n_bits + WORD_BITS - 1) // WORD_BITS
    pad = n_words * WORD_BITS - n_bits
    if pad:
        bits = jnp.concatenate(
            [bits, jnp.zeros(bits.shape[:-1] + (pad,), jnp.uint32)], axis=-1
        )
    bits = bits.reshape(bits.shape[:-1] + (n_words, WORD_BITS))
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    return jnp.sum(bits << shifts, axis=-1, dtype=jnp.uint32)


def unpack_bits(packed, n_bits: int = DESCRIPTOR_BITS) -> jnp.ndarray:
    """uint32 words [..., W] -> boolean [..., n_bits]."""
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    bits = (packed[..., None] >> shifts) & jnp.uint32(1)
    flat = bits.reshape(packed.shape[:-1] + (packed.shape[-1] * WORD_BITS,))
    return flat[..., :n_bits].astype(jnp.bool_)


def _unpack_pm1(packed, n_bits: int) -> jnp.ndarray:
    """uint32 words -> int8 {-1, +1} for real bits, 0 for padding bits."""
    shifts = jnp.arange(WORD_BITS, dtype=jnp.uint32)
    bits = ((packed[..., None] >> shifts) & jnp.uint32(1)).astype(jnp.int8)
    pm1 = bits * jnp.int8(2) - jnp.int8(1)
    flat = pm1.reshape(packed.shape[:-1] + (packed.shape[-1] * WORD_BITS,))
    total = packed.shape[-1] * WORD_BITS
    if n_bits < total:
        mask = (jnp.arange(total) < n_bits).astype(jnp.int8)
        flat = flat * mask
    return flat


def hamming_matrix(packed1, packed2, n_bits: int = DESCRIPTOR_BITS) -> jnp.ndarray:
    """Full Hamming-distance matrix [N1, N2] (int32) via MXU int8 matmul."""
    a = _unpack_pm1(packed1, n_bits)
    b = _unpack_pm1(packed2, n_bits)
    sim = jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (jnp.int32(n_bits) - sim) >> 1


def hamming_matrix_popcount(packed1, packed2) -> jnp.ndarray:
    """Reference-style XOR+popcount distance matrix (for validation and
    small problems; the MXU path above is the production kernel)."""
    x = packed1[:, None, :] ^ packed2[None, :, :]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def match_descriptors(packed1, packed2, valid1, valid2, ratio: float = LOWE_RATIO):
    """Dispatches to the fused Pallas kernel when OC_TPU_MATCH_BACKEND=
    pallas (see ops.hamming_pallas), else the XLA path below."""
    import os

    if os.environ.get("OC_TPU_MATCH_BACKEND") == "pallas":
        from opencalibration_tpu.ops.hamming_pallas import match_descriptors_pallas

        interpret = jax.default_backend() != "tpu"
        return match_descriptors_pallas(
            packed1, packed2, valid1, valid2, ratio, interpret=interpret
        )
    return _match_descriptors_xla(packed1, packed2, valid1, valid2, ratio)


@functools.partial(jax.jit, static_argnames=("ratio",))
def _match_descriptors_xla(
    packed1,
    packed2,
    valid1,
    valid2,
    ratio: float = LOWE_RATIO,
):
    """Mutual-best-free one-way matching with Lowe ratio test.

    The batched equivalent of reference match_features.cpp:54-98: for each
    valid descriptor in set 1, find the two nearest valid descriptors in set
    2; keep the best if best < ratio * second_best.

    Args:
      packed1: [N1, W] uint32, packed2: [N2, W] uint32
      valid1: [N1] bool, valid2: [N2] bool (padding masks)
    Returns:
      idx2: [N1] int32 best match index into set 2
      distance: [N1] float32 normalized Hamming distance (bits / 486)
      matched: [N1] bool — passed validity + ratio test
    """
    n1 = packed1.shape[0]
    dist = hamming_matrix(packed1, packed2)  # [N1, N2] int32
    big = jnp.int32(2 * PADDED_BITS)
    dist = jnp.where(valid2[None, :], dist, big)

    best = jnp.min(dist, axis=1)
    idx2 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    # mask out the best column per row, then take the second minimum
    cols = jnp.arange(dist.shape[1], dtype=jnp.int32)
    dist2 = jnp.where(cols[None, :] == idx2[:, None], big, dist)
    second = jnp.min(dist2, axis=1)

    distance = best.astype(jnp.float32) / jnp.float32(DESCRIPTOR_BITS)
    second_f = second.astype(jnp.float32) / jnp.float32(DESCRIPTOR_BITS)
    matched = (
        valid1
        & (best < big)
        & (distance < jnp.float32(ratio) * second_f)
    )
    return idx2, distance, matched


def sort_matches_descending(idx1, idx2, distance, matched):
    """Deterministic ordering: descending distance, as the reference sorts
    its match list (match_features.cpp:100-102). Invalid entries sort last.

    Returns permutation indices [N1] to apply to the match arrays.
    """
    key = jnp.where(matched, distance, -jnp.inf)
    order = jnp.argsort(-key, stable=True)
    return order
