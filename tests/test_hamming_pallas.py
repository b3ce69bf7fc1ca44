"""Fused Pallas Hamming kernel vs the XLA reference path (interpret mode
on CPU; the real kernel runs on TPU in bench/verification)."""

import jax.numpy as jnp
import numpy as np
import pytest

from opencalibration_tpu.ops import hamming as H
from opencalibration_tpu.ops.hamming_pallas import match_descriptors_pallas
from tests.test_hamming import random_descriptors


def run_both(b1, b2, v1=None, v2=None):
    p1, p2 = H.pack_bits(jnp.asarray(b1)), H.pack_bits(jnp.asarray(b2))
    v1 = jnp.ones(len(b1), bool) if v1 is None else jnp.asarray(v1)
    v2 = jnp.ones(len(b2), bool) if v2 is None else jnp.asarray(v2)
    ref = H.match_descriptors(p1, p2, v1, v2)
    pal = match_descriptors_pallas(p1, p2, v1, v2, interpret=True)
    return ref, pal


def test_pallas_matches_xla_path():
    b1 = random_descriptors(200, 1)
    b2 = random_descriptors(300, 2)
    (ri, rd, rm), (pi, pd, pm) = run_both(b1, b2)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(pm))
    np.testing.assert_array_equal(
        np.asarray(ri)[np.asarray(rm)], np.asarray(pi)[np.asarray(pm)]
    )
    np.testing.assert_allclose(
        np.asarray(rd)[np.asarray(rm)], np.asarray(pd)[np.asarray(pm)], atol=1e-6
    )


def test_pallas_respects_validity():
    b1 = random_descriptors(64, 3)
    b2 = np.concatenate([b1, random_descriptors(64, 4)])
    v2 = np.asarray([False] * 64 + [True] * 64)
    (ri, rd, rm), (pi, pd, pm) = run_both(b1, b2, v2=v2)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(pm))
    chosen = np.asarray(pi)[np.asarray(pm)]
    assert chosen.size == 0 or chosen.min() >= 64


def test_pallas_nonaligned_sizes():
    # sizes not multiples of the 128 tile exercise the padding path
    b1 = random_descriptors(130, 5)
    b2 = random_descriptors(257, 6)
    (ri, rd, rm), (pi, pd, pm) = run_both(b1, b2)
    np.testing.assert_array_equal(np.asarray(rm), np.asarray(pm))
    np.testing.assert_array_equal(
        np.asarray(ri)[np.asarray(rm)], np.asarray(pi)[np.asarray(pm)]
    )
