import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops import hamming as H


def random_descriptors(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=(n, H.DESCRIPTOR_BITS)).astype(bool)


def test_pack_unpack_roundtrip():
    bits = random_descriptors(10)
    packed = H.pack_bits(jnp.asarray(bits))
    assert packed.shape == (10, H.DESCRIPTOR_WORDS)
    rec = H.unpack_bits(packed)
    np.testing.assert_array_equal(np.asarray(rec), bits)


def test_hamming_matrix_mxu_equals_popcount_equals_numpy():
    b1 = random_descriptors(33, 1)
    b2 = random_descriptors(47, 2)
    expected = (b1[:, None, :] != b2[None, :, :]).sum(-1)
    p1, p2 = H.pack_bits(jnp.asarray(b1)), H.pack_bits(jnp.asarray(b2))
    mxu = H.hamming_matrix(p1, p2)
    pop = H.hamming_matrix_popcount(p1, p2)
    np.testing.assert_array_equal(np.asarray(mxu), expected)
    np.testing.assert_array_equal(np.asarray(pop), expected)


def test_match_descriptors_ratio_test():
    rng = np.random.default_rng(3)
    base = random_descriptors(20, 4)
    # set2 = noisy copies of set1 (flip 20 bits) + 20 random distractors
    noisy = base.copy()
    for i in range(20):
        idx = rng.choice(H.DESCRIPTOR_BITS, size=20, replace=False)
        noisy[i, idx] = ~noisy[i, idx]
    distract = random_descriptors(20, 5)
    set2 = np.concatenate([noisy, distract])

    p1 = H.pack_bits(jnp.asarray(base))
    p2 = H.pack_bits(jnp.asarray(set2))
    v1 = jnp.ones(20, bool)
    v2 = jnp.ones(40, bool)
    idx2, dist, matched = H.match_descriptors(p1, p2, v1, v2)

    assert np.asarray(matched).all()
    np.testing.assert_array_equal(np.asarray(idx2), np.arange(20))
    np.testing.assert_allclose(np.asarray(dist), 20 / H.DESCRIPTOR_BITS, atol=1e-6)


def test_match_respects_validity_masks():
    b1 = random_descriptors(8, 6)
    b2 = np.concatenate([b1, random_descriptors(8, 7)])
    p1, p2 = H.pack_bits(jnp.asarray(b1)), H.pack_bits(jnp.asarray(b2))
    v1 = jnp.asarray([True] * 4 + [False] * 4)
    # hide the exact duplicates in set2 -> matches must go elsewhere or fail
    v2 = jnp.asarray([False] * 8 + [True] * 8)
    idx2, dist, matched = H.match_descriptors(p1, p2, v1, v2)
    assert not np.asarray(matched)[4:].any()  # invalid rows never match
    chosen = np.asarray(idx2)[np.asarray(matched)]
    assert chosen.size == 0 or chosen.min() >= 8  # only valid cols ever chosen


def test_identical_descriptors_rejected_by_ratio():
    # two identical candidates -> best == second best -> ratio test fails
    b1 = random_descriptors(1, 8)
    set2 = np.concatenate([b1, b1])
    p1, p2 = H.pack_bits(jnp.asarray(b1)), H.pack_bits(jnp.asarray(set2))
    _, _, matched = H.match_descriptors(p1, p2, jnp.ones(1, bool), jnp.ones(2, bool))
    assert not bool(matched[0])


def test_sort_matches_descending():
    dist = jnp.asarray([0.1, 0.5, 0.3, 0.2])
    matched = jnp.asarray([True, True, False, True])
    order = H.sort_matches_descending(None, None, dist, matched)
    ordered = np.asarray(dist)[np.asarray(order)]
    m_ordered = np.asarray(matched)[np.asarray(order)]
    assert list(ordered[:3]) == [0.5, 0.2, 0.1]
    assert not m_ordered[3]
