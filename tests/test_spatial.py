import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops import spatial as S


def test_spatial_subsample_one_per_cell():
    # 4 features in one cell, 1 in another; strongest survives per cell
    xy = jnp.asarray([[5.0, 5], [6, 6], [7, 7], [8, 8], [55, 55]])
    strength = jnp.asarray([1.0, 5.0, 3.0, 2.0, 1.0])
    valid = jnp.ones(5, bool)
    keep = S.spatial_subsample(xy, strength, valid, 40.0, 4, 4)
    np.testing.assert_array_equal(np.asarray(keep), [False, True, False, False, True])


def test_spatial_subsample_respects_valid():
    xy = jnp.asarray([[5.0, 5], [6, 6]])
    strength = jnp.asarray([9.0, 1.0])
    keep = S.spatial_subsample(xy, strength, jnp.asarray([False, True]), 40.0, 2, 2)
    np.testing.assert_array_equal(np.asarray(keep), [False, True])


def test_spatial_subsample_min_spacing_statistics():
    rng = np.random.default_rng(0)
    n = 500
    xy = jnp.asarray(rng.uniform(0, 1600, size=(n, 2)))
    strength = jnp.asarray(rng.uniform(0, 1, size=n))
    keep = S.spatial_subsample(xy, strength, jnp.ones(n, bool), 40.0, 40, 40)
    kept = np.asarray(xy)[np.asarray(keep)]
    # one feature per 40px cell -> same-cell duplicates eliminated
    cells = (kept // 40).astype(int)
    ids = cells[:, 0] * 1000 + cells[:, 1]
    assert len(np.unique(ids)) == len(ids)
    assert 100 < len(kept) <= 40 * 40


def test_nms_radius_suppresses_weaker_neighbor():
    xy = jnp.asarray([[100.0, 100], [104.0, 100], [100.0, 130]])
    strength = jnp.asarray([5.0, 4.0, 3.0])
    keep = S.nms_radius(xy, strength, jnp.ones(3, bool), 8.0, 32, 32)
    # feature 1 is 4px from stronger feature 0 -> suppressed; feature 2 is 30px away -> kept
    np.testing.assert_array_equal(np.asarray(keep), [True, False, True])


def test_nms_radius_cross_cell():
    # neighbors in adjacent cells still suppress
    xy = jnp.asarray([[15.9, 8.0], [16.1, 8.0]])
    strength = jnp.asarray([1.0, 2.0])
    keep = S.nms_radius(xy, strength, jnp.ones(2, bool), 8.0, 8, 8)
    np.testing.assert_array_equal(np.asarray(keep), [False, True])


def test_top_k_by_strength():
    strength = jnp.asarray([0.5, 0.9, 0.1, 0.7])
    valid = jnp.asarray([True, True, True, False])
    idx, mask = S.top_k_by_strength(strength, valid, 3)
    np.testing.assert_array_equal(np.asarray(idx), [1, 0, 2])
    assert np.asarray(mask).all()
    idx2, mask2 = S.top_k_by_strength(strength, jnp.asarray([True, False, False, False]), 3)
    assert np.asarray(mask2).tolist() == [True, False, False]
