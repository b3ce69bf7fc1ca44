import numpy as np

from opencalibration_tpu.ops.clustering import (
    connected_components,
    kmeans,
    spectral_cluster,
)


def test_kmeans_separates_blobs():
    rng = np.random.default_rng(0)
    a = rng.normal(0, 0.1, (30, 2))
    b = rng.normal(5, 0.1, (30, 2)) + [5, 0]
    labels = kmeans(np.concatenate([a, b]), 2)
    assert len(set(labels[:30])) == 1
    assert len(set(labels[30:])) == 1
    assert labels[0] != labels[30]


def test_kmeans_deterministic():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(100, 2))
    np.testing.assert_array_equal(kmeans(pts, 5), kmeans(pts, 5))


def test_connected_components():
    labels = connected_components(6, [(0, 1), (1, 2), (3, 4)])
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert len({labels[0], labels[3], labels[5]}) == 3


def test_spectral_cluster_grid():
    # 2 chain components, each must be split into ~size-10 clusters
    n = 40
    edges = [(i, i + 1) for i in range(19)] + [(i, i + 1) for i in range(20, 39)]
    w = [1.0] * len(edges)
    pts = np.stack([np.arange(n, dtype=float), np.zeros(n)], axis=1)
    pts[20:, 1] = 100.0
    labels = spectral_cluster(n, edges, w, pts, max_cluster_size=10)
    # no cluster spans the two components
    assert set(labels[:20]).isdisjoint(set(labels[20:]))
    # cluster sizes bounded
    for lab in set(labels):
        assert (labels == lab).sum() <= 20


def test_spectral_cluster_single_group():
    pts = np.random.default_rng(2).normal(size=(8, 2))
    labels = spectral_cluster(8, [(i, i + 1) for i in range(7)], [1.0] * 7, pts, 50)
    assert len(set(labels)) == 1
