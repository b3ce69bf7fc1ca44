"""RANSAC benchmark tests.

Synthetic scenes and asserted precision/recall bounds mirror the reference's
test/test_ransac_benchmark.cpp:182-301 (see BASELINE.md):
  homography clean 200pt: precision/recall >= 0.99, model err < 1e-6
  30% outliers: >= 0.90 / 0.85 ; 60%: >= 0.80 / 0.70 ; 80%: >= 0.70 / 0.60
"""

import jax.numpy as jnp
import numpy as np
import pytest

from opencalibration_tpu.ops import models as M
from opencalibration_tpu.ops import ransac as R
from opencalibration_tpu.ops.quaternion import quat_to_matrix


def rotz(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])


def roty(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def homography_scene(n_inliers, n_outliers, seed=0):
    """Reference test_ransac_benchmark.cpp:18-58."""
    rng = np.random.default_rng(seed)
    Rm = rotz(0.1)
    t = np.array([0.05, -0.03, 0.0])
    n = np.array([0.0, 0, 1])
    H = Rm + np.outer(t, n) / 10.0
    H /= H[2, 2]

    p1 = rng.uniform(-1, 1, size=(n_inliers, 2))
    h1 = np.concatenate([p1, np.ones((n_inliers, 1))], axis=1)
    h2 = h1 @ H.T
    h2 /= h2[:, 2:3]

    o1 = rng.uniform(-2, 2, size=(n_outliers, 2))
    o2 = rng.uniform(-2, 2, size=(n_outliers, 2))
    m1 = np.concatenate([h1, np.concatenate([o1, np.ones((n_outliers, 1))], 1)])
    m2 = np.concatenate([h2, np.concatenate([o2, np.ones((n_outliers, 1))], 1)])
    gt_inliers = np.concatenate(
        [np.ones(n_inliers, bool), np.zeros(n_outliers, bool)]
    )
    return H, m1, m2, gt_inliers


def fundamental_scene(n_inliers, n_outliers, planar_fraction=0.0, seed=0):
    """Reference test_ransac_benchmark.cpp:60-117."""
    rng = np.random.default_rng(seed)
    R2 = roty(0.15)
    t2 = np.array([0.5, 0.0, 0.0])
    e2 = R2 @ (-t2)
    e2x = np.array(
        [[0, -e2[2], e2[1]], [e2[2], 0, -e2[0]], [-e2[1], e2[0], 0]]
    )
    F = e2x @ R2
    F /= np.linalg.norm(F)

    n_planar = int(n_inliers * planar_fraction)
    m1, m2 = [], []
    for i in range(n_inliers):
        z = 10.0 if i < n_planar else rng.uniform(5, 15)
        X = np.array([rng.uniform(-3, 3), rng.uniform(-3, 3), z])
        x1 = X / X[2]
        x2 = R2 @ (X - t2)
        x2 = x2 / x2[2]
        m1.append(x1)
        m2.append(x2)
    for _ in range(n_outliers):
        m1.append(np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 1.0]))
        m2.append(np.array([rng.uniform(-1, 1), rng.uniform(-1, 1), 1.0]))
    gt_inliers = np.concatenate(
        [np.ones(n_inliers, bool), np.zeros(n_outliers, bool)]
    )
    return F, np.array(m1), np.array(m2), gt_inliers


def run_ransac(m1, m2, model_type, **kw):
    n = m1.shape[0]
    return R.ransac(
        jnp.asarray(m1),
        jnp.asarray(m2),
        jnp.zeros(n),
        jnp.ones(n, bool),
        model_type,
        **kw,
    )


def precision_recall(inliers, gt):
    inliers = np.asarray(inliers)
    tp = (inliers & gt).sum()
    fp = (inliers & ~gt).sum()
    fn = (~inliers & gt).sum()
    prec = tp / max(tp + fp, 1)
    rec = tp / max(tp + fn, 1)
    return prec, rec


def model_error(m, gt):
    m = np.asarray(m) / np.linalg.norm(m)
    gt = gt / np.linalg.norm(gt)
    return min(np.linalg.norm(m - gt), np.linalg.norm(m + gt))


def test_homography_clean():
    H, m1, m2, gt = homography_scene(200, 0)
    res = run_ransac(m1, m2, "homography")
    prec, rec = precision_recall(res.inliers, gt)
    assert prec >= 0.99 and rec >= 0.99
    assert model_error(res.model, H) < 1e-6


@pytest.mark.parametrize(
    "n_out,min_prec,min_rec",
    [(86, 0.90, 0.85), (300, 0.80, 0.70), (800, 0.70, 0.60)],
)
def test_homography_outliers(n_out, min_prec, min_rec):
    H, m1, m2, gt = homography_scene(200, n_out, seed=n_out)
    res = run_ransac(m1, m2, "homography")
    prec, rec = precision_recall(res.inliers, gt)
    assert prec >= min_prec, f"precision {prec}"
    assert rec >= min_rec, f"recall {rec}"


def test_homography_determinism():
    H, m1, m2, gt = homography_scene(100, 100, seed=7)
    r1 = run_ransac(m1, m2, "homography")
    r2 = run_ransac(m1, m2, "homography")
    np.testing.assert_array_equal(np.asarray(r1.model), np.asarray(r2.model))
    np.testing.assert_array_equal(np.asarray(r1.inliers), np.asarray(r2.inliers))


def test_homography_prosac_quality():
    # quality-sorted: inliers get good (low) quality -> PROSAC pools help
    H, m1, m2, gt = homography_scene(60, 240, seed=11)
    rng = np.random.default_rng(12)
    quality = np.where(gt, rng.uniform(0.1, 0.3, gt.size), rng.uniform(0.5, 0.9, gt.size))
    res = R.ransac(
        jnp.asarray(m1), jnp.asarray(m2), jnp.asarray(quality),
        jnp.ones(gt.size, bool), "homography",
    )
    prec, rec = precision_recall(res.inliers, gt)
    assert prec >= 0.9 and rec >= 0.9


def test_homography_padding_mask():
    H, m1, m2, gt = homography_scene(100, 20, seed=3)
    # pad with garbage rows marked invalid
    pad = 40
    m1p = np.concatenate([m1, np.full((pad, 3), 123.0)])
    m2p = np.concatenate([m2, np.full((pad, 3), -77.0)])
    valid = np.concatenate([np.ones(gt.size, bool), np.zeros(pad, bool)])
    res = R.ransac(
        jnp.asarray(m1p), jnp.asarray(m2p), jnp.zeros(valid.size),
        jnp.asarray(valid), "homography",
    )
    assert not np.asarray(res.inliers)[gt.size:].any()
    prec, rec = precision_recall(np.asarray(res.inliers)[: gt.size], gt)
    assert prec >= 0.99 and rec >= 0.99


def test_fundamental_clean():
    F, m1, m2, gt = fundamental_scene(200, 0)
    res = run_ransac(m1, m2, "fundamental")
    prec, rec = precision_recall(res.inliers, gt)
    assert prec >= 0.99 and rec >= 0.99
    assert model_error(res.model, F) < 1e-4


def test_fundamental_outliers():
    F, m1, m2, gt = fundamental_scene(200, 86, seed=21)
    res = run_ransac(m1, m2, "fundamental")
    prec, rec = precision_recall(res.inliers, gt)
    assert prec >= 0.90 and rec >= 0.85


def test_fundamental_degenerate_planar_scene():
    """Near-degenerate scene: 85% of inliers coplanar (reference
    test_ransac_benchmark.cpp:223-260 recovery assertion). DEGENSAC must
    still recover a model with reasonable precision/recall."""
    F, m1, m2, gt = fundamental_scene(200, 40, planar_fraction=0.85, seed=33)
    res = run_ransac(m1, m2, "fundamental")
    prec, rec = precision_recall(res.inliers, gt)
    assert prec >= 0.8, prec
    assert rec >= 0.6, rec


def test_essential_clean():
    F, m1, m2, gt = fundamental_scene(200, 0)
    res = run_ransac(m1, m2, "essential")
    prec, rec = precision_recall(res.inliers, gt)
    assert prec >= 0.99 and rec >= 0.99


def test_too_few_points():
    H, m1, m2, gt = homography_scene(3, 0)
    res = run_ransac(m1, m2, "homography")
    assert not np.asarray(res.inliers).any()
    assert float(res.score) == 0.0


def test_homography_decompose_recovers_pose():
    # H = R + t n^T / d built directly; decomposition must contain (R, t_dir)
    Rm = rotz(0.1) @ roty(0.05)
    t = np.array([0.05, -0.03, 0.01])
    n = np.array([0.0, 0.0, 1.0])
    H = Rm + np.outer(t, n) / 10.0
    Rs, ts, ns, valid = M.homography_decompose(jnp.asarray(H))
    t_dir = t / np.linalg.norm(t)
    best = min(
        min(
            np.linalg.norm(np.asarray(Rs[i]) - Rm)
            + np.linalg.norm(np.asarray(ts[i]) - s * t_dir)
            for s in (1, -1)
        )
        for i in range(4)
    )
    assert best < 1e-6


def test_homography_decompose_pure_rotation():
    Rm = rotz(0.2)
    Rs, ts, ns, valid = M.homography_decompose(jnp.asarray(Rm))
    found = min(np.linalg.norm(np.asarray(Rs[i]) - Rm) for i in range(4))
    assert found < 1e-6
    assert min(np.linalg.norm(np.asarray(ts[i])) for i in range(4)) < 1e-9


def test_essential_decompose_contains_truth():
    R2 = roty(0.15)
    t2 = np.array([0.5, 0.0, 0.0])
    # E = [t]_x R convention check: build E from scene and verify one candidate
    tx = np.array([[0, -t2[2], t2[1]], [t2[2], 0, -t2[0]], [-t2[1], t2[0], 0]])
    E = tx @ R2
    Rs, ts = M.essential_decompose(jnp.asarray(E))
    t_dir = t2 / np.linalg.norm(t2)
    bestR = min(np.linalg.norm(np.asarray(Rs[i]) - R2) for i in range(4))
    bestT = min(
        np.linalg.norm(np.asarray(ts[i]) - s * t_dir)
        for i in range(4)
        for s in (1, -1)
    )
    assert bestR < 1e-8 and bestT < 1e-8


def test_ransac_homography_with_poses():
    Hgt, m1, m2, gt = homography_scene(150, 50, seed=31)
    res, quats, ts, scores = R.ransac_homography_with_poses(
        jnp.asarray(m1), jnp.asarray(m2), jnp.zeros(gt.size), jnp.ones(gt.size, bool)
    )
    assert scores.shape == (4,)
    assert float(scores[0]) > 0  # best pose explains some inliers
    # best pose rotation should be close to the ground truth R (0.1 about z)
    Rbest = np.asarray(quat_to_matrix(quats[0]))
    assert np.linalg.norm(Rbest - rotz(0.1)) < 0.05


def test_homography_fit_weighted_mask_alignment():
    """Non-uniform 0/1 weights must zero out exactly the masked
    correspondences (regression: repeat(w,2) interleaved weights against the
    [x-rows; y-rows] block layout of _homography_rows, silently degrading
    every weighted refit)."""
    H, m1, m2, gt = homography_scene(120, 0, seed=3)
    p1 = m1[:, :2].copy()
    p2 = m2[:, :2].copy()
    # corrupt 40 correspondences and give them weight 0
    rng = np.random.default_rng(11)
    bad = rng.choice(120, 40, replace=False)
    p2[bad] += rng.uniform(1.0, 2.0, size=(40, 2))
    w = np.ones(120)
    w[bad] = 0.0
    Hfit = M.homography_fit_weighted(
        jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(w)
    )
    assert model_error(Hfit, H) < 1e-6, model_error(Hfit, H)
    # and the fitted model must reproject the kept points exactly
    err = np.asarray(M.homography_error(jnp.asarray(Hfit), jnp.asarray(p1), jnp.asarray(p2)))
    assert err[w == 1].max() < 1e-6
