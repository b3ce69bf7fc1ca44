"""Two-view geometric models: homography, essential, fundamental.

Batched, fixed-shape re-designs of the reference's model_inliers layer
(reference src/model_inliers/homography_model.cpp,
 essential_matrix_model.cpp, fundamental_matrix_model.cpp). All functions
take *homogeneous-normalized* 2d points (x/z, y/z of the unit rays the
distort layer produces) and vmap cleanly over leading hypothesis batches.

Design notes vs the reference:
* minimal fits are square solves / eigen problems — identical math;
* `fit_weighted` replaces `fitInliers`'s boolean row packing with a
  weighted least-squares over all (padded) correspondences, so the shapes
  stay static — an inlier mask is just a 0/1 weight vector;
* epipolar fits use a self-consistent x2' * M * x1 = 0 convention for both
  fit and error (the reference builds its design matrix in the transposed
  convention, see essential_matrix_model.cpp:57 vs :117 — here fit and
  scoring always agree);
* homography decomposition uses the Faugeras-Lustman SVD construction,
  which yields the same 4 physical (R, t, n) candidates as the
  Malis-Vargas method behind cv::decomposeHomographyMat used at
  homography_model.cpp:146.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencalibration_tpu.ops.quaternion import quat_from_matrix

HOMOGRAPHY_MIN_POINTS = 4  # reference homography_model.hpp:18
ESSENTIAL_MIN_POINTS = 5  # reference essential_matrix_model.hpp
FUNDAMENTAL_MIN_POINTS = 8  # reference fundamental_matrix_model.hpp
HOMOGRAPHY_INLIER_THRESHOLD = 0.005  # reference homography_model.hpp:31
ESSENTIAL_INLIER_THRESHOLD = 0.01  # reference essential_matrix_model.hpp:31
FUNDAMENTAL_INLIER_THRESHOLD = 0.01

_BIG = 1e30


def hnormalize(rays):
    """[..., 3] rays -> [..., 2] homogeneous-normalized points (x/z, y/z)."""
    return rays[..., :2] / rays[..., 2:3]


# ---------------------------------------------------------------------------
# Homography
# ---------------------------------------------------------------------------


def inv3(A):
    """Closed-form adjugate inverse of [..., 3, 3] matrices.

    TPU's batched LU (`jnp.linalg.inv` / `solve`) serializes pivot steps
    and costs ~100x more than this on tiny matrices (measured: 86k 9x9 LU
    solves = 415 ms on v5e, the entire RANSAC fit budget). Exact algebra,
    no approximation; singular inputs yield inf/nan, which downstream
    scoring already maps to _BIG via isfinite guards.
    """
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    c11 = e * i - f * h
    c21 = f * g - d * i
    c31 = d * h - e * g
    det = a * c11 + b * c21 + c * c31
    rows = jnp.stack(
        [
            jnp.stack([c11, c * h - b * i, b * f - c * e], axis=-1),
            jnp.stack([c21, a * i - c * g, c * d - a * f], axis=-1),
            jnp.stack([c31, b * g - a * h, a * e - b * d], axis=-1),
        ],
        axis=-2,
    )
    return rows / det[..., None, None]


def _canonical_transform(p):
    """[4, 2] points -> [3, 3] projective map taking the canonical basis
    (e1, e2, e3, [1,1,1]) to the 4 points: T = [l1*p1 | l2*p2 | l3*p3]
    with l = inv([p1 p2 p3]) p4 (the textbook fractional-linear
    construction)."""
    o = jnp.ones_like(p[..., :1])
    ph = jnp.concatenate([p, o], axis=-1)  # [4, 3]
    M = jnp.swapaxes(ph[..., :3, :], -1, -2)  # columns p1, p2, p3
    lam = inv3(M) @ ph[..., 3, :, None]  # [3, 1]
    return M * lam[..., 0][..., None, :]


def _homography_rows(p1, p2):
    """DLT rows for x2 ~ H x1 with h33 = 1 (reference homography_model.cpp:33-34).

    p1, p2: [N, 2]. Returns (P [2N, 9]).
    """
    x, y = p1[..., 0], p1[..., 1]
    xp, yp = p2[..., 0], p2[..., 1]
    z = jnp.zeros_like(x)
    o = jnp.ones_like(x)
    r1 = jnp.stack([-x, -y, -o, z, z, z, x * xp, y * xp, xp], axis=-1)
    r2 = jnp.stack([z, z, z, -x, -y, -o, x * yp, y * yp, yp], axis=-1)
    return jnp.concatenate([r1, r2], axis=-2)


def homography_fit(p1, p2):
    """Minimal 4-point homography (reference homography_model.cpp:19-50
    solves the same problem as a 9x9 DLT system; we use the closed-form
    canonical-frame construction H = T2 inv(T1), which is exact for the
    minimal problem and avoids TPU-hostile batched tiny LU solves)."""
    T1 = _canonical_transform(p1)
    T2 = _canonical_transform(p2)
    H = T2 @ inv3(T1)
    return H / H[2, 2]


def homography_fit_weighted(p1, p2, w):
    """Weighted least-squares refit over all correspondences (fitInliers
    equivalent, reference homography_model.cpp:52-87). w: [N] weights
    (0 for outliers/padding)."""
    P = _homography_rows(p1, p2)  # [2N, 9]
    # _homography_rows lays out [all x-rows; all y-rows] (block, not
    # interleaved), so the per-row weight vector is [w; w] — NOT repeat(w, 2),
    # which would misalign every weight with its correspondence.
    ww = jnp.concatenate([w, w], axis=-1)
    A = (P * ww[..., None]).T @ P  # [9, 9] normal equations
    constraint = jnp.zeros((9,), P.dtype).at[8].set(1.0)
    A = A + jnp.outer(constraint, constraint)
    rhs = constraint
    h = jnp.linalg.solve(A + 1e-12 * jnp.eye(9, dtype=P.dtype), rhs)
    H = h.reshape(3, 3)
    return H / H[2, 2]


def homography_error(H, p1, p2):
    """Symmetric transfer error, sqrt((fwd + bwd) / 2)
    (reference homography_model.cpp:89-97)."""
    Hinv = inv3(H)
    o = jnp.ones_like(p1[..., :1])
    h1 = jnp.concatenate([p1, o], axis=-1)
    h2 = jnp.concatenate([p2, o], axis=-1)
    f = h1 @ H.T
    b = h2 @ Hinv.T
    fwd = jnp.sum((f[..., :2] / f[..., 2:3] - p2) ** 2, axis=-1)
    bwd = jnp.sum((b[..., :2] / b[..., 2:3] - p1) ** 2, axis=-1)
    e2 = 0.5 * (fwd + bwd)
    e = jnp.sqrt(jnp.maximum(e2, 0.0))
    return jnp.where(jnp.isfinite(e), e, _BIG)


def homography_sample_degenerate(p1):
    """True if any 3 of the 4 sample points are collinear
    (reference homography_model.cpp:120-136). p1: [4, 2]."""
    combos = jnp.asarray(
        [(i, j, k) for i in range(4) for j in range(i + 1, 4) for k in range(j + 1, 4)]
    )
    a = p1[combos[:, 0]]
    v1 = p1[combos[:, 1]] - a
    v2 = p1[combos[:, 2]] - a
    cross = v1[:, 0] * v2[:, 1] - v1[:, 1] * v2[:, 0]
    return jnp.any(jnp.abs(cross) < 1e-10)


def homography_decompose(H):
    """Faugeras-Lustman SVD decomposition of a calibrated homography into 4
    candidate (R, t, n). Same candidate set as cv::decomposeHomographyMat
    (used by reference homography_model.cpp:138-185).

    Returns (R [4,3,3], t [4,3], n [4,3], valid [4]).
    """
    dtype = H.dtype
    U, d, Vt = jnp.linalg.svd(H)
    V = Vt.T
    d1, d2, d3 = d[0], d[1], d[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(V)

    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-30)
    x1 = jnp.sqrt(jnp.clip((d1 * d1 - d2 * d2) / denom, 0.0, 1.0))
    x3 = jnp.sqrt(jnp.clip((d2 * d2 - d3 * d3) / denom, 0.0, 1.0))

    degenerate = (d1 - d3) < 1e-9 * d1  # conjugate rotation: H/d2 is R, t=0

    def one_solution(e1, e3):
        sin_t = e1 * e3 * x1 * x3 * (d1 - d3) / d2
        cos_t = (d1 * x3 * x3 + d3 * x1 * x1) / d2
        norm = jnp.maximum(jnp.sqrt(sin_t * sin_t + cos_t * cos_t), 1e-30)
        sin_t, cos_t = sin_t / norm, cos_t / norm
        Rp = jnp.array(
            [
                [cos_t, 0.0 * sin_t, -sin_t],
                [0.0 * sin_t, 1.0 + 0.0 * sin_t, 0.0 * sin_t],
                [sin_t, 0.0 * sin_t, cos_t],
            ],
            dtype=dtype,
        )
        np_ = jnp.array([e1 * x1, 0.0, e3 * x3], dtype=dtype)
        tp = (d1 - d3) * jnp.array([e1 * x1, 0.0, -e3 * x3], dtype=dtype)
        R = s * U @ Rp @ Vt
        n = V @ np_
        t = U @ tp
        # degenerate fallback: pure rotation
        R = jnp.where(degenerate, s * H / d2, R)
        t = jnp.where(degenerate, jnp.zeros(3, dtype), t)
        n = jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0], dtype), n)
        # normalize t to a direction when nonzero
        tn = jnp.linalg.norm(t)
        t = jnp.where(tn > 1e-12, t / jnp.maximum(tn, 1e-30), t)
        return R, t, n

    Rs, ts, ns = [], [], []
    for e1, e3 in ((1.0, 1.0), (-1.0, -1.0), (1.0, -1.0), (-1.0, 1.0)):
        R, t, n = one_solution(jnp.asarray(e1, dtype), jnp.asarray(e3, dtype))
        Rs.append(R)
        ts.append(t)
        ns.append(n)
    valid = jnp.array([True, True, True, True]) & jnp.all(jnp.isfinite(H))
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ns), valid


def score_homography_poses(R, t, n, rays1, rays2, inlier_w):
    """Visibility scoring of decomposed poses: count inliers with
    n . m1 >= 0 and (R n) . m2 >= 0 (reference homography_model.cpp:159-176).

    R: [4,3,3], t/n: [4,3]; rays1/2: [N,3]; inlier_w: [N] 0/1.
    Returns scores [4] (float).
    """
    dot1 = jnp.einsum("kj,nj->kn", n, rays1)
    Rn = jnp.einsum("kij,kj->ki", R, n)
    dot2 = jnp.einsum("kj,nj->kn", Rn, rays2)
    ok = (dot1 >= 0) & (dot2 >= 0)
    return jnp.sum(ok * inlier_w[None, :], axis=1)


def poses_to_quaternions(R):
    """[K,3,3] -> [K,4] wxyz quaternions."""
    return jax.vmap(quat_from_matrix)(R)


# ---------------------------------------------------------------------------
# Epipolar models (essential / fundamental)
# ---------------------------------------------------------------------------


def _epipolar_rows(p1, p2):
    """Rows a s.t. a . vec(M) = x2h^T M x1h, vec row-major. [N, 9]."""
    x, y = p1[..., 0], p1[..., 1]
    xp, yp = p2[..., 0], p2[..., 1]
    o = jnp.ones_like(x)
    return jnp.stack(
        [xp * x, xp * y, xp, yp * x, yp * y, yp, x, y, o], axis=-1
    )


def _smallest_eigvec_9(AtA):
    """Eigenvector of the smallest eigenvalue of a symmetric 9x9."""
    w, v = jnp.linalg.eigh(AtA)
    return v[:, 0]


def _fit_epipolar(p1, p2, w, rank2_average: bool):
    """Weighted algebraic fit + manifold projection.

    rank2_average=True averages the two leading singular values (essential,
    reference essential_matrix_model.cpp:21-30); False only zeroes the last
    (fundamental, reference fundamental_matrix_model.cpp:24-28).
    """
    A = _epipolar_rows(p1, p2)  # [N, 9]
    AtA = (A * w[..., None]).T @ A
    m = _smallest_eigvec_9(AtA).reshape(3, 3)
    Um, dm, Vmt = jnp.linalg.svd(m)
    if rank2_average:
        avg = 0.5 * (dm[0] + dm[1])
        dnew = jnp.array([avg, avg, 0.0], dm.dtype)
    else:
        dnew = dm.at[2].set(0.0)
    return (Um * dnew[None, :]) @ Vmt


def essential_fit(p1, p2):
    w = jnp.ones(p1.shape[0], p1.dtype)
    return _fit_epipolar(p1, p2, w, rank2_average=True)


def essential_fit_weighted(p1, p2, w):
    return _fit_epipolar(p1, p2, w, rank2_average=True)


def fundamental_fit(p1, p2):
    w = jnp.ones(p1.shape[0], p1.dtype)
    return _fit_epipolar(p1, p2, w, rank2_average=False)


def fundamental_fit_weighted(p1, p2, w):
    return _fit_epipolar(p1, p2, w, rank2_average=False)


def epipolar_error(M, p1, p2):
    """Sampson-style epipolar distance, matching the form of
    reference essential_matrix_model.cpp:112-123 (self-consistent
    convention: fit and error both use x2h^T M x1h)."""
    o = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, o], axis=-1)
    x2 = jnp.concatenate([p2, o], axis=-1)
    Mx1 = x1 @ M.T  # [N, 3]
    Mtx2 = x2 @ M  # [N, 3]
    num = jnp.sum(x2 * Mx1, axis=-1)
    denom = (
        Mx1[..., 0] ** 2 + Mx1[..., 1] ** 2 + Mtx2[..., 0] ** 2 + Mtx2[..., 1] ** 2
    )
    e = jnp.sqrt(num * num / jnp.maximum(denom, 1e-20))
    e = jnp.where(denom < 1e-20, _BIG, e)
    return jnp.where(jnp.isfinite(e), e, _BIG)


def essential_decompose(E):
    """SVD decomposition into 4 (R, t) candidates
    (reference essential_matrix_model.cpp:125-153).
    Returns (R [4,3,3], t [4,3])."""
    U, _, Vt = jnp.linalg.svd(E)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    t = U[:, 2]
    R = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return R, ts
