"""Batched-hypothesis RANSAC with PROSAC-style quality growth.

TPU-native re-design of the reference's sequential PROSAC+SPRT engine
(reference src/model_inliers/ransac.cpp:53-257). The *output contract* is
preserved — deterministic fixed-seed runs, MSAC scoring 1-(e/t)^2, PROSAC
quality-biased sampling, iterative inlier refits, the same inlier sets on
the benchmark scenes within tolerance — but the control flow is re-shaped
for XLA:

* instead of up to 10000 sequential iterations with early exit, K
  hypotheses are sampled, fitted and scored **in parallel** (vmapped
  9x9 solves / eigendecompositions + one [K, N] error matrix);
* SPRT early rejection is unnecessary — scoring a hypothesis is one
  row of a batched matmul-shaped computation, not a serial loop;
* the adaptive iteration count (ransac.cpp:247-251) is replaced by a
  static hypothesis budget chosen >= the reference's worst-case need;
* PROSAC's growing sample pool (ransac.cpp:130-154) maps to a per-
  hypothesis pool size schedule: hypothesis k samples uniformly from the
  best `pool_size(k)` correspondences by quality (Gumbel top-k sampling
  without replacement);
* the inner refit loop (ransac.cpp:224-245, MAX_INNER_ITERATIONS=5) is a
  fixed-length scan of weighted least-squares refits with accept-if-better.

Everything is masked: padded correspondences carry valid=False and never
contribute to fits or scores.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from opencalibration_tpu.ops import models as M

DEFAULT_SEED = 42  # reference ransac.cpp:98
MAX_INNER_ITERATIONS = 5  # reference ransac.cpp:59
DEFAULT_HYPOTHESES = 4096
_POOL_GROWTH_PERIOD = 4  # grow quality pool by 1 every k hypotheses


class RansacResult(NamedTuple):
    model: jnp.ndarray  # [3, 3]
    inliers: jnp.ndarray  # [N] bool
    score: jnp.ndarray  # scalar: best MSAC score / N_valid (reference returns score/matches.size())


class _ModelDef(NamedTuple):
    min_points: int
    threshold: float
    fit: callable
    fit_weighted: callable
    error: callable
    sample_degenerate: callable | None


_MODELS = {
    "homography": _ModelDef(
        M.HOMOGRAPHY_MIN_POINTS,
        M.HOMOGRAPHY_INLIER_THRESHOLD,
        M.homography_fit,
        M.homography_fit_weighted,
        M.homography_error,
        M.homography_sample_degenerate,
    ),
    "essential": _ModelDef(
        M.ESSENTIAL_MIN_POINTS,
        M.ESSENTIAL_INLIER_THRESHOLD,
        lambda p1, p2: M.essential_fit(p1, p2),
        M.essential_fit_weighted,
        M.epipolar_error,
        None,
    ),
    "fundamental": _ModelDef(
        M.FUNDAMENTAL_MIN_POINTS,
        M.FUNDAMENTAL_INLIER_THRESHOLD,
        lambda p1, p2: M.fundamental_fit(p1, p2),
        M.fundamental_fit_weighted,
        M.epipolar_error,
        None,
    ),
}


def _msac_score(err, threshold, valid):
    """MSAC per-correspondence score 1-(e/t)^2 for inliers, 0 otherwise
    (reference ransac.cpp:190-195)."""
    ratio = err / threshold
    inlier = (err < threshold) & valid
    return jnp.where(inlier, 1.0 - ratio * ratio, 0.0), inlier


def _sample_hypotheses(key, quality, valid, n_hyp, min_points, has_quality):
    """Sample [n_hyp, min_points] correspondence indices.

    PROSAC semantics: correspondences sorted by quality ascending (lower =
    better, as reference ransac.cpp:88-89); hypothesis k draws without
    replacement from the best pool_size(k), where pool_size grows linearly
    with k. Without quality, draws are uniform over all valid entries.

    Exact uniform sampling without replacement via order statistics: the
    i-th draw picks a rank in [0, pool-i) and is bumped past each smaller
    previously-drawn rank (ascending). O(n_hyp * min_points) work on [K]
    vectors — the earlier Gumbel-top-k formulation materialized a
    [n_hyp, N] noise matrix and full-sorted every row to take 4 entries,
    the single largest cost inside RANSAC on TPU.
    """
    n_valid = jnp.sum(valid)
    # invalid entries sort last, so ranks < pool <= n_valid are all valid
    order = jnp.argsort(jnp.where(valid, quality, jnp.inf), stable=True)

    k_idx = jnp.arange(n_hyp)
    pool = jnp.minimum(
        min_points + k_idx // _POOL_GROWTH_PERIOD, n_valid
    )  # [n_hyp]
    pool = jnp.maximum(pool, jnp.minimum(min_points, n_valid))
    pool = jnp.where(has_quality, pool, n_valid).astype(jnp.int32)

    u = jax.random.uniform(key, (n_hyp, min_points))
    picks = []
    for i in range(min_points):
        m = jnp.maximum(pool - i, 1)
        d = jnp.minimum((u[:, i] * m).astype(jnp.int32), m - 1)
        if picks:
            prev = jnp.sort(jnp.stack(picks, axis=1), axis=1)
            for j in range(prev.shape[1]):
                d = d + (d >= prev[:, j]).astype(jnp.int32)
        picks.append(d)
    # n_valid < min_points duplicates ranks; the feasibility gate in
    # ransac() already voids the result in that case
    return order[jnp.stack(picks, axis=1)]  # [n_hyp, min_points]


def _fundamental_degensac(F, score, inliers, p1, p2, valid, threshold):
    """Plane-degeneracy recovery: fit a homography to the first 4 F-inliers
    (2x threshold); if >= 70% of F-inliers are H-inliers, estimate the
    epipole from the off-plane points and test F = [e']_x H."""
    dtype = p1.dtype
    n = p1.shape[0]
    h_threshold = 2.0 * threshold

    n_inl = jnp.sum(inliers)
    # first 4 inlier indices (stable order like the reference's loop)
    order = jnp.argsort(~inliers, stable=True)
    h_idx = order[:4]
    H = M.homography_fit(p1[h_idx], p2[h_idx])
    h_err = M.homography_error(H, p1, p2)
    h_inl = inliers & (h_err < h_threshold)
    h_ratio = jnp.sum(h_inl) / jnp.maximum(n_inl, 1)

    # refit H on its inliers, reclassify
    H2 = M.homography_fit_weighted(p1, p2, h_inl.astype(dtype))
    h_err2 = M.homography_error(H2, p1, p2)
    h_inl2 = inliers & (h_err2 < h_threshold)
    off_plane = inliers & ~h_inl2
    n_off = jnp.sum(off_plane)

    # epipole from off-plane points: rows x2 x (H x1), smallest right
    # singular vector (masked rows zeroed)
    o = jnp.ones_like(p1[..., :1])
    x1 = jnp.concatenate([p1, o], axis=-1)
    x2 = jnp.concatenate([p2, o], axis=-1)
    Hx1 = x1 @ H2.T
    rows = jnp.cross(x2, Hx1) * off_plane[:, None].astype(dtype)
    AtA = rows.T @ rows
    _, vecs = jnp.linalg.eigh(AtA)
    e = vecs[:, 0]
    e_cross = jnp.array(
        [[0.0, -e[2], e[1]], [e[2], 0.0, -e[0]], [-e[1], e[0], 0.0]], dtype
    )
    F_cand = e_cross @ H2
    Uf, df, Vft = jnp.linalg.svd(F_cand)
    F_cand = (Uf * df.at[2].set(0.0)[None, :]) @ Vft

    cand_err = M.epipolar_error(F_cand, p1, p2)
    cand_per, cand_inl = _msac_score(cand_err, threshold, valid)
    cand_score = jnp.sum(cand_per)

    use = (
        (n_inl >= 4) & (h_ratio >= 0.7) & (n_off >= 2)
        & jnp.isfinite(cand_score) & (cand_score > score)
        & jnp.all(jnp.isfinite(F_cand))
    )
    F_out = jnp.where(use, F_cand, F)
    score_out = jnp.where(use, cand_score, score)
    inl_out = jnp.where(use, cand_inl, inliers)
    return F_out, score_out, inl_out


@functools.partial(
    jax.jit, static_argnames=("model_type", "num_hypotheses", "seed")
)
def ransac(
    rays1,
    rays2,
    quality,
    valid,
    model_type: str,
    num_hypotheses: int = DEFAULT_HYPOTHESES,
    seed: int = DEFAULT_SEED,
) -> RansacResult:
    """Robust two-view model fit over padded correspondence arrays.

    Args:
      rays1, rays2: [N, 3] unit rays (correspondence.measurement1/2).
      quality: [N] match quality, lower is better; all-zero disables PROSAC
        (reference ransac.cpp:72-79).
      valid: [N] bool padding mask.
      model_type: "homography" | "essential" | "fundamental".
    """
    mdef = _MODELS[model_type]
    dtype = rays1.dtype
    n = rays1.shape[0]

    if n < mdef.min_points:  # static shape too small to ever fit a model
        return RansacResult(
            jnp.full((3, 3), jnp.nan, dtype),
            jnp.zeros(n, bool),
            jnp.zeros((), dtype),
        )

    p1 = M.hnormalize(rays1)
    p2 = M.hnormalize(rays2)
    has_quality = jnp.any(quality != 0)

    key = jax.random.PRNGKey(seed)
    samples = _sample_hypotheses(
        key, quality, valid, num_hypotheses, mdef.min_points, has_quality
    )  # [K, S]

    sp1 = p1[samples]  # [K, S, 2]
    sp2 = p2[samples]

    hyps = jax.vmap(mdef.fit)(sp1, sp2)  # [K, 3, 3]
    if mdef.sample_degenerate is not None:
        degenerate = jax.vmap(mdef.sample_degenerate)(sp1)
    else:
        degenerate = jnp.zeros(num_hypotheses, bool)
    # enough distinct valid points in the sample?
    n_valid = jnp.sum(valid)
    feasible = n_valid >= mdef.min_points

    errs = jax.vmap(lambda h: mdef.error(h, p1, p2))(hyps)  # [K, N]
    scores_per, _ = _msac_score(errs, mdef.threshold, valid[None, :])
    scores = jnp.sum(scores_per, axis=1)
    scores = jnp.where(degenerate | ~jnp.all(jnp.isfinite(hyps), axis=(1, 2)), -1.0, scores)

    best_k = jnp.argmax(scores)
    best_model = hyps[best_k]
    best_score = scores[best_k]
    best_err = mdef.error(best_model, p1, p2)
    _, best_inliers = _msac_score(best_err, mdef.threshold, valid)

    # iterative refit on inliers, accept-if-better (reference ransac.cpp:224-245)
    def refit_step(carry, _):
        model, score, inliers = carry
        w = inliers.astype(dtype)
        cand = mdef.fit_weighted(p1, p2, w)
        cand_err = mdef.error(cand, p1, p2)
        cand_per, cand_inl = _msac_score(cand_err, mdef.threshold, valid)
        cand_score = jnp.sum(cand_per)
        better = jnp.isfinite(cand_score) & (cand_score > score) & jnp.all(jnp.isfinite(cand))
        model = jnp.where(better, cand, model)
        score = jnp.where(better, cand_score, score)
        inliers = jnp.where(better, cand_inl, inliers)
        return (model, score, inliers), None

    (best_model, best_score, best_inliers), _ = jax.lax.scan(
        refit_step,
        (best_model, best_score, best_inliers),
        None,
        length=MAX_INNER_ITERATIONS,
    )

    if model_type == "fundamental":
        # DEGENSAC: if F-inliers are plane-dominated, recover F = [e']_x H
        # (reference fundamental_matrix_model.cpp:123-215)
        best_model, best_score, best_inliers = _fundamental_degensac(
            best_model, best_score, best_inliers, p1, p2, valid, mdef.threshold
        )

    ok = feasible & (best_score > 0)
    nan_model = jnp.full((3, 3), jnp.nan, dtype)
    final_model = jnp.where(ok, best_model, nan_model)
    final_inliers = best_inliers & ok
    denom = jnp.maximum(n_valid.astype(dtype), 1.0)
    final_score = jnp.where(ok, best_score, 0.0) / denom
    return RansacResult(final_model, final_inliers, final_score)


def ransac_homography_with_poses(
    rays1, rays2, quality, valid, num_hypotheses: int = DEFAULT_HYPOTHESES, seed: int = DEFAULT_SEED
):
    """RANSAC homography + pose decomposition, the full LinkStage compute
    (reference src/pipeline/link_stage.cpp:75-112): returns the model,
    inliers, and 4 scored relative-pose candidates sorted by score.
    """
    res = ransac(rays1, rays2, quality, valid, "homography", num_hypotheses, seed)
    R, t, nrm, _ = M.homography_decompose(res.model)
    scores = M.score_homography_poses(
        R, t, nrm, rays1, rays2, res.inliers.astype(rays1.dtype)
    )
    order = jnp.argsort(-scores, stable=True)
    quats = M.poses_to_quaternions(R[order])
    # Frame conversion for the relax contract (rel_t in the *source* camera
    # frame, see tests/test_relax.py relative_pose_edges): the decomposition
    # yields t_H = R2^T (t1 - t2) in the dest frame; -R_H^T t_H = R1^T (t2 -
    # t1) exactly. (The reference feeds the raw dest-frame t to its cost,
    # reference relax_problem.cpp:324 — biased by the relative yaw; this
    # conversion removes that bias at zero cost.)
    t_src = -jnp.einsum("kji,kj->ki", R[order], t[order])
    return res, quats, t_src, scores[order]
