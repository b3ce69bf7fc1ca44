"""Ray / plane / triangle geometry kernels.

Batched re-design of reference src/geometry/intersection.cpp and
include/opencalibration/geometry/intersection.hpp. All functions are scalar
per-item and vmap cleanly; the LM-refined two-pixel triangulation replaces
ceres::TinySolver (intersection.cpp:162-186) with a fixed-iteration
Levenberg-Marquardt on the 3-parameter point.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencalibration_tpu.ops.distort import image_from_3d_world, image_to_3d
from opencalibration_tpu.ops.quaternion import quat_rotate


def ray_intersection(dir1, origin1, dir2, origin2):
    """Midpoint of closest approach of two rays + signed squared distance.

    Mirrors reference intersection.cpp:116-143: returns (point [3], error)
    where error = squared inter-ray distance, negated if the closest
    approach lies behind either ray origin; NaN point if near-parallel.
    """
    n1dn1 = jnp.sum(dir1 * dir1, axis=-1)
    n1dn2 = jnp.sum(dir1 * dir2, axis=-1)
    n2dn2 = jnp.sum(dir2 * dir2, axis=-1)
    denom = n1dn1 * n2dn2 - n1dn2 * n1dn2

    offset = origin1 - origin2
    odn1 = jnp.sum(offset * dir1, axis=-1)
    odn2 = jnp.sum(offset * dir2, axis=-1)

    safe = jnp.abs(denom) > 1e-9
    denom_s = jnp.where(safe, denom, 1.0)
    t = (n1dn2 * odn2 - n2dn2 * odn1) / denom_s
    s = (n1dn1 * odn2 - n1dn2 * odn1) / denom_s

    p1 = origin1 + t[..., None] * dir1
    p2 = origin2 + s[..., None] * dir2
    mid = 0.5 * (p1 + p2)
    err = jnp.sum((p1 - p2) ** 2, axis=-1) * jnp.where((t >= 0) & (s >= 0), 1.0, -1.0)

    nan = jnp.full_like(mid, jnp.nan)
    return (
        jnp.where(safe[..., None], mid, nan),
        jnp.where(safe, err, jnp.nan),
    )


def ray_intersection_pixels(
    model1, model2, pos1, pos2, quat1, quat2, px1, px2, iters: int = 20
):
    """Two-pixel triangulation with LM refinement of the reprojection error.

    Mirrors reference intersection.cpp:162-186: closed-form two-ray midpoint
    initial guess, then minimize the stacked 4-vector of pixel residuals
    over the 3d point. Returns (point [3], final_cost).
    """
    dtype = px1.dtype
    r1 = quat_rotate(quat1, image_to_3d(px1, model1))
    r2 = quat_rotate(quat2, image_to_3d(px2, model2))
    p0, _ = ray_intersection(r1, pos1, r2, pos2)
    # fall back to midpoint of camera positions if the rays were parallel
    p0 = jnp.where(jnp.all(jnp.isfinite(p0)), p0, 0.5 * (pos1 + pos2))

    def resid(p):
        e1 = image_from_3d_world(p, model1, pos1, quat1) - px1
        e2 = image_from_3d_world(p, model2, pos2, quat2) - px2
        return jnp.concatenate([e1, e2])

    def cost(p):
        r = resid(p)
        return 0.5 * jnp.sum(r * r)

    def step(carry, _):
        p, lam = carry
        r = resid(p)
        J = jax.jacfwd(resid)(p)  # [4, 3]
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-12))
        dp = jnp.linalg.solve(A, g)
        p_new = p - dp
        ok = jnp.isfinite(cost(p_new)) & (cost(p_new) < cost(p))
        return (
            jnp.where(ok, p_new, p),
            jnp.clip(jnp.where(ok, lam * 0.33, lam * 3.0), 1e-12, 1e8),
        ), None

    (p, _), _ = jax.lax.scan(step, (p0, jnp.asarray(1e-6, dtype)), None, length=iters)
    return p, cost(p)


def corner_plane_to_norm_offset(corners):
    """plane_3_corners -> (normal, offset) per reference intersection.hpp:26-32.

    corners: [..., 3, 3]. Returns (norm [..., 3], offset [..., 3]).
    """
    c0 = corners[..., 0, :]
    n = jnp.cross(c0 - corners[..., 1, :], c0 - corners[..., 2, :])
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-30)
    return n, c0


def ray_plane_intersection(ray_dir, ray_origin, plane_norm, plane_offset):
    """Mirrors reference intersection.hpp:34-47. Returns (point, hit_mask);
    point is NaN where the ray is parallel to the plane."""
    denom = jnp.sum(plane_norm * ray_dir, axis=-1)
    hit = jnp.abs(denom) >= 1e-9
    denom_s = jnp.where(hit, denom, 1.0)
    t = (
        jnp.sum(plane_norm * plane_offset, axis=-1)
        - jnp.sum(ray_origin * plane_norm, axis=-1)
    ) / denom_s
    point = ray_origin + t[..., None] * ray_dir
    nan = jnp.full_like(point, jnp.nan)
    return jnp.where(hit[..., None], point, nan), hit


def point_inside_triangle(point, corners):
    """Same-side-of-edge test x3, reference intersection.hpp:49-72.

    point: [..., 3]; corners: [..., 3, 3].
    """
    inside = jnp.ones(point.shape[:-1], bool)
    for i in range(3):
        v0 = corners[..., i, :]
        v1 = corners[..., (i + 1) % 3, :]
        ref = corners[..., (i + 2) % 3, :]
        edge = v1 - v0
        raw = ref - v0
        perp = raw - edge * (
            jnp.sum(raw * edge, axis=-1)
            / jnp.maximum(jnp.sum(edge * edge, axis=-1), 1e-30)
        )[..., None]
        test = point - v0
        inside &= jnp.sum(test * perp, axis=-1) >= 0
    return inside


def ray_triangle_intersection(ray_dir, ray_origin, corners):
    """Mirrors reference intersection.hpp:74-81. Returns (point, hit)."""
    norm, offset = corner_plane_to_norm_offset(corners)
    point, hit = ray_plane_intersection(ray_dir, ray_origin, norm, offset)
    inside = point_inside_triangle(jnp.where(hit[..., None], point, 0.0), corners)
    return point, hit & inside


def triangulate_tracks(ray_dirs, origins, valid):
    """Multi-ray triangulation: least-squares point minimizing distance to
    all valid rays (closed form). Replaces the reference's 2-ray-only
    rayIntersection(vector<ray>) (intersection.cpp:145-160) with a true
    N-ray solve, batched over tracks.

    ray_dirs: [T, R, 3] unit directions; origins: [T, R, 3]; valid: [T, R].
    Returns (points [T, 3], mean_sq_distance [T]).
    """
    d = ray_dirs / jnp.maximum(
        jnp.linalg.norm(ray_dirs, axis=-1, keepdims=True), 1e-30
    )
    w = valid.astype(ray_dirs.dtype)
    eye = jnp.eye(3, dtype=ray_dirs.dtype)
    # A_i = I - d_i d_i^T ; solve (sum w A_i) p = sum w A_i o_i
    A_i = eye[None, None] - d[..., :, None] * d[..., None, :]
    A = jnp.sum(w[..., None, None] * A_i, axis=1)
    b = jnp.sum(w[..., None] * jnp.einsum("trij,trj->tri", A_i, origins), axis=1)
    n_valid = jnp.sum(w, axis=1)
    ok = n_valid >= 2
    A_safe = A + (1e-12 + jnp.where(ok, 0.0, 1.0))[..., None, None] * eye
    p = jnp.linalg.solve(A_safe, b[..., None])[..., 0]
    # mean squared perpendicular distance
    diff = p[:, None, :] - origins
    perp = diff - d * jnp.sum(diff * d, axis=-1, keepdims=True)
    msd = jnp.sum(w * jnp.sum(perp * perp, axis=-1), axis=1) / jnp.maximum(
        n_valid, 1.0
    )
    nan = jnp.nan
    return (
        jnp.where(ok[..., None], p, nan),
        jnp.where(ok, msd, nan),
    )
