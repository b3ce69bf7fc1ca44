"""Projection and Brown distortion kernels.

TPU-native re-design of the reference distort layer
(reference src/distort/distort_keypoints.cpp:48-141,
 reference include/opencalibration/distort/distort_keypoints.hpp:26-131,
 reference src/distort/invert_distortion.cpp:105-191).

Where the reference solves tiny per-point inverse problems with
ceres::TinySolver (data-dependent termination), every solver here is a
*fixed-iteration* Newton / Levenberg-Marquardt loop: identical math, static
control flow, so the whole thing vmaps and jits into one fused XLA program
over millions of points.

All functions operate on single items and broadcast naturally; use jax.vmap
for explicit batching over mixed camera batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from opencalibration_tpu.types.camera import FORWARD, INVERSE, CameraModel
from opencalibration_tpu.ops.quaternion import quat_rotate, quat_rotate_inverse

MIN_PROJECTION_Z = 1e-3  # matches clamp in reference distort_keypoints.hpp:52-53
_UNDISTORT_ITERS = 10  # matches TinySolver max_num_iterations=10 (distort_keypoints.cpp:88)


def distort_projected_ray(xy, radial, tangential):
    """Brown radial(k1,k2,k3) + tangential(p1,p2) forward distortion.

    Mirrors reference include/opencalibration/distort/distort_keypoints.hpp:26-42.
    xy: [..., 2] projected ray; returns [..., 2].
    """
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2
    k1, k2, k3 = radial[..., 0], radial[..., 1], radial[..., 2]
    p1, p2 = tangential[..., 0], tangential[..., 1]
    radial_factor = 1.0 + k1 * r2 + k2 * r4 + k3 * r6
    xy_prod2 = 2.0 * x * y
    dx = radial_factor * x + xy_prod2 * p1 + p2 * (r2 + 2.0 * x * x)
    dy = radial_factor * y + xy_prod2 * p2 + p1 * (r2 + 2.0 * y * y)
    return jnp.stack([dx, dy], axis=-1)


def undistort_iterative(target_xy, radial, tangential, iters: int = _UNDISTORT_ITERS):
    """Solve distort_projected_ray(u) == target_xy for u.

    Fixed-iteration damped Newton on the 2x2 system — the static-shape
    equivalent of the TinySolver autodiff solve in
    reference src/distort/distort_keypoints.cpp:78-91.
    """
    dtype = target_xy.dtype

    def resid(u):
        return distort_projected_ray(u, radial, tangential) - target_xy

    def step(_, u):
        r = resid(u)
        J = jax.jacfwd(resid)(u)  # [2, 2]
        # Levenberg damping keeps the step sane for extreme coefficients
        A = J.T @ J + jnp.asarray(1e-12, dtype) * jnp.eye(2, dtype=dtype)
        g = J.T @ r
        det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
        inv = jnp.array([[A[1, 1], -A[0, 1]], [-A[1, 0], A[0, 0]]], dtype=dtype) / det
        du = inv @ g
        u_new = u - du
        # reject non-finite updates (degenerate jacobian)
        return jnp.where(jnp.all(jnp.isfinite(u_new)), u_new, u)

    return jax.lax.fori_loop(0, iters, step, target_xy, unroll=True)


def project_planar(ray):
    """Planar projection with the z >= MIN_PROJECTION_Z clamp of the reference."""
    z = jnp.maximum(ray[..., 2], jnp.asarray(MIN_PROJECTION_Z, ray.dtype))
    return ray[..., :2] / z[..., None]


def _normalize_homogeneous(xy):
    """[x, y] -> unit-norm [x, y, 1]."""
    h = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    return h / jnp.linalg.norm(h, axis=-1, keepdims=True)


def image_to_3d(pixel, model: CameraModel):
    """Pixel -> unit ray in camera frame.

    FORWARD model: iterative undistort (reference distort_keypoints.cpp:68-103).
    INVERSE model: stored coefficients applied directly
    (reference distort_keypoints.hpp:97-116).
    """
    unprojected = (pixel - model.principal_point) / model.focal_length_pixels
    if model.tag == FORWARD:
        undistorted = undistort_iterative(
            unprojected, model.radial_distortion, model.tangential_distortion
        )
    else:
        undistorted = distort_projected_ray(
            unprojected, model.radial_distortion, model.tangential_distortion
        )
    return _normalize_homogeneous(undistorted)


def image_from_3d(ray, model: CameraModel):
    """Camera-frame ray/point -> pixel.

    FORWARD model: project + distort directly (reference
    distort_keypoints.hpp:44-67). INVERSE model: project + iterative solve
    (reference distort_keypoints.cpp:105-141).
    """
    projected = project_planar(ray)
    if model.tag == FORWARD:
        distorted = distort_projected_ray(
            projected, model.radial_distortion, model.tangential_distortion
        )
    else:
        distorted = undistort_iterative(
            projected, model.radial_distortion, model.tangential_distortion
        )
    return distorted * model.focal_length_pixels[..., None] + model.principal_point


def image_to_3d_world(pixel, model: CameraModel, camera_pos, camera_quat):
    """Pixel -> (world ray direction, origin). Mirrors
    reference distort_keypoints.hpp:118-129."""
    return quat_rotate(camera_quat, image_to_3d(pixel, model)), camera_pos


def image_from_3d_world(point, model: CameraModel, camera_pos, camera_quat):
    """World point -> pixel. Mirrors reference distort_keypoints.hpp:69-95."""
    return image_from_3d(quat_rotate_inverse(camera_quat, point - camera_pos), model)


# ---------------------------------------------------------------------------
# Forward <-> inverse model conversion
# (reference src/distort/invert_distortion.cpp:105-191)
# ---------------------------------------------------------------------------

_CONVERT_GRID = 20


def _lm_fit_5param(resid_fn, p0, iters: int = 50):
    """Small dense Levenberg-Marquardt over 5 parameters, fixed iterations.

    Static-shape equivalent of ceres::TinySolver with NUM_PARAMETERS=5.
    """
    dtype = p0.dtype

    def cost(p):
        r = resid_fn(p)
        return jnp.sum(r * r)

    def step(carry, _):
        p, lam = carry
        r = resid_fn(p)
        J = jax.jacfwd(resid_fn)(p)  # [R, 5]
        JtJ = J.T @ J
        g = J.T @ r
        A = JtJ + lam * jnp.diag(jnp.maximum(jnp.diag(JtJ), 1e-12))
        dp = jnp.linalg.solve(A, g)
        p_new = p - dp
        ok = jnp.isfinite(cost(p_new)) & (cost(p_new) < cost(p))
        p_next = jnp.where(ok, p_new, p)
        lam_next = jnp.where(ok, lam * 0.33, lam * 3.0)
        lam_next = jnp.clip(lam_next, 1e-12, 1e10)
        return (p_next, lam_next), None

    (p, _), _ = jax.lax.scan(step, (p0, jnp.asarray(1e-4, dtype)), None, length=iters)
    return p


def _pixel_grid(model: CameraModel, divisions: int = _CONVERT_GRID):
    """Static pixel sample grid like the nested stride loops in
    reference invert_distortion.cpp:117-135 (grid_divisions=20)."""
    dtype = model.dtype
    u = jnp.arange(divisions + 1, dtype=dtype) / divisions
    cols = model.pixels_cols
    rows = model.pixels_rows
    px = u * cols
    py = u * rows
    gx, gy = jnp.meshgrid(px, py, indexing="ij")
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [(d+1)^2, 2]


@jax.jit
def convert_to_inverse(model: CameraModel) -> CameraModel:
    """Fit an INVERSE model matching a FORWARD model over a pixel grid.

    Mirrors reference invert_distortion.cpp:105-150: sample the grid, take
    (ray, exact forward reprojection) pairs, LM-fit the 5 distortion params
    of the inverse model on 3d ray residuals. Jitted: the grid is static,
    so every conversion after the first reuses one compiled program
    (an eager trace of the nested LM costs seconds per call).
    """
    assert model.tag == FORWARD
    dtype = model.dtype
    pixels = _pixel_grid(model)
    rays = jax.vmap(lambda p: image_to_3d(p, model))(pixels)
    # exact forward projection of the recovered rays
    repro = jax.vmap(lambda r: image_from_3d(r, model))(rays)

    base = model.with_tag(INVERSE)

    def resid(params):
        cand = base.replace(
            radial_distortion=params[:3], tangential_distortion=params[3:]
        )
        pred = jax.vmap(lambda p: image_to_3d(p, cand))(repro)
        return (pred - rays).reshape(-1)

    p0 = jnp.zeros(5, dtype)
    p = _lm_fit_5param(resid, p0)
    return base.replace(radial_distortion=p[:3], tangential_distortion=p[3:])


@jax.jit
def convert_to_forward(model: CameraModel) -> CameraModel:
    """Fit a FORWARD model matching an INVERSE model over a pixel grid.

    Mirrors reference invert_distortion.cpp:152-191 (2d pixel residuals).
    Jitted for the same reason as convert_to_inverse.
    """
    assert model.tag == INVERSE
    dtype = model.dtype
    pixels = _pixel_grid(model)
    rays = jax.vmap(lambda p: image_to_3d(p, model))(pixels)

    base = model.with_tag(FORWARD)

    def resid(params):
        cand = base.replace(
            radial_distortion=params[:3], tangential_distortion=params[3:]
        )
        pred = jax.vmap(lambda r: image_from_3d(r, cand))(rays)
        return (pred - pixels).reshape(-1) / jnp.maximum(model.focal_length_pixels, 1.0)

    p0 = jnp.zeros(5, dtype)
    p = _lm_fit_5param(resid, p0)
    return base.replace(radial_distortion=p[:3], tangential_distortion=p[3:])


def distort_keypoints(points1, points2, model1: CameraModel, model2: CameraModel):
    """Batched correspondence undistortion: pixel pairs -> unit-ray pairs.

    The batched equivalent of reference src/distort/distort_keypoints.cpp:48-66
    (which loops image_to_3d per match).
    points*: [N, 2] pixels. Returns ([N, 3], [N, 3]) unit rays.
    """
    m1 = jax.vmap(lambda p: image_to_3d(p, model1))(points1)
    m2 = jax.vmap(lambda p: image_to_3d(p, model2))(points2)
    return m1, m2
