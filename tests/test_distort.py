"""Distortion / projection parity tests.

Synthetic-scene pattern from the reference test suite (reference
test/test_distort.cpp): generate measurements with the forward model and
assert the inverse operations recover them exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencalibration_tpu.ops import distort as D
from opencalibration_tpu.ops.quaternion import quat_from_axis_angle
from opencalibration_tpu.types.camera import FORWARD, INVERSE, CameraModel


def make_model(distorted=True, dtype=jnp.float64):
    radial = (-0.05, 0.01, -0.002) if distorted else (0.0, 0.0, 0.0)
    tangential = (1e-3, -5e-4) if distorted else (0.0, 0.0)
    return CameraModel.create(
        focal_length_pixels=1200.0,
        principal_point=(960.0, 540.0),
        radial_distortion=radial,
        tangential_distortion=tangential,
        pixels_cols=1920,
        pixels_rows=1080,
        dtype=dtype,
    )


def test_distort_projected_ray_formula():
    # independent numpy implementation of Brown model
    rng = np.random.default_rng(0)
    xy = rng.normal(size=(100, 2)) * 0.4
    k = np.array([-0.05, 0.01, -0.002])
    p = np.array([1e-3, -5e-4])
    x, y = xy[:, 0], xy[:, 1]
    r2 = x**2 + y**2
    f = 1 + k[0] * r2 + k[1] * r2**2 + k[2] * r2**3
    ex = f * x + 2 * x * y * p[0] + p[1] * (r2 + 2 * x**2)
    ey = f * y + 2 * x * y * p[1] + p[0] * (r2 + 2 * y**2)
    out = D.distort_projected_ray(jnp.asarray(xy), jnp.asarray(k), jnp.asarray(p))
    np.testing.assert_allclose(out, np.stack([ex, ey], -1), rtol=1e-12)


def test_image_roundtrip_no_distortion():
    model = make_model(distorted=False)
    rng = np.random.default_rng(1)
    pixels = jnp.asarray(rng.uniform([100, 100], [1800, 1000], size=(50, 2)))
    rays = jax.vmap(lambda p: D.image_to_3d(p, model))(pixels)
    np.testing.assert_allclose(jnp.linalg.norm(rays, axis=-1), 1.0, atol=1e-12)
    back = jax.vmap(lambda r: D.image_from_3d(r, model))(rays)
    np.testing.assert_allclose(back, pixels, atol=1e-9)


def test_image_roundtrip_with_distortion():
    model = make_model(distorted=True)
    rng = np.random.default_rng(2)
    pixels = jnp.asarray(rng.uniform([100, 100], [1800, 1000], size=(50, 2)))
    rays = jax.vmap(lambda p: D.image_to_3d(p, model))(pixels)
    back = jax.vmap(lambda r: D.image_from_3d(r, model))(rays)
    # 10 Newton iterations on a well-conditioned problem: sub-micro-pixel
    np.testing.assert_allclose(back, pixels, atol=1e-6)


def test_image_roundtrip_float32():
    model = make_model(distorted=True, dtype=jnp.float32)
    rng = np.random.default_rng(3)
    pixels = jnp.asarray(
        rng.uniform([100, 100], [1800, 1000], size=(50, 2)), jnp.float32
    )
    rays = jax.vmap(lambda p: D.image_to_3d(p, model))(pixels)
    back = jax.vmap(lambda r: D.image_from_3d(r, model))(rays)
    np.testing.assert_allclose(back, pixels, atol=2e-2)  # ~1/50 px in f32


def test_world_projection_consistency():
    model = make_model()
    pos = jnp.array([10.0, -5.0, 100.0])
    # camera looking down (nadir-ish): 180deg about x plus a small tilt
    quat = quat_from_axis_angle(jnp.array([1.0, 0.05, 0.02]), jnp.asarray(jnp.pi * 0.98))
    point = jnp.array([14.0, -2.0, 1.0])
    px = D.image_from_3d_world(point, model, pos, quat)
    ray_dir, origin = D.image_to_3d_world(px, model, pos, quat)
    # ray from camera through the pixel must pass through the point
    to_point = (point - origin) / jnp.linalg.norm(point - origin)
    np.testing.assert_allclose(ray_dir, to_point, atol=1e-7)


def test_min_z_clamp():
    model = make_model(distorted=False)
    ray_behind = jnp.array([0.1, 0.2, -0.5])
    px = D.image_from_3d(ray_behind, model)
    # clamped at z=1e-3, same as reference distort_keypoints.hpp:52
    expected = (
        jnp.array([0.1, 0.2]) / 1e-3 * model.focal_length_pixels
        + model.principal_point
    )
    np.testing.assert_allclose(px, expected, rtol=1e-12)


def test_convert_model_roundtrip():
    model = make_model(distorted=True)
    inv = D.convert_to_inverse(model)
    assert inv.tag == INVERSE
    # inverse model must reproduce the forward model's unprojection
    rng = np.random.default_rng(4)
    pixels = jnp.asarray(rng.uniform([200, 200], [1700, 900], size=(40, 2)))
    rays_fwd = jax.vmap(lambda p: D.image_to_3d(p, model))(pixels)
    rays_inv = jax.vmap(lambda p: D.image_to_3d(p, inv))(pixels)
    # the Brown family is not closed under inversion; ~2e-5 residual is the
    # representable optimum (same limitation as the reference's TinySolver fit)
    np.testing.assert_allclose(rays_inv, rays_fwd, atol=5e-5)

    fwd2 = D.convert_to_forward(inv)
    assert fwd2.tag == FORWARD
    np.testing.assert_allclose(
        fwd2.radial_distortion, model.radial_distortion, atol=5e-4
    )


def test_distort_keypoints_batched():
    m1 = make_model()
    m2 = make_model(distorted=False)
    rng = np.random.default_rng(5)
    p1 = jnp.asarray(rng.uniform(100, 900, size=(16, 2)))
    p2 = jnp.asarray(rng.uniform(100, 900, size=(16, 2)))
    r1, r2 = D.distort_keypoints(p1, p2, m1, m2)
    assert r1.shape == (16, 3) and r2.shape == (16, 3)
    np.testing.assert_allclose(jnp.linalg.norm(r1, axis=-1), 1.0, atol=1e-10)
