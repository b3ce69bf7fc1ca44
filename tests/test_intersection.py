import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops import intersection as I
from opencalibration_tpu.ops.quaternion import quat_from_axis_angle
from tests.test_distort import make_model


def test_ray_intersection_exact():
    # two rays through a known point
    p = np.array([1.0, 2.0, 3.0])
    o1 = np.array([0.0, 0.0, 0.0])
    o2 = np.array([5.0, 0.0, 1.0])
    d1 = p - o1
    d2 = p - o2
    pt, err = I.ray_intersection(jnp.asarray(d1), jnp.asarray(o1), jnp.asarray(d2), jnp.asarray(o2))
    np.testing.assert_allclose(pt, p, atol=1e-12)
    np.testing.assert_allclose(err, 0.0, atol=1e-12)


def test_ray_intersection_parallel_nan():
    d = jnp.array([1.0, 0.0, 0.0])
    pt, err = I.ray_intersection(d, jnp.array([0.0, 0, 0]), d, jnp.array([0.0, 1, 0]))
    assert np.isnan(np.asarray(pt)).all()
    assert np.isnan(float(err))


def test_ray_intersection_behind_negative_error():
    # skew rays: closest approach at t=5 on ray1, s=0 on ray2, distance 1
    o1 = np.array([0.0, 0.0, 0.0])
    d1 = np.array([0.0, 0.0, 1.0])
    o2 = np.array([1.0, 0.0, 5.0])
    d2 = np.array([0.0, 1.0, 0.0])
    pt, err = I.ray_intersection(
        jnp.asarray(d1), jnp.asarray(o1), jnp.asarray(d2), jnp.asarray(o2)
    )
    np.testing.assert_allclose(float(err), 1.0, atol=1e-12)
    # flip ray1: closest approach now behind its origin -> negative signed error
    pt2, err2 = I.ray_intersection(
        jnp.asarray(-d1), jnp.asarray(o1), jnp.asarray(d2), jnp.asarray(o2)
    )
    np.testing.assert_allclose(float(err2), -1.0, atol=1e-12)


def test_ray_plane_and_triangle():
    corners = jnp.asarray(
        np.array([[0.0, 0, 0], [4.0, 0, 0], [0.0, 4, 0]])
    )
    d = jnp.array([0.0, 0.0, -1.0])
    o_in = jnp.array([1.0, 1.0, 5.0])
    o_out = jnp.array([3.5, 3.5, 5.0])
    pt, hit = I.ray_triangle_intersection(d, o_in, corners)
    assert bool(hit)
    np.testing.assert_allclose(pt, [1.0, 1.0, 0.0], atol=1e-12)
    _, hit2 = I.ray_triangle_intersection(d, o_out, corners)
    assert not bool(hit2)
    # parallel ray
    _, hit3 = I.ray_plane_intersection(
        jnp.array([1.0, 0, 0]), o_in, jnp.array([0.0, 0, 1.0]), jnp.zeros(3)
    )
    assert not bool(hit3)


def test_pixel_triangulation_refinement():
    model = make_model(distorted=True)
    pos1 = jnp.array([0.0, 0.0, 100.0])
    pos2 = jnp.array([30.0, 5.0, 100.0])
    down = quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(np.pi))
    tilt = quat_from_axis_angle(jnp.array([1.0, 0.1, 0]), jnp.asarray(np.pi * 0.97))
    point = jnp.array([12.0, 3.0, 2.0])

    from opencalibration_tpu.ops.distort import image_from_3d_world

    px1 = image_from_3d_world(point, model, pos1, down)
    px2 = image_from_3d_world(point, model, pos2, tilt)

    rec, cost = I.ray_intersection_pixels(
        model, model, pos1, pos2, down, tilt, px1, px2
    )
    np.testing.assert_allclose(rec, point, atol=1e-6)
    assert float(cost) < 1e-12


def test_triangulate_tracks_multiray():
    rng = np.random.default_rng(0)
    T, R = 5, 4
    points = rng.uniform(-10, 10, size=(T, 3))
    origins = rng.uniform(-50, 50, size=(T, R, 3)) + np.array([0, 0, 100.0])
    dirs = points[:, None, :] - origins
    valid = np.ones((T, R), bool)
    valid[0, 3] = False  # one track with only 3 rays
    # corrupt the invalid ray: must not affect the result
    dirs[0, 3] = np.array([1.0, 0, 0])
    pts, msd = I.triangulate_tracks(
        jnp.asarray(dirs), jnp.asarray(origins), jnp.asarray(valid)
    )
    np.testing.assert_allclose(pts, points, atol=1e-9)
    np.testing.assert_allclose(msd, 0.0, atol=1e-12)

    # track with < 2 rays -> NaN
    valid2 = np.zeros((T, R), bool)
    valid2[:, 0] = True
    pts2, _ = I.triangulate_tracks(
        jnp.asarray(dirs), jnp.asarray(origins), jnp.asarray(valid2)
    )
    assert np.isnan(np.asarray(pts2)).all()
