import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencalibration_tpu.ops import quaternion as q


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 4))
    return jnp.asarray(v / np.linalg.norm(v, axis=-1, keepdims=True))


def test_rotate_matches_matrix():
    quats = random_quats(32)
    rng = np.random.default_rng(1)
    vecs = jnp.asarray(rng.normal(size=(32, 3)))
    out = q.quat_rotate(quats, vecs)
    mats = q.quat_to_matrix(quats)
    expected = jnp.einsum("nij,nj->ni", mats, vecs)
    np.testing.assert_allclose(out, expected, atol=1e-12)


def test_multiply_compose():
    a, b = random_quats(8, 2), random_quats(8, 3)
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.normal(size=(8, 3)))
    lhs = q.quat_rotate(q.quat_multiply(a, b), v)
    rhs = q.quat_rotate(a, q.quat_rotate(b, v))
    np.testing.assert_allclose(lhs, rhs, atol=1e-12)


def test_inverse_rotate():
    quats = random_quats(8, 5)
    rng = np.random.default_rng(6)
    v = jnp.asarray(rng.normal(size=(8, 3)))
    np.testing.assert_allclose(
        q.quat_rotate_inverse(quats, q.quat_rotate(quats, v)), v, atol=1e-12
    )


def test_exp_log_roundtrip():
    rng = np.random.default_rng(7)
    v = jnp.asarray(rng.normal(size=(16, 3)) * 0.8)
    np.testing.assert_allclose(q.quat_log(q.quat_exp(v)), v, atol=1e-10)


def test_exp_zero_is_identity_and_differentiable():
    z = jnp.zeros(3)
    np.testing.assert_allclose(q.quat_exp(z), jnp.array([1.0, 0, 0, 0]), atol=1e-12)
    g = jax.jacobian(q.quat_exp)(z)
    assert np.all(np.isfinite(np.asarray(g)))
    # d(exp)/dv at 0: dw/dv = 0, dxyz/dv = 0.5*I
    np.testing.assert_allclose(np.asarray(g)[1:], 0.5 * np.eye(3), atol=1e-8)


def test_from_matrix_roundtrip():
    quats = random_quats(64, 8)
    # canonical sign w>=0
    quats = quats * jnp.where(quats[..., :1] < 0, -1.0, 1.0)
    rec = q.quat_from_matrix(q.quat_to_matrix(quats))
    np.testing.assert_allclose(rec, quats, atol=1e-9)


def test_from_matrix_180deg_cases():
    # degenerate trace cases: 180-degree rotations about each axis
    for axis in range(3):
        ax = np.zeros(3)
        ax[axis] = 1.0
        quat = q.quat_from_axis_angle(jnp.asarray(ax), jnp.asarray(np.pi))
        rec = q.quat_from_matrix(q.quat_to_matrix(quat))
        np.testing.assert_allclose(
            np.abs(np.asarray(rec)), np.abs(np.asarray(quat)), atol=1e-9
        )


def test_angle():
    angle = jnp.asarray(0.3)
    quat = q.quat_from_axis_angle(jnp.array([0.0, 0, 1]), angle)
    np.testing.assert_allclose(q.quat_angle(quat), angle, atol=1e-12)
    np.testing.assert_allclose(q.quat_angle(-quat), angle, atol=1e-12)


def test_boxplus_small_step():
    quat = random_quats(1, 9)[0]
    delta = jnp.array([1e-4, -2e-4, 3e-4])
    stepped = q.quat_boxplus(quat, delta)
    # relative rotation between q and stepped is exp(delta)
    rel = q.quat_multiply(q.quat_conjugate(quat), stepped)
    np.testing.assert_allclose(q.quat_log(rel), delta, atol=1e-10)
