"""Quaternion algebra (wxyz convention), numpy/jnp-polymorphic.

All functions broadcast over leading batch dimensions and are safe under
``jax.vmap`` / ``jax.grad``. Quaternions are arrays ``[..., 4]`` laid out as
``(w, x, y, z)``.

Polymorphism: every function computes with numpy when ALL inputs are
host (numpy/python) values and with jnp otherwise. Host callers — the
relax problem builders assemble rotation data with concrete numpy arrays
every pipeline iterate — would otherwise pay an eager-XLA compile per
new input shape (~0.5 s each through a remote-device compiler; measured
100+ op-by-op compiles per INITIAL_PROCESSING iterate at 10k-image
scale). numpy 2.x (NEP 50) keeps float32 under python-scalar ufuncs, so
both paths produce identical dtypes.

Replaces Eigen::Quaternion usage in the reference (e.g. cost functors in
reference include/opencalibration/relax/relax_cost_function.hpp).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _ns(*xs):
    """numpy when every argument is a host value, else jnp."""
    for x in xs:
        if isinstance(x, (jax.core.Tracer, jax.Array)):
            return jnp
    return np


def quat_identity(dtype=jnp.float32):
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q, eps=1e-30):
    xp = _ns(q)
    n = xp.linalg.norm(q, axis=-1, keepdims=True)
    return q / xp.maximum(n, eps)


def quat_conjugate(q):
    return q * _ns(q).asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_inverse(q):
    """Inverse of a (not necessarily unit) quaternion."""
    xp = _ns(q)
    return quat_conjugate(q) / xp.maximum(
        xp.sum(q * q, axis=-1, keepdims=True), 1e-30
    )


def quat_multiply(a, b):
    """Hamilton product a*b."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return _ns(a, b).stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q, v):
    """Rotate vector(s) v by unit quaternion(s) q.

    Uses v' = v + 2*w*(u x v) + 2*(u x (u x v)) with u = q.xyz.
    """
    xp = _ns(q, v)
    u = q[..., 1:]
    w = q[..., :1]
    uv = xp.cross(u, v)
    uuv = xp.cross(u, uv)
    return v + 2.0 * (w * uv + uuv)


def quat_rotate_inverse(q, v):
    """Rotate v by the conjugate (inverse for unit q) of q."""
    return quat_rotate(quat_conjugate(q), v)


def quat_from_axis_angle(axis, angle):
    xp = _ns(axis, angle)
    axis = axis / xp.maximum(xp.linalg.norm(axis, axis=-1, keepdims=True), 1e-30)
    half = 0.5 * angle
    s = xp.sin(half)
    w = xp.cos(half)
    return xp.concatenate([w[..., None], axis * s[..., None]], axis=-1)


def quat_exp(v):
    """Exponential map: tangent 3-vector -> unit quaternion.

    quat_exp(v) rotates by angle ||v|| around v. Safe at v = 0.
    """
    xp = _ns(v)
    theta2 = xp.sum(v * v, axis=-1, keepdims=True)
    theta = xp.sqrt(xp.maximum(theta2, 1e-30))
    half = 0.5 * theta
    # sin(t/2)/t with series fallback near zero: 0.5 - t^2/48
    small = theta2 < 1e-12
    k = xp.where(small, 0.5 - theta2 / 48.0, xp.sin(half) / theta)
    w = xp.where(small[..., 0], 1.0 - theta2[..., 0] / 8.0, xp.cos(half[..., 0]))
    return xp.concatenate([w[..., None], v * k], axis=-1)


def quat_log(q):
    """Log map: unit quaternion -> tangent 3-vector (inverse of quat_exp)."""
    xp = _ns(q)
    q = quat_normalize(q)
    # force w >= 0 for the short geodesic
    q = q * xp.sign(xp.where(q[..., :1] == 0, 1.0, q[..., :1]))
    vn = xp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    w = q[..., :1]
    angle = 2.0 * xp.arctan2(vn, w)
    small = vn[..., 0] < 1e-12
    k = xp.where(small[..., None], 2.0 / xp.maximum(w, 1e-30), angle / xp.maximum(vn, 1e-30))
    return q[..., 1:] * k


def quat_angle(q):
    """Rotation angle in [0, pi] represented by quaternion q.

    Matches Eigen::AngleAxis(q).angle() up to the 2*pi ambiguity; the
    reference only uses this as a residual near zero (e.g.
    reference include/opencalibration/relax/relax_cost_function.hpp:235).
    """
    xp = _ns(q)
    vn = xp.linalg.norm(q[..., 1:], axis=-1)
    return 2.0 * xp.arctan2(vn, xp.abs(q[..., 0]))


def quat_to_matrix(q):
    """Unit quaternion -> 3x3 rotation matrix, shape [..., 3, 3]."""
    xp = _ns(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = xp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(m.shape[:-1] + (3, 3))


def quat_from_matrix(m):
    """Rotation matrix -> unit quaternion (wxyz), branch-free Shepperd.

    Computes all four candidate quaternions and picks the one keyed by the
    largest diagonal combination, so it is stable for every rotation and
    differentiable almost everywhere.
    """
    xp = _ns(m)
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tw = 1.0 + m00 + m11 + m22
    tx = 1.0 + m00 - m11 - m22
    ty = 1.0 - m00 + m11 - m22
    tz = 1.0 - m00 - m11 + m22

    def safe_sqrt(t):
        return xp.sqrt(xp.maximum(t, 1e-30))

    # candidate keyed on w
    qw = xp.stack([tw, m21 - m12, m02 - m20, m10 - m01], axis=-1) / (2.0 * safe_sqrt(tw))[..., None]
    qx = xp.stack([m21 - m12, tx, m01 + m10, m02 + m20], axis=-1) / (2.0 * safe_sqrt(tx))[..., None]
    qy = xp.stack([m02 - m20, m01 + m10, ty, m12 + m21], axis=-1) / (2.0 * safe_sqrt(ty))[..., None]
    qz = xp.stack([m10 - m01, m02 + m20, m12 + m21, tz], axis=-1) / (2.0 * safe_sqrt(tz))[..., None]

    t = xp.stack([tw, tx, ty, tz], axis=-1)
    best = xp.argmax(t, axis=-1)
    cands = xp.stack([qw, qx, qy, qz], axis=-2)  # [..., 4 candidates, 4]
    idx = best[..., None, None].astype(xp.int32)
    if xp is np:
        q = xp.take_along_axis(cands, np.repeat(idx, 4, axis=-1), axis=-2)[..., 0, :]
    else:
        q = xp.take_along_axis(cands, idx.repeat(4, axis=-1), axis=-2)[..., 0, :]
    q = quat_normalize(q)
    # canonical sign: w >= 0
    return q * xp.where(q[..., :1] < 0, -1.0, 1.0)


def quat_boxplus(q, delta):
    """Manifold retraction: q (+) delta = q * exp(delta).

    This is the local parameterization used for rotation blocks in the LM
    solver (3-dof tangent like ceres::EigenQuaternionManifold in
    reference src/relax/relax_problem.cpp:21-38).
    """
    return quat_multiply(q, quat_exp(delta))


def angle_between_unit_vectors(n1, n2):
    """Angle between unit vectors; same value as the reference's
    acos(clamp(dot)) (reference relax_cost_function.hpp:16-19) but computed
    as atan2(|n1 x n2|, n1.n2): numerically stable near 0 and pi, with
    bounded gradients (acos' derivative blows up near parallel vectors and
    stalls LM; the atan2 form gives the true geometric derivative)."""
    xp = _ns(n1, n2)
    d = xp.sum(n1 * n2, axis=-1)
    c = xp.cross(n1, n2)
    s = xp.sqrt(xp.maximum(xp.sum(c * c, axis=-1), 1e-30))
    return xp.arctan2(s, d)
