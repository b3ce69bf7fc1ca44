"""Parameter store and tangent-space layout for bundle adjustment.

The reference hands Ceres raw double* blocks with per-block manifolds
(reference src/relax/relax_problem.cpp:21-38: quaternion manifold +
Brown2/24/246 subset manifolds, SetParameterBlockConstant for frozen
boundary nodes). The TPU-native equivalent is one flat *tangent vector*
over every optimizable quantity with

* rotations as 3-dof local increments retracted with q * exp(delta),
* everything else additive,
* freezing/subset-parameterization expressed as a boolean mask over
  tangent entries (masked jacobian columns), not as control flow.

Layout (offsets in tangent vector):
  [C*3 rotations][V mesh_z][P*3 points][M focal][M*2 principal]
  [M*3 radial][M*2 tangential]
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops.quaternion import quat_boxplus, quat_normalize

FOCAL_LOWER = 100.0  # reference relax_problem.cpp:486 bounds
FOCAL_UPPER = 20000.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RelaxParams:
    """All optimizable state for one relax problem (fixed shapes).

    positions are carried but never optimized — the reference never adds
    camera positions as parameter blocks (GPS priors pin them).
    Intrinsics leaves hold one entry per distinct camera model; whether
    they are FORWARD or INVERSE coefficients depends on the problem type
    (mesh problems optimize the inverse model, point problems the forward
    model, matching relax_problem.cpp usage).
    """

    quats: Any  # [C, 4]
    positions: Any  # [C, 3] constant
    mesh_z: Any  # [V]
    points: Any  # [P, 3]
    focal: Any  # [M]
    principal: Any  # [M, 2]
    radial: Any  # [M, 3]
    tangential: Any  # [M, 2]

    @property
    def C(self):
        return self.quats.shape[0]

    @property
    def V(self):
        return self.mesh_z.shape[0]

    @property
    def P(self):
        return self.points.shape[0]

    @property
    def M(self):
        return self.focal.shape[0]

    @staticmethod
    def create(quats, positions, mesh_z=None, points=None, focal=None,
               principal=None, radial=None, tangential=None, dtype=None):
        # numpy leaves for host callers (problem builders create params
        # every pipeline iterate; eager jnp.asarray-with-dtype costs an
        # XLA convert compile per new shape), jnp under tracing
        xp = jnp if any(
            isinstance(x, (jax.core.Tracer, jax.Array))
            for x in (quats, positions, mesh_z, points, focal, principal,
                      radial, tangential)
        ) else np
        quats = xp.asarray(quats)
        dtype = dtype or quats.dtype
        C = quats.shape[0]

        def arr(x, shape):
            return xp.zeros(shape, dtype) if x is None else xp.asarray(x, dtype)

        M = 1 if focal is None else xp.asarray(focal).shape[0]
        return RelaxParams(
            quats=xp.asarray(quats, dtype),
            positions=xp.asarray(positions, dtype),
            mesh_z=arr(mesh_z, (0,)),
            points=arr(points, (0, 3)),
            focal=arr(focal, (M,)),
            principal=arr(principal, (M, 2)),
            radial=arr(radial, (M, 3)),
            tangential=arr(tangential, (M, 2)),
        )


class TangentLayout:
    """Slot arithmetic for the flat tangent vector (static python ints).

    Hashable on its dims so it can be a static jit argument — solver
    compilations are cached per layout shape.
    """

    def __hash__(self):
        return hash((self.C, self.V, self.P, self.M))

    def __eq__(self, other):
        return (
            isinstance(other, TangentLayout)
            and (self.C, self.V, self.P, self.M)
            == (other.C, other.V, other.P, other.M)
        )

    def __init__(self, C: int, V: int, P: int, M: int):
        self.C, self.V, self.P, self.M = C, V, P, M
        self.rot_off = 0
        self.mesh_off = self.rot_off + 3 * C
        self.point_off = self.mesh_off + V
        self.focal_off = self.point_off + 3 * P
        self.principal_off = self.focal_off + M
        self.radial_off = self.principal_off + 2 * M
        self.tangential_off = self.radial_off + 3 * M
        self.dim = self.tangential_off + 2 * M

    @staticmethod
    def for_params(p: RelaxParams) -> "TangentLayout":
        return TangentLayout(p.C, p.V, p.P, p.M)

    # --- slot helpers (index arrays, work on traced cam/vertex ids) ---
    # np.arange constants: with traced ids the add stays a traced jnp op,
    # with concrete numpy ids the whole helper is pure numpy — host-path
    # callers (problem builders) otherwise pay an eager-XLA compile per
    # new id-array shape, every pipeline iterate at 10k scale
    def rot_slots(self, cam_idx):
        return self.rot_off + 3 * cam_idx[..., None] + np.arange(3)

    def mesh_slot(self, v_idx):
        return self.mesh_off + v_idx[..., None]

    def point_slots(self, p_idx):
        return self.point_off + 3 * p_idx[..., None] + np.arange(3)

    def focal_slot(self, m_idx):
        return self.focal_off + m_idx[..., None]

    def principal_slots(self, m_idx):
        return self.principal_off + 2 * m_idx[..., None] + np.arange(2)

    def radial_slots(self, m_idx):
        return self.radial_off + 3 * m_idx[..., None] + np.arange(3)

    def tangential_slots(self, m_idx):
        return self.tangential_off + 2 * m_idx[..., None] + np.arange(2)

    # --- retraction ---
    def retract(self, p: RelaxParams, delta) -> RelaxParams:
        """Apply a full tangent step: boxplus on rotations, additive else,
        with the reference's focal bounds enforced by projection."""
        C, V, P, M = self.C, self.V, self.P, self.M
        d_rot = delta[self.rot_off : self.rot_off + 3 * C].reshape(C, 3)
        quats = quat_normalize(quat_boxplus(p.quats, d_rot))
        mesh_z = p.mesh_z + delta[self.mesh_off : self.mesh_off + V]
        points = p.points + delta[self.point_off : self.point_off + 3 * P].reshape(P, 3)
        focal = jnp.clip(
            p.focal + delta[self.focal_off : self.focal_off + M],
            FOCAL_LOWER,
            FOCAL_UPPER,
        )
        principal = p.principal + delta[
            self.principal_off : self.principal_off + 2 * M
        ].reshape(M, 2)
        radial = p.radial + delta[self.radial_off : self.radial_off + 3 * M].reshape(M, 3)
        tangential = p.tangential + delta[
            self.tangential_off : self.tangential_off + 2 * M
        ].reshape(M, 2)
        return dataclasses.replace(
            p,
            quats=quats,
            mesh_z=mesh_z,
            points=points,
            focal=focal,
            principal=principal,
            radial=radial,
            tangential=tangential,
        )

    # --- free/frozen masks ---
    def build_free_mask(
        self,
        rot_free=None,  # [C] bool
        mesh_free: bool | Any = False,
        points_free: bool | Any = False,
        focal_free: bool = False,
        principal_free: bool = False,
        radial_tiers=0,  # 0 = frozen, 1 = k1 (Brown2), 2 = k1k2 (Brown24), 3 = all (Brown246)
        tangential_free: bool = False,
        dtype=bool,
    ):
        """Tangent mask: True = optimized. radial_tiers maps to the
        reference's Brown2/24/246 subset manifolds
        (relax_problem.cpp:21-23: subsets freeze trailing coefficients)."""
        # pure numpy: this runs on HOST problem-build paths with concrete
        # inputs, and eager jnp here costs an XLA compile per new (C, V,
        # P, M) shape — at 10k scale that is fresh remote compiles every
        # pipeline iterate (the mask is handed to jit as an argument, so
        # numpy is equivalent)
        C, V, P, M = self.C, self.V, self.P, self.M
        rot = (
            np.ones((C, 3), bool)
            if rot_free is None
            else np.broadcast_to(np.asarray(rot_free)[:, None], (C, 3))
        )
        mesh = np.broadcast_to(np.asarray(mesh_free), (V,))
        pts = np.broadcast_to(np.asarray(points_free), (P, 3))
        foc = np.full((M,), focal_free)
        pp = np.full((M, 2), principal_free)
        rad = np.broadcast_to(np.arange(3) < radial_tiers, (M, 3))
        tan = np.full((M, 2), tangential_free)
        return np.concatenate(
            [
                rot.reshape(-1),
                mesh.reshape(-1),
                pts.reshape(-1),
                foc.reshape(-1),
                pp.reshape(-1),
                rad.reshape(-1),
                tan.reshape(-1),
            ]
        )
