"""Residual blocks for bundle adjustment.

Each block type re-implements one autodiff cost functor family from
reference include/opencalibration/relax/relax_cost_function.hpp as a pure
per-instance function ``resid_one(delta_local, data_slice, params)``:

* ``delta_local`` is the instance's slice of the global tangent step
  (rotation entries are boxplus increments);
* ``data_slice`` carries the static measurement data (pixels, triangle
  xy, decomposed poses, indices);
* the function gathers current parameter values by index and returns the
  residual vector.

The LM solver vmaps these over instances, takes jacfwd at delta = 0, and
scatter-adds local normal-equation contributions — the batched equivalent
of Ceres assembling a sparse problem from per-edge cost functions.

Where the reference instantiates 4 PixelErrorCost_* template variants and
6 PlaneIntersectionAngleCost_* arities, here a single masked implementation
covers each family: freezing a quantity = masking its tangent column,
padding a ray = zeroing its validity.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops.distort import image_from_3d, image_to_3d
from opencalibration_tpu.ops.intersection import (
    corner_plane_to_norm_offset,
    ray_plane_intersection,
)
from opencalibration_tpu.ops.quaternion import (
    angle_between_unit_vectors,
    quat_angle,
    quat_boxplus,
    quat_conjugate,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    quat_rotate_inverse,
)
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout
from opencalibration_tpu.types.camera import FORWARD, INVERSE, CameraModel

ROBUST_CENTROID_MAX_POINTS = 5  # reference relax_cost_function.hpp:71


def _xp(*xs):
    """numpy for host-side block construction, jnp under tracing.

    The block CONSTRUCTORS run on host problem-build paths with concrete
    numpy inputs; eager jnp there costs an XLA compile per new block
    shape — at 10k scale, fresh remote compiles on every pipeline
    iterate as the graph grows. The residual functions always trace
    under jit and stay jnp."""
    for x in xs:
        if isinstance(x, (jax.core.Tracer, jax.Array)):
            return jnp
    return np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BlockSpec:
    """One batched family of residuals of identical structure."""

    slots: Any  # [B, L] int32 tangent slot per local delta entry
    data: Any  # pytree of arrays with leading dim B
    weight: Any  # [B] instance weight (0 disables a padded instance)
    resid_one: Callable = dataclasses.field(metadata=dict(static=True))
    num_residuals: int = dataclasses.field(metadata=dict(static=True))
    huber_delta: float | None = dataclasses.field(
        default=None, metadata=dict(static=True)
    )
    name: str = dataclasses.field(default="block", metadata=dict(static=True))


def robust_centroid(points, valid, huber_threshold):
    """Masked fixed-iteration Huber-weighted centroid
    (reference relax_cost_function.hpp:73-117, incl. the early-break
    emulated as freezing further updates)."""
    dtype = points.dtype
    v = valid.astype(dtype)
    # non-finite payloads in masked-out rows must not poison the sums
    points = jnp.where(valid[:, None], points, 0.0)
    n = jnp.maximum(jnp.sum(v), 1.0)
    centroid = jnp.sum(points * v[:, None], axis=0) / n

    # UNROLLED fixed 3 iterations (not lax.scan): inside the LM solve this
    # runs under vmap(groups) x vmap(blocks) x jacfwd(tangents), and a
    # scan/while boundary forces the loop-carried [G, B, Tangent, 5, 3]
    # buffers to be materialized in HBM with (8,128) tile padding on the
    # tiny minor dims — a measured 68x expansion (12 GB for 180 MB of
    # data) that OOM'd the 1k-image global relax on v5e. Straight-line
    # code keeps every stage fusion-internal.
    done = jnp.sum(points) * 0.0 > 1.0  # data-derived False (shard_map)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    for _ in range(3):
        err = jnp.linalg.norm(points - centroid, axis=-1)
        w = 1.0 / (err + 1e-8)
        w = jnp.where(err > huber_threshold, w * huber_threshold / jnp.maximum(err, 1e-30), w)
        w = w * v
        total = jnp.maximum(jnp.sum(w), 1e-30)
        new_centroid = jnp.sum(w[:, None] * points, axis=0) / total
        min_w = jnp.min(jnp.where(valid, w, big))
        max_w = jnp.max(jnp.where(valid, w, 0.0))
        centroid = jnp.where(done, centroid, new_centroid)
        done = done | (min_w > max_w * 0.5)
    return centroid


# ---------------------------------------------------------------------------
# Relative-orientation relaxation (MultiDecomposedRotationCost,
# reference relax_cost_function.hpp:188-307)
# ---------------------------------------------------------------------------

_MAX_DECOMPOSITIONS = 4


def _decomposed_rotation_resid(delta, d, params: RelaxParams):
    dtype = params.quats.dtype
    q1 = quat_normalize(quat_boxplus(params.quats[d["cam_i"]], delta[0:3]))
    q2 = quat_normalize(quat_boxplus(params.quats[d["cam_j"]], delta[3:6]))
    t1 = params.positions[d["cam_i"]]
    t2 = params.positions[d["cam_j"]]
    tdiff = t2 - t1
    t_norm2 = jnp.sum(tdiff * tdiff)
    tdir = tdiff / jnp.sqrt(jnp.maximum(t_norm2, 1e-30))

    def one_decomposition(rel_q, rel_t, score, valid):
        rel_q = quat_normalize(rel_q)
        rt_norm2 = jnp.sum(rel_t * rel_t)
        has_t = (t_norm2 > 1e-9) & (rt_norm2 > 1e-9)
        rel_tdir = rel_t / jnp.sqrt(jnp.maximum(rt_norm2, 1e-30))

        r0 = angle_between_unit_vectors(quat_rotate_inverse(q1, tdir), rel_tdir)
        r1 = angle_between_unit_vectors(
            quat_rotate_inverse(q2, quat_rotate(rel_q, -tdir)), -rel_tdir
        )
        pi = jnp.asarray(jnp.pi, dtype)
        r0 = jnp.where(has_t, r0, pi)
        r1 = jnp.where(has_t, r1, pi)
        rot2_1 = quat_multiply(q1, quat_conjugate(q2))
        r2 = quat_angle(quat_multiply(rel_q, rot2_1))
        w = jnp.sqrt(jnp.maximum(score, 0.0) / 8.0)
        res = w * jnp.stack([r0, r1, r2])
        sq = jnp.sum(res * res)
        sq = jnp.where(valid & jnp.all(jnp.isfinite(res)), sq, jnp.inf)
        return res, sq

    res_all, sq_all = jax.vmap(one_decomposition)(
        d["rel_quats"], d["rel_ts"], d["rel_scores"], d["rel_valid"]
    )
    best = jnp.argmin(sq_all)
    # an edge with no finite valid decomposition carries no information:
    # contribute zero instead of poisoning the solve (the reference would
    # simply not create such an edge; builders may still pad with them)
    any_ok = jnp.isfinite(sq_all[best])
    return jnp.where(any_ok, res_all[best], jnp.zeros(3, res_all.dtype))


def decomposed_rotation_block(
    layout: TangentLayout,
    cam_i,
    cam_j,
    rel_quats,
    rel_ts,
    rel_scores,
    rel_valid,
    weight,
    huber_delta: float | None = 10.0 * jnp.pi / 180,  # reference relax_problem.cpp:44
) -> BlockSpec:
    slots = _xp(cam_i).concatenate(
        [layout.rot_slots(cam_i), layout.rot_slots(cam_j)], axis=-1
    )
    data = dict(
        cam_i=cam_i, cam_j=cam_j, rel_quats=rel_quats, rel_ts=rel_ts,
        rel_scores=rel_scores, rel_valid=rel_valid,
    )
    return BlockSpec(
        slots=slots.astype(jnp.int32), data=data, weight=weight,
        resid_one=_decomposed_rotation_resid, num_residuals=3,
        huber_delta=huber_delta, name="decomposed_rotation",
    )


# ---------------------------------------------------------------------------
# Downwards prior (reference relax_cost_function.hpp:21-49)
# ---------------------------------------------------------------------------


def _downwards_resid(delta, d, params: RelaxParams):
    q = quat_normalize(quat_boxplus(params.quats[d["cam_i"]], delta[0:3]))
    dtype = params.quats.dtype
    up = jnp.asarray([0.0, 0.0, 1.0], dtype)
    down = jnp.asarray([0.0, 0.0, -1.0], dtype)
    ang = angle_between_unit_vectors(quat_rotate(q, up), down)
    return (d["w"] * ang)[None]


def downwards_prior_block(layout: TangentLayout, cam_i, weight, prior_weight=1e-3):
    xp = _xp(cam_i, weight)
    dtype = xp.asarray(weight).dtype
    data = dict(cam_i=cam_i, w=xp.full(cam_i.shape, prior_weight, dtype))
    return BlockSpec(
        slots=layout.rot_slots(cam_i).astype(jnp.int32), data=data, weight=weight,
        resid_one=_downwards_resid, num_residuals=1, name="downwards_prior",
    )


# ---------------------------------------------------------------------------
# Pixel reprojection error (PixelErrorCost_* family,
# reference relax_cost_function.hpp:309-499) — one masked implementation
# ---------------------------------------------------------------------------


def _pixel_error_resid(delta, d, params: RelaxParams):
    m = d["model_i"]
    q = quat_normalize(quat_boxplus(params.quats[d["cam_i"]], delta[0:3]))
    pt = params.points[d["point_i"]] + delta[3:6]
    model = CameraModel(
        focal_length_pixels=params.focal[m] + delta[6],
        principal_point=params.principal[m] + delta[7:9],
        radial_distortion=params.radial[m] + delta[9:12],
        tangential_distortion=params.tangential[m] + delta[12:14],
        pixels_cols=jnp.zeros((), params.focal.dtype),
        pixels_rows=jnp.zeros((), params.focal.dtype),
        tag=FORWARD,
    )
    ray = quat_rotate_inverse(q, pt - params.positions[d["cam_i"]])
    return image_from_3d(ray, model) - d["pixel"]


def pixel_error_block(
    layout: TangentLayout, cam_i, point_i, model_i, pixel, weight,
    huber_delta: float | None = 10.0,  # reference relax_problem.cpp:129
) -> BlockSpec:
    slots = _xp(cam_i, point_i).concatenate(
        [
            layout.rot_slots(cam_i),
            layout.point_slots(point_i),
            layout.focal_slot(model_i),
            layout.principal_slots(model_i),
            layout.radial_slots(model_i),
            layout.tangential_slots(model_i),
        ],
        axis=-1,
    )
    data = dict(cam_i=cam_i, point_i=point_i, model_i=model_i, pixel=pixel)
    return BlockSpec(
        slots=slots.astype(jnp.int32), data=data, weight=weight,
        resid_one=_pixel_error_resid, num_residuals=2,
        huber_delta=huber_delta, name="pixel_error",
    )


# ---------------------------------------------------------------------------
# Ray/mesh-triangle intersection costs (MultiRayPlaneIntersectionAngleCost
# family, reference relax_cost_function.hpp:501-790), padded to 5 rays
# ---------------------------------------------------------------------------

MAX_TRACK_RAYS = 5


def _make_plane_ray_resid(use_intrinsics: bool):
    def resid(delta, d, params: RelaxParams):
        dtype = params.quats.dtype
        z = params.mesh_z[d["vert_idx"]] + delta[0:3]
        corners = jnp.concatenate([d["tri_xy"], z[:, None]], axis=-1)  # [3,3]
        norm, offset = corner_plane_to_norm_offset(corners)

        cam_idx = d["cam_idx"]  # [5]
        valid = d["ray_valid"]  # [5]
        if use_intrinsics:
            m = d["model_i"]
            inv_model = CameraModel(
                focal_length_pixels=params.focal[m] + delta[3],
                principal_point=params.principal[m] + delta[4:6],
                radial_distortion=params.radial[m] + delta[6:9],
                tangential_distortion=params.tangential[m],
                pixels_cols=jnp.zeros((), dtype),
                pixels_rows=jnp.zeros((), dtype),
                tag=INVERSE,
            )
            dirs_cam = jax.vmap(lambda px: image_to_3d(px, inv_model))(d["pixel"])
        else:
            dirs_cam = d["fixed_dir"]

        d_rot = delta[9:24].reshape(MAX_TRACK_RAYS, 3)
        quats = quat_normalize(quat_boxplus(params.quats[cam_idx], d_rot))
        world_dirs = quat_rotate(quats, dirs_cam)
        locs = params.positions[cam_idx]

        inter, hit = ray_plane_intersection(
            world_dirs, locs, jnp.broadcast_to(norm, world_dirs.shape), jnp.broadcast_to(offset, locs.shape)
        )
        inter = jnp.where(valid[:, None] & hit[:, None], inter, 0.0)
        v = valid.astype(dtype)
        n_valid = jnp.maximum(jnp.sum(v), 1.0)
        dists = jnp.linalg.norm(inter - locs, axis=-1)
        avg_dist = jnp.sum(v * dists) / n_valid
        huber = avg_dist * 0.01
        centroid = robust_centroid(inter, valid, huber)
        res = (inter - centroid) / jnp.maximum(avg_dist, 1e-30) * v[:, None]
        # ceres-failure semantics: any parallel valid ray poisons the block
        all_ok = jnp.all(hit | ~valid)
        res = jnp.where(all_ok, res, jnp.nan)
        return res.reshape(MAX_TRACK_RAYS * 3)

    return resid


_plane_ray_resid_fixed = _make_plane_ray_resid(use_intrinsics=False)
_plane_ray_resid_intrinsics = _make_plane_ray_resid(use_intrinsics=True)


def plane_ray_block(
    layout: TangentLayout,
    vert_idx,  # [B, 3] mesh vertex indices of the triangle
    tri_xy,  # [B, 3, 2] triangle xy (constant)
    cam_idx,  # [B, 5]
    ray_valid,  # [B, 5]
    weight,  # [B]
    model_i=None,  # [B] shared inverse model index (intrinsics mode)
    pixel=None,  # [B, 5, 2] pixels (intrinsics mode)
    fixed_dir=None,  # [B, 5, 3] camera-frame ray dirs (fixed mode)
    huber_delta: float | None = 1.0 * jnp.pi / 180,  # reference relax_problem.cpp:68
) -> BlockSpec:
    use_intrinsics = fixed_dir is None
    B = vert_idx.shape[0]
    xp = _xp(vert_idx, cam_idx)
    if model_i is None:
        model_i = xp.zeros(B, jnp.int32)
    rot_slots = layout.rot_slots(cam_idx).reshape(B, MAX_TRACK_RAYS * 3)
    slots = xp.concatenate(
        [
            layout.mesh_slot(vert_idx[:, 0]),
            layout.mesh_slot(vert_idx[:, 1]),
            layout.mesh_slot(vert_idx[:, 2]),
            layout.focal_slot(model_i),
            layout.principal_slots(model_i),
            layout.radial_slots(model_i),
            rot_slots,
        ],
        axis=-1,
    )
    data = dict(
        vert_idx=vert_idx, tri_xy=tri_xy, cam_idx=cam_idx, ray_valid=ray_valid,
        model_i=model_i,
    )
    if use_intrinsics:
        data["pixel"] = pixel
        fn = _plane_ray_resid_intrinsics
    else:
        data["fixed_dir"] = fixed_dir
        fn = _plane_ray_resid_fixed
    return BlockSpec(
        slots=slots.astype(jnp.int32), data=data, weight=weight,
        resid_one=fn, num_residuals=MAX_TRACK_RAYS * 3,
        huber_delta=huber_delta, name="plane_ray",
    )


# ---------------------------------------------------------------------------
# Mesh priors (reference relax_problem.cpp:1303-1366)
# ---------------------------------------------------------------------------


def _difference_resid(delta, d, params: RelaxParams):
    z1 = params.mesh_z[d["v_i"]] + delta[0]
    z2 = d["target"] + jnp.where(d["target_is_vertex"], params.mesh_z[d["v_j"]] + delta[1] - d["target"], 0.0)
    return (d["w"] * (z1 - z2))[None]


def mesh_flat_block(layout: TangentLayout, v_i, v_j, weight, prior_weight=1e-4):
    """DifferenceCost between adjacent mesh z (relax_problem.cpp:1305-1323)."""
    xp = _xp(v_i, v_j, weight)
    dtype = xp.asarray(weight).dtype
    slots = xp.concatenate([layout.mesh_slot(v_i), layout.mesh_slot(v_j)], axis=-1)
    data = dict(
        v_i=v_i, v_j=v_j, target=xp.zeros(v_i.shape, dtype),
        target_is_vertex=xp.ones(v_i.shape, bool),
        w=xp.full(v_i.shape, prior_weight, dtype),
    )
    return BlockSpec(
        slots=slots.astype(jnp.int32), data=data, weight=weight,
        resid_one=_difference_resid, num_residuals=1, name="mesh_flat",
    )


def mesh_anchor_block(layout: TangentLayout, v_i, z0, weight, prior_weight=1e-5):
    """Anchor each mesh z to its initial value (relax_problem.cpp:1325-1340)."""
    xp = _xp(v_i, z0, weight)
    dtype = xp.asarray(z0).dtype
    slots = xp.concatenate([layout.mesh_slot(v_i), layout.mesh_slot(v_i)], axis=-1)
    data = dict(
        v_i=v_i, v_j=v_i, target=xp.asarray(z0, dtype),
        target_is_vertex=xp.zeros(v_i.shape, bool),
        w=xp.full(v_i.shape, prior_weight, dtype),
    )
    return BlockSpec(
        slots=slots.astype(jnp.int32), data=data, weight=weight,
        resid_one=_difference_resid, num_residuals=1, name="mesh_anchor",
    )


def _smooth_resid(delta, d, params: RelaxParams):
    zA = params.mesh_z[d["vA"]] + delta[0]
    zB = params.mesh_z[d["vB"]] + delta[1]
    zC = params.mesh_z[d["vC"]] + delta[2]
    zD = params.mesh_z[d["vD"]] + delta[3]
    A = jnp.concatenate([d["xyA"], zA[None]])
    B = jnp.concatenate([d["xyB"], zB[None]])
    C = jnp.concatenate([d["xyC"], zC[None]])
    D = jnp.concatenate([d["xyD"], zD[None]])
    AB = B - A
    n1 = jnp.cross(AB, C - A)
    n2 = jnp.cross(AB, D - A)
    # Side correction: the reference cost (relax_cost_function.hpp:119-155)
    # yields angle=pi for COPLANAR triangles when C and D lie on opposite
    # sides of edge AB — which is exactly how addMeshSmoothPrior wires it
    # (triangleOppositeNodes ARE on opposite sides), so minimizing it would
    # reward folding. We orient n2 by the 2d side of C/D so that coplanar
    # always measures 0 (the intent shown by test_cost_functions.cpp:55-63).
    ab2 = d["xyB"] - d["xyA"]
    side_c = ab2[0] * (d["xyC"][1] - d["xyA"][1]) - ab2[1] * (d["xyC"][0] - d["xyA"][0])
    side_d = ab2[0] * (d["xyD"][1] - d["xyA"][1]) - ab2[1] * (d["xyD"][0] - d["xyA"][0])
    flip = jnp.where(side_c * side_d < 0, -1.0, 1.0)
    n2 = n2 * flip
    n1 = n1 / jnp.maximum(jnp.linalg.norm(n1), 1e-30)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2), 1e-30)
    return (d["w"] * angle_between_unit_vectors(n1, n2))[None]


def mesh_smooth_block(
    layout: TangentLayout, vA, vB, vC, vD, xyA, xyB, xyC, xyD, weight, prior_weight=1e-4
):
    """AdjacentTriangleNormalCost (relax_cost_function.hpp:119-155)."""
    xp = _xp(vA, xyA, weight)
    dtype = xp.asarray(xyA).dtype
    slots = xp.concatenate(
        [layout.mesh_slot(vA), layout.mesh_slot(vB), layout.mesh_slot(vC), layout.mesh_slot(vD)],
        axis=-1,
    )
    data = dict(
        vA=vA, vB=vB, vC=vC, vD=vD, xyA=xyA, xyB=xyB, xyC=xyC, xyD=xyD,
        w=xp.full(vA.shape, prior_weight, dtype),
    )
    return BlockSpec(
        slots=slots.astype(jnp.int32), data=data, weight=weight,
        resid_one=_smooth_resid, num_residuals=1, name="mesh_smooth",
    )


# ---------------------------------------------------------------------------
# Radial monotonicity penalty (reference relax_cost_function.hpp:157-185)
# ---------------------------------------------------------------------------

_MONOTONICITY_SAMPLES = 10


def _monotonicity_resid(delta, d, params: RelaxParams):
    radial = params.radial[d["model_i"]] + delta[0:3]
    i = jnp.arange(1, _MONOTONICITY_SAMPLES + 1, dtype=radial.dtype)
    r = d["r_max"] * i / _MONOTONICITY_SAMPLES
    r2 = r * r
    deriv = (
        1.0 + 3.0 * radial[0] * r2 + 5.0 * radial[1] * r2 * r2 + 7.0 * radial[2] * r2 * r2 * r2
    )
    return jnp.where(deriv < 0, -d["w"] * deriv, 0.0)


def monotonicity_block(layout: TangentLayout, model_i, r_max, obs_weight, weight):
    data = dict(model_i=model_i, r_max=r_max, w=obs_weight)
    return BlockSpec(
        slots=layout.radial_slots(model_i).astype(jnp.int32), data=data,
        weight=weight, resid_one=_monotonicity_resid,
        num_residuals=_MONOTONICITY_SAMPLES, name="monotonicity",
    )
