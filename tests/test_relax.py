"""Bundle adjustment (relax) tests.

Synthetic 3-camera scenes with analytically generated measurements, the
pattern of reference test/test_relax.cpp:19-167: cameras placed by hand,
pixels generated with the forward model, optimizers asserted to recover
exact ground truth from perturbed initializations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from opencalibration_tpu.ops.distort import image_from_3d, image_to_3d
from opencalibration_tpu.ops.quaternion import (
    quat_angle,
    quat_conjugate,
    quat_from_axis_angle,
    quat_multiply,
    quat_rotate,
    quat_rotate_inverse,
)
from opencalibration_tpu.relax import blocks as B
from opencalibration_tpu.relax import lm
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout
from opencalibration_tpu.types.camera import FORWARD, CameraModel

DOWN = quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(np.pi))


def make_scene():
    """3 cameras at 9-11m looking down, like reference test_relax.cpp:31-59."""
    yaw = quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(0.2))
    pitch = quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.asarray(-0.3))
    roll = quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(-0.3))
    ground_ori = jnp.stack(
        [
            quat_multiply(yaw, DOWN),
            quat_multiply(pitch, DOWN),
            quat_multiply(roll, DOWN),
        ]
    )
    ground_pos = jnp.asarray([[9.0, 9, 9], [11.0, 9, 9], [11.0, 11, 9]])
    model = CameraModel.create(600.0, (400.0, 300.0), pixels_cols=800, pixels_rows=600, dtype=jnp.float64)
    return ground_ori, ground_pos, model


def planar_points():
    """reference test_relax.cpp:62-74."""
    pts = []
    for i in range(10):
        for j in range(10):
            pts.append([i + 5, j + 5, -10 + 1e-3 * i + 1e-2 * j])
    return jnp.asarray(pts, jnp.float64)


def project_all(points, quats, positions, model):
    """pixels[i, p] of point p in camera i."""
    def one_cam(q, t):
        return jax.vmap(
            lambda p: image_from_3d(quat_rotate_inverse(q, p - t), model)
        )(points)

    return jax.vmap(one_cam)(quats, positions)


def ori_errors(quats, ground):
    rel = quat_multiply(quat_conjugate(ground), quats)
    return np.asarray(quat_angle(rel))


def relative_pose_edges(ground_ori, ground_pos):
    """Ground-truth relative poses per edge (i, (i+1)%3), the contract of
    reference test_relax.cpp:124-148: rel_rot = q2*q1^-1,
    rel_t = q1^-1 * normalize(t2 - t1)."""
    cam_i, cam_j = [], []
    rel_quats, rel_ts, rel_scores, rel_valid = [], [], [], []
    for i in range(3):
        a, b = i, (i + 1) % 3
        q1, q2 = ground_ori[a], ground_ori[b]
        rel_rot = quat_multiply(q2, quat_conjugate(q1))
        tdir = ground_pos[b] - ground_pos[a]
        tdir = tdir / jnp.linalg.norm(tdir)
        rel_t = quat_rotate_inverse(q1, tdir)
        cam_i.append(a)
        cam_j.append(b)
        # 4-slot padding with 2 valid decompositions (scores 8 and 18)
        rel_quats.append(jnp.stack([rel_rot, rel_rot, rel_rot, rel_rot]))
        rel_ts.append(jnp.stack([rel_t, rel_t, rel_t, rel_t]))
        rel_scores.append(jnp.asarray([8.0, 18.0, 0.0, 0.0]))
        rel_valid.append(jnp.asarray([True, True, False, False]))
    return (
        jnp.asarray(cam_i),
        jnp.asarray(cam_j),
        jnp.stack(rel_quats),
        jnp.stack(rel_ts),
        jnp.stack(rel_scores),
        jnp.stack(rel_valid),
    )


def test_decomposed_rotation_cost_zero_at_ground_truth():
    ground_ori, ground_pos, model = make_scene()
    layout = TangentLayout(3, 0, 0, 1)
    params = RelaxParams.create(ground_ori, ground_pos)
    ci, cj, rq, rt, rs, rv = relative_pose_edges(ground_ori, ground_pos)
    blk = B.decomposed_rotation_block(
        layout, ci, cj, rq, rt, rs, rv, jnp.ones(3)
    )
    cost = lm.block_cost(params, blk)
    assert float(cost) < 1e-20


def test_relax_decomposition_recovers_orientations():
    """Port of the incremental-relax noise-convergence cases
    (reference test_relax.cpp:169-400): perturb orientations, solve the
    relative-pose problem, expect recovery to ~1e-6 rad."""
    ground_ori, ground_pos, model = make_scene()
    noise = [
        quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.asarray(0.1)),
        quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(-0.15)),
        quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(0.12)),
    ]
    noisy = jnp.stack([quat_multiply(ground_ori[i], noise[i]) for i in range(3)])

    layout = TangentLayout(3, 0, 0, 1)
    params = RelaxParams.create(noisy, ground_pos)
    ci, cj, rq, rt, rs, rv = relative_pose_edges(ground_ori, ground_pos)
    blk = B.decomposed_rotation_block(layout, ci, cj, rq, rt, rs, rv, jnp.ones(3))
    down = B.downwards_prior_block(layout, jnp.arange(3), jnp.ones(3))
    free = layout.build_free_mask()

    solved, info = lm.solve(params, [blk, down], layout, free, init_lambda=0.1)
    errs = ori_errors(solved.quats, ground_ori)
    assert errs.max() < 1e-4, errs
    assert float(info.final_cost) < float(info.initial_cost) * 1e-4


def test_relax_3d_points_recovers_orientations_and_points():
    """Pixel-error BA: 3 cameras x 100 points, perturbed orientations and
    points; optimize both (positions fixed). Mirrors the POINTS_3D problems
    of reference test_relax.cpp with RelaxOptionSet{ORIENTATION, POINTS_3D}."""
    ground_ori, ground_pos, model = make_scene()
    pts = planar_points()
    pixels = project_all(pts, ground_ori, ground_pos, model)  # [3, P, 2]
    P = pts.shape[0]

    rng = np.random.default_rng(0)
    noise_angles = [0.05, -0.04, 0.06]
    axes = [[0, 1, 0], [0, 0, 1], [1, 0, 0]]
    noisy_ori = jnp.stack(
        [
            quat_multiply(
                ground_ori[i],
                quat_from_axis_angle(jnp.asarray(axes[i], jnp.float64), jnp.asarray(noise_angles[i])),
            )
            for i in range(3)
        ]
    )
    noisy_pts = pts + jnp.asarray(rng.normal(0, 0.2, size=(P, 3)))

    layout = TangentLayout(3, 0, P, 1)
    params = RelaxParams.create(
        noisy_ori, ground_pos, points=noisy_pts,
        focal=jnp.asarray([600.0]), principal=jnp.asarray([[400.0, 300.0]]),
    )

    cam_i = jnp.repeat(jnp.arange(3), P)
    point_i = jnp.tile(jnp.arange(P), 3)
    model_i = jnp.zeros(3 * P, jnp.int32)
    pix = pixels.reshape(3 * P, 2)
    blk = B.pixel_error_block(layout, cam_i, point_i, model_i, pix, jnp.ones(3 * P))
    free = layout.build_free_mask(points_free=True)

    solved, info = lm.solve(params, [blk], layout, free, init_lambda=1.0)
    errs = ori_errors(solved.quats, ground_ori)
    assert errs.max() < 1e-5, errs
    np.testing.assert_allclose(np.asarray(solved.points), np.asarray(pts), atol=1e-4)
    assert float(info.final_cost) < 1e-10


def test_relax_focal_recovery():
    """Intrinsics calibration: wrong focal, optimize focal + orientations +
    points; expect focal back to 600 (the camera_parameter_relax contract)."""
    ground_ori, ground_pos, model = make_scene()
    pts = planar_points()
    # a 3d (non-planar) cloud constrains focal better
    pts = pts.at[:, 2].add(jnp.asarray((np.arange(100) % 2) * 1.0))
    pixels = project_all(pts, ground_ori, ground_pos, model)
    P = pts.shape[0]

    layout = TangentLayout(3, 0, P, 1)
    params = RelaxParams.create(
        ground_ori, ground_pos, points=pts,
        focal=jnp.asarray([630.0]),  # 5% off
        principal=jnp.asarray([[400.0, 300.0]]),
    )
    cam_i = jnp.repeat(jnp.arange(3), P)
    point_i = jnp.tile(jnp.arange(P), 3)
    model_i = jnp.zeros(3 * P, jnp.int32)
    blk = B.pixel_error_block(
        layout, cam_i, point_i, model_i, pixels.reshape(3 * P, 2), jnp.ones(3 * P)
    )
    free = layout.build_free_mask(points_free=True, focal_free=True)
    solved, info = lm.solve(params, [blk], layout, free)
    np.testing.assert_allclose(float(solved.focal[0]), 600.0, atol=0.1)


def test_relax_ground_plane_mesh():
    """Ground-plane problem: 2-ray plane intersection costs over one big
    triangle; recover orientations and plane height (the GROUND_PLANE
    pipeline stage, reference relax_problem.cpp:61-81,1193-1240)."""
    ground_ori, ground_pos, model = make_scene()
    pts = planar_points()  # nearly flat at z ~ -10
    pixels = project_all(pts, ground_ori, ground_pos, model)
    P = pts.shape[0]

    # one huge triangle below the cameras (initializeGroundPlane geometry)
    tri_xy = jnp.asarray([[-40.0, -40.0], [60.0, -40.0], [10.0, 60.0]])
    mesh_z0 = jnp.asarray([-5.0, -5.0, -5.0])  # wrong height; truth ~ -10

    layout = TangentLayout(3, 3, 0, 1)
    noise = [
        quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.asarray(0.03)),
        quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(-0.03)),
        quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(0.02)),
    ]
    noisy_ori = jnp.stack([quat_multiply(ground_ori[i], noise[i]) for i in range(3)])
    params = RelaxParams.create(noisy_ori, ground_pos, mesh_z=mesh_z0)

    # 2-ray blocks for every camera pair -> padded to 5 rays (like
    # addRayTriangleMeasurementCost without intrinsics optimization)
    dirs = [
        jax.vmap(lambda px: image_to_3d(px, model))(pixels[i]) for i in range(3)
    ]
    cam_idx_list, valid_list, dir_list = [], [], []
    for a, b in ((0, 1), (1, 2), (0, 2)):
        cam_idx_list.append(jnp.tile(jnp.asarray([a, b, 0, 0, 0], jnp.int32), (P, 1)))
        valid_list.append(
            jnp.tile(jnp.asarray([True, True, False, False, False]), (P, 1))
        )
        dir_list.append(jnp.stack([dirs[a], dirs[b], dirs[0], dirs[0], dirs[0]], axis=1))
    cam_idx = jnp.concatenate(cam_idx_list)
    ray_valid = jnp.concatenate(valid_list)
    fixed_dir = jnp.concatenate(dir_list)  # [3P, 5, 3]
    NB = cam_idx.shape[0]
    vert_idx = jnp.tile(jnp.asarray([0, 1, 2], jnp.int32), (NB, 1))
    blk = B.plane_ray_block(
        layout, vert_idx, jnp.tile(tri_xy, (NB, 1, 1)), cam_idx, ray_valid,
        jnp.ones(NB), fixed_dir=fixed_dir,
    )
    down = B.downwards_prior_block(layout, jnp.arange(3), jnp.ones(3))
    free = layout.build_free_mask(mesh_free=True)

    # surface-only pre-solve (relaxObservedModelOnly), then the full solve
    surf_only = layout.build_free_mask(
        rot_free=jnp.zeros(3, bool), mesh_free=True
    )
    params, _ = lm.solve(params, [blk, down], layout, surf_only)
    solved, info = lm.solve(params, [blk, down], layout, free)

    errs = ori_errors(solved.quats, ground_ori)
    assert errs.max() < 5e-3, errs
    # plane must drop to the true ground height ~ -10 (corners extrapolate
    # the slight synthetic ground tilt far beyond the point footprint)
    np.testing.assert_allclose(np.asarray(solved.mesh_z), -10.0, atol=0.8)


def test_mesh_priors_smoke():
    """flat+anchor priors: exact quadratic, z collapses to the anchor;
    smooth prior: zero for coplanar quads, positive when bent."""
    layout = TangentLayout(1, 4, 0, 1)
    quats = DOWN[None]
    params = RelaxParams.create(
        quats, jnp.zeros((1, 3)), mesh_z=jnp.asarray([0.0, 3.0, -2.0, 1.0])
    )
    v = jnp.asarray
    flat = B.mesh_flat_block(
        layout, v([0, 1, 2, 0], jnp.int32), v([1, 2, 3, 3], jnp.int32), jnp.ones(4)
    )
    anchor = B.mesh_anchor_block(
        layout, jnp.arange(4, dtype=jnp.int32), jnp.zeros(4), jnp.ones(4)
    )
    free = layout.build_free_mask(rot_free=jnp.zeros(1, bool), mesh_free=True)
    solved, info = lm.solve(params, [flat, anchor], layout, free)
    spread = float(jnp.max(solved.mesh_z) - jnp.min(solved.mesh_z))
    assert spread < 1e-6
    assert float(info.final_cost) < 1e-20

    # smooth prior values
    xy = jnp.asarray([[0.0, 0], [1.0, 0], [1.0, 1], [0.0, 1]])
    smooth = B.mesh_smooth_block(
        layout,
        v([0], jnp.int32), v([2], jnp.int32), v([1], jnp.int32), v([3], jnp.int32),
        xy[0][None], xy[2][None], xy[1][None], xy[3][None], jnp.ones(1),
    )
    flat_params = RelaxParams.create(quats, jnp.zeros((1, 3)), mesh_z=jnp.zeros(4))
    bent_params = RelaxParams.create(
        quats, jnp.zeros((1, 3)), mesh_z=jnp.asarray([0.0, 2.0, 0.0, 2.0])
    )
    assert float(lm.block_cost(flat_params, smooth)) < 1e-25
    assert float(lm.block_cost(bent_params, smooth)) > 1e-10


def test_monotonicity_cost():
    layout = TangentLayout(1, 0, 0, 1)
    params = RelaxParams.create(
        DOWN[None], jnp.zeros((1, 3)), radial=jnp.asarray([[-3.0, 0.0, 0.0]])
    )
    blk = B.monotonicity_block(
        layout, jnp.zeros(1, jnp.int32), jnp.ones(1), jnp.ones(1), jnp.ones(1)
    )
    # k1 = -3 makes the derivative negative at r ~ 1 -> positive cost
    assert float(lm.block_cost(params, blk)) > 0
    params2 = RelaxParams.create(DOWN[None], jnp.zeros((1, 3)))
    blk2 = B.monotonicity_block(
        layout, jnp.zeros(1, jnp.int32), jnp.ones(1), jnp.ones(1), jnp.ones(1)
    )
    assert float(lm.block_cost(params2, blk2)) == 0.0


def test_frozen_rotation_stays_fixed():
    """Boundary-node freezing (RelaxGroup halo, optimize=false)."""
    ground_ori, ground_pos, model = make_scene()
    noise = quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.asarray(0.1))
    noisy = ground_ori.at[1].set(quat_multiply(ground_ori[1], noise))
    layout = TangentLayout(3, 0, 0, 1)
    params = RelaxParams.create(noisy, ground_pos)
    ci, cj, rq, rt, rs, rv = relative_pose_edges(ground_ori, ground_pos)
    blk = B.decomposed_rotation_block(layout, ci, cj, rq, rt, rs, rv, jnp.ones(3))
    free = layout.build_free_mask(rot_free=jnp.asarray([False, True, False]))
    solved, _ = lm.solve(params, [blk], layout, free)
    # frozen cameras unchanged (up to the retraction's renormalization)
    np.testing.assert_allclose(
        np.asarray(solved.quats[0]), np.asarray(noisy[0]), atol=1e-14
    )
    np.testing.assert_allclose(
        np.asarray(solved.quats[2]), np.asarray(noisy[2]), atol=1e-14
    )
    # free camera recovered
    assert ori_errors(solved.quats[1][None], ground_ori[1][None]).max() < 1e-4
