"""Matrix-free PCG linear solver for LM (lm.linear_solver='cg').

The scalable counterpart of the dense normal-equation path for large
tangent dimensions (global ground-mesh relax: T = 3C + V grows with both
survey and mesh size; the reference's answer is Ceres SPARSE_SCHUR /
ITERATIVE_SCHUR, relax_problem.cpp:122-145). These tests pin:

* the matrix-free operator (matvec / diag / grad) is EXACTLY the one-hot
  dense assembly's H, diag(H) and g;
* the cg-driven LM recovers the same solutions as the cholesky path on
  the ground-mesh fixture;
* frozen slots never move.
"""

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops.distort import image_to_3d
from opencalibration_tpu.ops.quaternion import quat_from_axis_angle, quat_multiply
from opencalibration_tpu.relax import blocks as B
from opencalibration_tpu.relax import lm
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout

from tests.test_relax import (
    make_scene,
    ori_errors,
    planar_points,
    project_all,
)


def _mesh_problem():
    """The ground-plane mesh fixture from test_relax, as (params, blocks,
    layout, free, surf_only)."""
    ground_ori, ground_pos, model = make_scene()
    pts = planar_points()
    pixels = project_all(pts, ground_ori, ground_pos, model)
    P = pts.shape[0]

    tri_xy = jnp.asarray([[-40.0, -40.0], [60.0, -40.0], [10.0, 60.0]])
    mesh_z0 = jnp.asarray([-5.0, -5.0, -5.0])

    layout = TangentLayout(3, 3, 0, 1)
    noise = [
        quat_from_axis_angle(jnp.array([0.0, 1, 0]), jnp.asarray(0.03)),
        quat_from_axis_angle(jnp.array([0.0, 0, 1]), jnp.asarray(-0.03)),
        quat_from_axis_angle(jnp.array([1.0, 0, 0]), jnp.asarray(0.02)),
    ]
    noisy_ori = jnp.stack(
        [quat_multiply(ground_ori[i], noise[i]) for i in range(3)]
    )
    params = RelaxParams.create(noisy_ori, ground_pos, mesh_z=mesh_z0)

    dirs = [
        jax.vmap(lambda px: image_to_3d(px, model))(pixels[i])
        for i in range(3)
    ]
    cam_idx_list, valid_list, dir_list = [], [], []
    for a, b in ((0, 1), (1, 2), (0, 2)):
        cam_idx_list.append(
            jnp.tile(jnp.asarray([a, b, 0, 0, 0], jnp.int32), (P, 1))
        )
        valid_list.append(
            jnp.tile(jnp.asarray([True, True, False, False, False]), (P, 1))
        )
        dir_list.append(
            jnp.stack([dirs[a], dirs[b], dirs[0], dirs[0], dirs[0]], axis=1)
        )
    cam_idx = jnp.concatenate(cam_idx_list)
    ray_valid = jnp.concatenate(valid_list)
    fixed_dir = jnp.concatenate(dir_list)
    NB = cam_idx.shape[0]
    vert_idx = jnp.tile(jnp.asarray([0, 1, 2], jnp.int32), (NB, 1))
    blk = B.plane_ray_block(
        layout, vert_idx, jnp.tile(tri_xy, (NB, 1, 1)), cam_idx, ray_valid,
        jnp.ones(NB), fixed_dir=fixed_dir,
    )
    down = B.downwards_prior_block(layout, jnp.arange(3), jnp.ones(3))
    free = layout.build_free_mask(mesh_free=True)
    surf_only = layout.build_free_mask(
        rot_free=jnp.zeros(3, bool), mesh_free=True
    )
    return ground_ori, params, (blk, down), layout, free, surf_only


def test_matrixfree_operator_matches_dense_assembly():
    """_gn_matvec / _gn_diag / _gn_grad == dense H@v / diag(H) / g."""
    _, params, blocks, layout, free, _ = _mesh_problem()
    free = jnp.asarray(free)
    T = layout.dim
    H, g = lm.normal_equations(params, blocks, layout, free)

    quads = lm._quads_all(params, blocks, free)
    perm, sorted_ids = lm._flat_slot_order(blocks, T)
    g_mf = lm._gn_grad(quads, blocks, perm, sorted_ids, T)
    diag_mf = lm._gn_diag(quads, blocks, perm, sorted_ids, T)
    np.testing.assert_allclose(
        np.asarray(g_mf), np.asarray(g), rtol=1e-5, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(diag_mf), np.asarray(jnp.diag(H)), rtol=1e-5, atol=1e-7
    )
    rng = np.random.default_rng(0)
    for _ in range(3):
        v = jnp.asarray(rng.normal(size=T), H.dtype)
        hv = lm._gn_matvec(v, quads, blocks, perm, sorted_ids, T)
        np.testing.assert_allclose(
            np.asarray(hv), np.asarray(H @ v),
            rtol=1e-4, atol=1e-5 * float(jnp.abs(H).max()),
        )


def test_block_jacobi_preconditioner_matches_dense_blocks():
    """_bj_build's apply == blockwise inverse of the block-diagonal of
    (H + diag(damp)): 3x3 per camera rotation, scalar mesh-z, one dense
    intrinsics-tail block — the SCHUR_JACOBI-style preconditioner is
    exactly the block diagonal of the assembled system."""
    _, params, blocks, layout, free, _ = _mesh_problem()
    free = jnp.asarray(free)
    T = layout.dim
    H, _ = lm.normal_equations(params, blocks, layout, free)
    quads = lm._quads_all(params, blocks, free)
    lam = 1e-3
    diag = jnp.clip(jnp.diag(H), 1e-10, 1e32)
    damp = lam * diag + (~free).astype(H.dtype)
    pre = lm._bj_build(quads, blocks, layout, damp, diag)

    A = np.asarray(H, np.float64) + np.diag(np.asarray(damp, np.float64))
    Minv = np.zeros_like(A)
    for c in range(layout.C):
        sl = slice(3 * c, 3 * c + 3)
        Minv[sl, sl] = np.linalg.inv(A[sl, sl] + 1e-10 * np.eye(3))
    for v in range(layout.V):
        i = layout.mesh_off + v
        Minv[i, i] = 1.0 / np.clip(A[i, i], 1e-20, None)
    tl = slice(layout.focal_off, T)
    Minv[tl, tl] = np.linalg.inv(
        A[tl, tl] + 1e-10 * np.eye(T - layout.focal_off)
    )
    rng = np.random.default_rng(1)
    for _ in range(3):
        r = jnp.asarray(rng.normal(size=T), H.dtype)
        z = np.asarray(pre(r), np.float64)
        want = Minv @ np.asarray(r, np.float64)
        np.testing.assert_allclose(
            z, want, rtol=2e-3, atol=1e-5 * np.abs(want).max()
        )


def test_block_jacobi_covers_point_slots():
    """The P > 0 branch: per-point 3x3 blocks invert correctly in a
    points-problem layout (reference solves these with SPARSE_SCHUR,
    relax_problem.cpp:122-145 — the block-diagonal point structure is
    exactly what the preconditioner exploits)."""
    layout = TangentLayout(2, 0, 4, 1)
    rng = np.random.default_rng(3)
    params = RelaxParams.create(
        jnp.asarray(
            np.tile([0.0, 1.0, 0.0, 0.0], (2, 1)), jnp.float32
        ),
        jnp.asarray(rng.normal(size=(2, 3)), jnp.float32),
        points=jnp.asarray(rng.normal(size=(4, 3)) * 5.0, jnp.float32),
        focal=jnp.asarray([600.0]),
        principal=jnp.asarray([[400.0, 300.0]]),
    )
    NB = 8
    blk = B.pixel_error_block(
        layout,
        cam_i=jnp.asarray(rng.integers(0, 2, NB), jnp.int32),
        point_i=jnp.asarray(rng.integers(0, 4, NB), jnp.int32),
        model_i=jnp.zeros(NB, jnp.int32),
        pixel=jnp.asarray(rng.normal(size=(NB, 2)) * 50.0 + 300.0, jnp.float32),
        weight=jnp.ones(NB, jnp.float32),
    )
    blocks = (blk,)
    free = jnp.asarray(layout.build_free_mask(points_free=True))
    T = layout.dim
    H, _ = lm.normal_equations(params, blocks, layout, free)
    quads = lm._quads_all(params, blocks, free)
    diag = jnp.clip(jnp.diag(H), 1e-10, 1e32)
    damp = 1e-2 * diag + (~free).astype(H.dtype)
    pre = lm._bj_build(quads, blocks, layout, damp, diag)

    A = np.asarray(H, np.float64) + np.diag(np.asarray(damp, np.float64))
    r = jnp.asarray(np.arange(T, dtype=np.float32) % 5 - 2.0)
    z = np.asarray(pre(r), np.float64)
    for p in range(4):
        sl = slice(layout.point_off + 3 * p, layout.point_off + 3 * p + 3)
        want = np.linalg.solve(
            A[sl, sl] + 1e-10 * np.eye(3), np.asarray(r, np.float64)[sl]
        )
        np.testing.assert_allclose(
            z[sl], want, rtol=2e-3, atol=1e-6 * max(np.abs(want).max(), 1.0)
        )


def test_cg_recovers_ground_mesh_like_cholesky():
    ground_ori, params, blocks, layout, free, surf_only = _mesh_problem()
    params, _ = lm.solve(
        params, blocks, layout, surf_only, linear_solver="cg"
    )
    solved, info = lm.solve(params, blocks, layout, free, linear_solver="cg")
    errs = ori_errors(solved.quats, ground_ori)
    assert errs.max() < 5e-3, errs
    np.testing.assert_allclose(np.asarray(solved.mesh_z), -10.0, atol=0.8)


def test_cg_block_precond_optin_solves():
    """cg_precond='block' (OC_TPU_CG_PRECOND=block) reaches the same
    optimum as the default scalar-Jacobi CG (same operator, different
    preconditioner)."""
    ground_ori, params, blocks, layout, free, surf_only = _mesh_problem()
    params, _ = lm.solve(
        params, blocks, layout, surf_only, linear_solver="cg",
        cg_precond="block",
    )
    solved, _ = lm.solve(
        params, blocks, layout, free, linear_solver="cg",
        cg_precond="block",
    )
    errs = ori_errors(solved.quats, ground_ori)
    assert errs.max() < 5e-3, errs
    np.testing.assert_allclose(np.asarray(solved.mesh_z), -10.0, atol=0.8)


def test_cg_frozen_slots_never_move():
    _, params, blocks, layout, _, surf_only = _mesh_problem()
    solved, _ = lm.solve(
        params, blocks, layout, surf_only, linear_solver="cg"
    )
    # unchanged up to the retraction's renormalization (matches the
    # dense-path frozen test's tolerance, test_relax.py:334)
    np.testing.assert_allclose(
        np.asarray(solved.quats), np.asarray(params.quats), atol=1e-12
    )


def test_auto_threshold_routes_by_dim():
    assert lm.CG_DIM_THRESHOLD > 512  # small problems keep exact steps
    _, params, blocks, layout, free, _ = _mesh_problem()
    # explicit override works regardless of dim
    s_ch, _ = lm.solve(params, blocks, layout, free, linear_solver="cholesky")
    s_cg, _ = lm.solve(params, blocks, layout, free, linear_solver="cg")
    # both land on the same optimum (different trajectories allowed)
    np.testing.assert_allclose(
        np.asarray(s_cg.mesh_z), np.asarray(s_ch.mesh_z), atol=0.05
    )
