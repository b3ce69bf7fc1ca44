"""Parity tests for the batched multi-group relax solver.

The batched (vmapped, optionally mesh-sharded) path must produce the same
poses as the serial per-group lm.solve loop — the contract VERDICT round-1
item 2 asks for: groups solve in O(1) dispatches on the 8-device CPU mesh
with pose parity against the serial path."""


import copy

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module

import jax

from opencalibration_tpu.pipeline import stages as S
from opencalibration_tpu.relax.problem_builder import RelaxOptions


def _run_stage(pipeline, use_batched, group_size, monkeypatch,
               options=None, devices=None):
    """Re-init a RelaxStage over the calibrated graph and run it (without
    finalize, so the shared graph is never mutated). Returns
    {node_id: (orientation, position)} from the group working sets."""
    monkeypatch.setattr(S, "POSE_GROUP_SIZE", group_size)
    monkeypatch.setattr(S, "INTRINSICS_GROUP_SIZE", group_size)
    stage = S.RelaxStage(use_batched_solver=use_batched)
    opts = options or RelaxOptions(ground_mesh=True, minimal_mesh=False)
    stage.init(
        pipeline.graph, [], pipeline.gps_positions, pipeline.model_store,
        relax_all=True, disable_parallelism=False, options=opts,
    )
    n_groups = len(stage._groups)
    if devices is not None and use_batched:
        # route through solve_group_batch with an explicit device list
        pass
    stage.run_all(pipeline.graph, pipeline.surfaces)
    out = {}
    for g in stage._groups:
        for pose in g.poses:
            out[pose.node_id] = (
                np.asarray(pose.orientation).copy(),
                np.asarray(pose.position).copy(),
            )
    return out, n_groups


def test_batched_matches_serial_multigroup(
    calibrated_pipeline_session, monkeypatch
):
    p = calibrated_pipeline_session
    serial, n_serial = _run_stage(p, False, 2, monkeypatch)
    batched, n_batched = _run_stage(p, True, 2, monkeypatch)
    assert n_serial == n_batched and n_serial >= 2, (
        f"expected multiple groups, got {n_serial}"
    )
    assert len(jax.devices()) == 8  # conftest's virtual CPU mesh: the
    # batched path shards groups over all 8 devices automatically
    assert serial.keys() == batched.keys()
    for nid in serial:
        qs, ps = serial[nid]
        qb, pb = batched[nid]
        # quaternion sign ambiguity
        if np.dot(qs, qb) < 0:
            qb = -qb
        np.testing.assert_allclose(qb, qs, atol=5e-5, err_msg=f"node {nid}")
        np.testing.assert_allclose(pb, ps, atol=1e-9)


def test_batched_matches_serial_single_group(
    calibrated_pipeline_session, monkeypatch
):
    p = calibrated_pipeline_session
    serial, _ = _run_stage(p, False, 50, monkeypatch)
    batched, n = _run_stage(p, True, 50, monkeypatch)
    assert n == 1
    for nid in serial:
        qs, _ = serial[nid]
        qb, _ = batched[nid]
        if np.dot(qs, qb) < 0:
            qb = -qb
        np.testing.assert_allclose(qb, qs, atol=5e-5)


def test_batched_decomposition_problem(calibrated_pipeline_session, monkeypatch):
    """The rotation-only decomposition problem (no mesh/points) must also
    batch: different block families, no surface pre-solve."""
    p = calibrated_pipeline_session
    opts = RelaxOptions(orientation=True)
    serial, _ = _run_stage(p, False, 2, monkeypatch, options=opts)
    batched, n = _run_stage(p, True, 2, monkeypatch, options=opts)
    assert n >= 2
    for nid in serial:
        qs, _ = serial[nid]
        qb, _ = batched[nid]
        if np.dot(qs, qb) < 0:
            qb = -qb
        np.testing.assert_allclose(qb, qs, atol=5e-5)


def test_group_batch_padding_machinery():
    """Slot/mask translation between layouts is a pure reindexing."""
    from opencalibration_tpu.parallel.group_solver import (
        _translate_mask,
        _translate_slots,
    )
    from opencalibration_tpu.relax.tangent import TangentLayout

    old = TangentLayout(C=2, V=3, P=1, M=1)
    new = TangentLayout(C=4, V=8, P=2, M=1)
    # rot slot of cam 1 -> same cam in new layout
    assert _translate_slots(np.array([3]), old, new)[0] == 3
    # first mesh slot
    assert _translate_slots(np.array([old.mesh_off]), old, new)[0] == new.mesh_off
    # focal slot
    assert (
        _translate_slots(np.array([old.focal_off]), old, new)[0]
        == new.focal_off
    )
    m = np.zeros(old.dim, bool)
    m[old.mesh_off + 2] = True
    m[old.focal_off] = True
    out = _translate_mask(m, old, new)
    assert out[new.mesh_off + 2] and out[new.focal_off]
    assert out.sum() == 2


def _synthetic_builts(G=4, C=3, P_pts=9):
    """Wrap sharded_ba's synthetic groups as BuiltProblems sharing model 7."""
    from opencalibration_tpu.parallel.sharded_ba import make_synthetic_groups
    from opencalibration_tpu.relax import blocks as B
    from opencalibration_tpu.relax.problem_builder import BuiltProblem

    params, tpl, pixels, free, layout = make_synthetic_groups(G, C=C, P_pts=P_pts)
    builts = []
    for g in range(G):
        pg = jax.tree.map(lambda x: x[g], params)
        blk = B.BlockSpec(
            slots=tpl.slots,
            data=dict(tpl.data, pixel=pixels[g]),
            weight=tpl.weight,
            resid_one=tpl.resid_one,
            num_residuals=tpl.num_residuals,
            huber_delta=tpl.huber_delta,
            name=tpl.name,
        )
        builts.append(
            BuiltProblem(
                params=pg, layout=layout, blocks=[blk], free_mask=free,
                surface_free_mask=np.zeros(layout.dim, bool), cam_index={},
                model_index={7: 0}, mesh=None, inverse_models=False,
                track_points=np.zeros((0, 3)), track_errors=np.zeros(0),
            )
        )
    return builts, layout


def _joint_solve(builts, layout, max_iterations):
    """Reference: one dense LM over the concatenated joint problem."""
    import jax.numpy as jnp

    from opencalibration_tpu.relax import blocks as B
    from opencalibration_tpu.relax import lm
    from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout

    G = len(builts)
    C = builts[0].params.C
    P = builts[0].params.P
    joint_layout = TangentLayout(G * C, 0, G * P, 1)
    p0 = builts[0].params
    joint = RelaxParams(
        quats=jnp.concatenate([b.params.quats for b in builts]),
        positions=jnp.concatenate([b.params.positions for b in builts]),
        mesh_z=p0.mesh_z,
        points=jnp.concatenate([b.params.points for b in builts]),
        focal=p0.focal, principal=p0.principal, radial=p0.radial,
        tangential=p0.tangential,
    )
    cam_i = jnp.concatenate(
        [b.blocks[0].data["cam_i"] + g * C for g, b in enumerate(builts)]
    )
    point_i = jnp.concatenate(
        [b.blocks[0].data["point_i"] + g * P for g, b in enumerate(builts)]
    )
    model_i = jnp.concatenate([b.blocks[0].data["model_i"] for b in builts])
    pixel = jnp.concatenate([b.blocks[0].data["pixel"] for b in builts])
    weight = jnp.concatenate([b.blocks[0].weight for b in builts])
    blk = B.pixel_error_block(joint_layout, cam_i, point_i, model_i, pixel, weight)
    free = joint_layout.build_free_mask(points_free=True, focal_free=True)
    solved, info = lm.solve(
        joint, [blk], joint_layout, free, max_iterations=max_iterations
    )
    return solved, info


def test_shared_intrinsics_solver_matches_joint():
    """psum-Schur shared-intrinsics solve over real BuiltProblems == one
    dense joint solve: identical focal recovery, matching trajectories."""
    from opencalibration_tpu.parallel.group_solver import (
        build_group_batch,
        extract_group_params,
        solve_group_batch_shared,
    )

    builts, layout = _synthetic_builts(G=4)
    joint, _ = _joint_solve(builts, layout, max_iterations=40)
    focal_joint = float(joint.focal[0])

    batch = build_group_batch(builts, shared_intrinsics=True)
    assert batch.shared_intrinsics and batch.layout.M == 1
    solved, info = solve_group_batch_shared(batch, pre_solve=False,
                                            max_iterations=40)
    g0 = extract_group_params(batch, solved, 0)
    focal_shared = float(g0.focal[0])

    # both recover the true focal (600; initial guess 612)
    assert abs(focal_joint - 600.0) < 1.0, focal_joint
    assert abs(focal_shared - 600.0) < 1.0, focal_shared
    # and agree with each other tightly
    assert abs(focal_shared - focal_joint) < 0.2
    # shared tail is identical across every group
    for g in range(1, 4):
        gg = extract_group_params(batch, solved, g)
        np.testing.assert_allclose(
            np.asarray(gg.focal), np.asarray(g0.focal), rtol=0, atol=0
        )
    assert np.isfinite(float(jax.tree.leaves(info.final_cost)[0].ravel()[0]))


def test_shared_solver_chunked_assembly(monkeypatch):
    """Regression: with blocks larger than lm._ASSEMBLE_CHUNK the normal
    equations accumulate through a lax.scan; inside shard_map the carry
    must not start replicated while the body adds varying data (jax vma
    check raised `carry[0] ... {V:groups}` at the 1k-image scale)."""
    from opencalibration_tpu.parallel.group_solver import (
        build_group_batch,
        extract_group_params,
        solve_group_batch_shared,
    )
    from opencalibration_tpu.relax import lm

    # force the scan path at test scale (default chunk is 2048)
    monkeypatch.setattr(lm, "_ASSEMBLE_CHUNK", 8)

    builts, _ = _synthetic_builts(G=4)
    batch = build_group_batch(builts, shared_intrinsics=True)
    solved, info = solve_group_batch_shared(
        batch, pre_solve=False, max_iterations=25
    )
    g0 = extract_group_params(batch, solved, 0)
    assert abs(float(g0.focal[0]) - 600.0) < 2.0


def test_shared_solver_per_group_trust_region():
    """One ill-conditioned group (consistent measurements, far-off init —
    its early steps reject) must not stop the healthy groups from
    converging within the iteration budget: local damping is per-group,
    only the shared Schur tail carries a global lambda."""
    import dataclasses

    from opencalibration_tpu.parallel.group_solver import (
        build_group_batch,
        extract_group_params,
        solve_group_batch_shared,
    )

    builts, layout = _synthetic_builts(G=4)
    # group 0: measurements stay self-consistent (no bias on the shared
    # focal) but the initial guess is far off -> huge initial cost and
    # rejected first steps, the case where one global lambda throttles
    # every group
    builts[0] = dataclasses.replace(
        builts[0],
        params=dataclasses.replace(
            builts[0].params, positions=builts[0].params.positions + 25.0
        ),
    )

    batch = build_group_batch(builts, shared_intrinsics=True)
    solved, info = solve_group_batch_shared(
        batch, pre_solve=False, max_iterations=60
    )
    # the joint problem still converges to a near-zero cost (measured:
    # 1.05e5 -> 1.8 in 60 iterations; a throttled trust region stalls far
    # from that) and the shared focal lands near truth
    final_cost = float(np.ravel(jax.tree.leaves(info.final_cost)[0])[0])
    assert final_cost < 10.0, final_cost
    focal = float(extract_group_params(batch, solved, 1).focal[0])
    assert abs(focal - 600.0) < 5.0, focal


def test_single_device_serial_matches_batched(
    calibrated_pipeline_session, monkeypatch
):
    """On one chip solve_group_batch dispatches groups serially through a
    shared single-group compile; results must equal the sharded path."""
    from opencalibration_tpu.parallel.group_solver import (
        build_group_batch,
        solve_group_batch,
    )
    from opencalibration_tpu.relax.relax import build_problem
    from opencalibration_tpu.types.graph import NodePose

    p = calibrated_pipeline_session
    monkeypatch.setattr(S, "POSE_GROUP_SIZE", 2)
    stage = S.RelaxStage(use_batched_solver=True)
    stage.init(
        p.graph, [], p.gps_positions, p.model_store,
        relax_all=True, disable_parallelism=False,
        options=RelaxOptions(ground_mesh=True, minimal_mesh=False),
    )
    builts = []
    for g in stage._groups:
        built, _ = build_problem(
            p.graph, g.poses, g.cam_models, g.edge_ids,
            RelaxOptions(ground_mesh=True, minimal_mesh=False), p.surfaces,
        )
        if built is not None:
            builts.append(built)
    assert len(builts) >= 2
    batch = build_group_batch(builts)
    s_all, _ = solve_group_batch(batch, pre_solve=True)
    s_one, _ = solve_group_batch(
        batch, pre_solve=True, devices=[jax.devices()[0]]
    )
    qa = np.asarray(s_all.quats)
    qb = np.asarray(s_one.quats)
    flip = np.sign(np.sum(qa * qb, axis=-1, keepdims=True))
    # the two paths run DIFFERENT XLA programs (sharded lanes vs
    # bucket-padded serial dispatch): reduction orders differ, and over
    # 40 gain-ratio LM iterations the float drift is a few 1e-5 in quat
    # components (~0.005 deg) depending on the fixture data. 1e-4 keeps
    # the check tight enough to catch any real dispatch-path logic bug
    # (frozen-pad leaks etc. produce >1e-2) without pinning bitwise
    # accumulation order.
    np.testing.assert_allclose(qb * flip, qa, atol=1e-4)


def test_chunked_dispatch_matches_unchunked(monkeypatch):
    """OC_TPU_MAX_GROUPS_PER_DISPATCH splits the single-chip batched solve
    into several sequential dispatches (HBM relief at 10k-image scale);
    results must be bit-compatible with the one-dispatch path."""
    from opencalibration_tpu.parallel.group_solver import (
        build_group_batch,
        solve_group_batch,
    )

    builts, _ = _synthetic_builts(G=5)
    dev = [jax.devices()[0]]
    batch = build_group_batch(builts)
    monkeypatch.delenv("OC_TPU_MAX_GROUPS_PER_DISPATCH", raising=False)
    s_full, i_full = solve_group_batch(batch, pre_solve=False, devices=dev)
    batch2 = build_group_batch(builts)
    monkeypatch.setenv("OC_TPU_MAX_GROUPS_PER_DISPATCH", "2")
    s_chunk, i_chunk = solve_group_batch(batch2, pre_solve=False, devices=dev)
    np.testing.assert_allclose(
        np.asarray(s_chunk.quats), np.asarray(s_full.quats), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(s_chunk.focal), np.asarray(s_full.focal), atol=1e-7
    )
    np.testing.assert_array_equal(
        np.asarray(i_chunk.iterations), np.asarray(i_full.iterations)
    )
