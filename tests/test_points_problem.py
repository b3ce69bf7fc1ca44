"""3d-point relax problem end-to-end through the relax() dispatcher
(reference runPoints / setup3dPointProblem)."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencalibration_tpu.ops.quaternion import (
    quat_angle,
    quat_conjugate,
    quat_from_axis_angle,
    quat_multiply,
)
from opencalibration_tpu.relax.problem_builder import RelaxOptions
from opencalibration_tpu.relax.relax import relax
from opencalibration_tpu.types.graph import NodePose
from tests.test_tracks import DOWN, make_tracked_graph


def test_points_relax_recovers_orientations():
    graph, ids, edge_ids, model, positions = make_tracked_graph()
    # perturb orientations
    noise = [
        quat_from_axis_angle(jnp.asarray([0.0, 1, 0]), jnp.asarray(0.03)),
        quat_from_axis_angle(jnp.asarray([0.0, 0, 1]), jnp.asarray(-0.04)),
        quat_from_axis_angle(jnp.asarray([1.0, 0, 0]), jnp.asarray(0.03)),
    ]
    poses = []
    for i, nid in enumerate(ids):
        q = np.asarray(quat_multiply(jnp.asarray(DOWN), noise[i]))
        poses.append(NodePose(node_id=nid, orientation=q, position=positions[i].copy()))

    cam_models = {1: model}
    surface = relax(
        graph, poses, cam_models, edge_ids,
        RelaxOptions(orientation=True, points_3d=True),
    )
    errs = [
        float(quat_angle(quat_multiply(quat_conjugate(jnp.asarray(DOWN)), jnp.asarray(p.orientation))))
        for p in poses
    ]
    assert max(errs) < 1e-3, errs
    # optimized points returned as the surface cloud, near the true ground
    assert surface.cloud
    pts = surface.cloud[0]
    assert len(pts) >= 3
    np.testing.assert_allclose(pts[:, 2], 0.0, atol=0.1)


def test_points_relax_empty_graph():
    from opencalibration_tpu.types.graph import MeasurementGraph

    surface = relax(
        MeasurementGraph(), [], {}, [], RelaxOptions(points_3d=True)
    )
    assert surface.cloud == [] and surface.mesh is None
