"""Multi-ray track construction tests (reference addMultiRayTrackCosts,
relax_problem.cpp:608-929)."""

import numpy as np
import pytest

import jax.numpy as jnp

from opencalibration_tpu.ops.distort import image_from_3d_world
from opencalibration_tpu.ops.quaternion import quat_from_axis_angle
from opencalibration_tpu.relax.tracks import build_multiray_tracks
from opencalibration_tpu.surface.mesh import TriMesh
from opencalibration_tpu.types.camera import CameraModel
from opencalibration_tpu.types.graph import (
    CameraRelations,
    FeatureSet,
    ImageNode,
    MeasurementGraph,
)

DOWN = np.array([0.0, 1.0, 0.0, 0.0])


def make_tracked_graph():
    """3 nadir cameras all observing the same 5 ground points; edges 0-1,
    1-2, 0-2 share feature indices -> 5 three-ray tracks."""
    model = CameraModel.create(
        400.0, (160.0, 120.0), pixels_cols=320, pixels_rows=240, dtype=jnp.float64
    )
    positions = np.array([[0.0, 0, 50], [15.0, 0, 50], [7.0, 12, 50]])
    points = np.array(
        [[5.0, 4, 0], [8.0, 6, 0], [3.0, 8, 0], [10.0, 2, 0], [6.0, 10, 0]]
    )
    graph = MeasurementGraph(seed=3)
    ids = []
    for i in range(3):
        pix = np.stack(
            [
                np.asarray(
                    image_from_3d_world(
                        jnp.asarray(p), model, jnp.asarray(positions[i]),
                        jnp.asarray(DOWN),
                    )
                )
                for p in points
            ]
        )
        node = ImageNode(path=f"i{i}.jpg")
        node.model_id = 1
        node.position = positions[i]
        node.orientation = DOWN.copy()
        node.features = FeatureSet(
            xy=pix, strength=np.ones(5, np.float32),
            descriptors=np.zeros((5, 16), np.uint32), valid=np.ones(5, bool),
        )
        ids.append(graph.add_node(node))
    edge_ids = []
    for a, b in ((0, 1), (1, 2), (0, 2)):
        rel = CameraRelations(
            inlier_idx1=np.arange(5, dtype=np.int32),
            inlier_idx2=np.arange(5, dtype=np.int32),
            inlier_pixel1=graph.get_node(ids[a]).payload.features.xy,
            inlier_pixel2=graph.get_node(ids[b]).payload.features.xy,
            inlier_match_index=np.arange(5, dtype=np.int32),
        )
        edge_ids.append(graph.add_edge(rel, ids[a], ids[b]))
    return graph, ids, edge_ids, model, positions


def test_three_ray_tracks_built():
    graph, ids, edge_ids, model, positions = make_tracked_graph()
    cam_index = {nid: i for i, nid in enumerate(ids)}
    node_model = {nid: 1 for nid in ids}
    mesh = TriMesh(
        np.array([[-50.0, -50, 0], [80.0, -50, 0], [10.0, 80, 0]]),
        np.array([[0, 1, 2]], np.int32),
    )
    quats = np.tile(DOWN, (3, 1))
    rows, used, covered = build_multiray_tracks(
        graph, cam_index, node_model, {1: model}, quats, positions, mesh,
        edge_ids, grid_fraction=0.15,
    )
    assert rows, "no tracks built"
    # 5 points each seen by 3 cameras -> up to 5 tracks (grid filter may
    # merge same-cell tracks, keep at least 2)
    assert len(rows["vert_idx"]) >= 2
    # every track has exactly 3 valid rays covering all 3 cameras
    for rv, cams in zip(rows["ray_valid"], rows["cam_idx"]):
        assert rv.sum() == 3
        assert set(cams[rv]) == {0, 1, 2}
    # used measurements marked so the 2-ray fallback skips them
    assert len(used) >= 6
    assert set(covered) <= set(ids)


def test_two_view_only_tracks_rejected():
    """Tracks spanning only 2 images don't meet MIN_TRACK_RAYS."""
    graph, ids, edge_ids, model, positions = make_tracked_graph()
    cam_index = {nid: i for i, nid in enumerate(ids)}
    node_model = {nid: 1 for nid in ids}
    mesh = TriMesh(
        np.array([[-50.0, -50, 0], [80.0, -50, 0], [10.0, 80, 0]]),
        np.array([[0, 1, 2]], np.int32),
    )
    quats = np.tile(DOWN, (3, 1))
    rows, used, covered = build_multiray_tracks(
        graph, cam_index, node_model, {1: model}, quats, positions, mesh,
        edge_ids[:1],  # only edge 0-1 -> all tracks are 2-view
        grid_fraction=0.15,
    )
    assert rows == {}
    assert used == set()
