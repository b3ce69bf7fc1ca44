"""Serialization / checkpoint round-trip tests (the pattern of reference
test/test_serialize_deserialize.cpp and test_checkpoint.cpp: full equality
through the rich operator== on every type)."""

import json

import numpy as np
import pytest

from opencalibration_tpu.geo.geo_coord import GeoCoord
from opencalibration_tpu.io.mesh_io import (
    filter_outliers,
    load_ply,
    load_xyz,
    save_ply,
    save_xyz,
)
from opencalibration_tpu.io.serialize import (
    deserialize_graph,
    serialize_graph,
    to_visualized_geojson,
)
from opencalibration_tpu.surface.mesh import TriMesh
from opencalibration_tpu.types.camera import CameraModel
from opencalibration_tpu.types.graph import (
    CameraRelations,
    FeatureSet,
    ImageNode,
    MeasurementGraph,
    RelationType,
)


def build_graph():
    rng = np.random.default_rng(0)
    graph = MeasurementGraph(seed=1)
    ids = []
    for i in range(3):
        node = ImageNode(path=f"img_{i}.jpg")
        node.metadata.latitude = 47.0 + i * 0.001
        node.metadata.longitude = 8.0
        node.metadata.camera_make = "Syn"
        node.metadata.camera_model = "Cam"
        node.model_id = 1
        node.position = np.array([i * 10.0, 0.0, 60.0])
        node.orientation = np.array([0.0, 1.0, 0.0, 0.0])
        node.thumbnail = rng.integers(0, 255, (10, 12, 3), dtype=np.uint8)
        node.features = FeatureSet(
            xy=rng.uniform(0, 100, (20, 2)),
            strength=rng.uniform(0, 1, 20).astype(np.float32),
            descriptors=rng.integers(0, 2**32, (20, 16), dtype=np.uint32),
            valid=np.ones(20, bool),
            num_sparse=15,
        )
        ids.append(graph.add_node(node))
    rel = CameraRelations(
        match_idx1=np.arange(5, dtype=np.int32),
        match_idx2=np.arange(5, dtype=np.int32)[::-1].copy(),
        match_distance=rng.uniform(0, 0.5, 5).astype(np.float32),
        inlier_idx1=np.arange(3, dtype=np.int32),
        inlier_idx2=np.arange(3, dtype=np.int32),
        inlier_pixel1=rng.uniform(0, 100, (3, 2)),
        inlier_pixel2=rng.uniform(0, 100, (3, 2)),
        inlier_match_index=np.arange(3, dtype=np.int32),
        ransac_relation=np.eye(3),
        relation_type=RelationType.HOMOGRAPHY,
        rel_quats=np.tile([1.0, 0, 0, 0], (4, 1)),
        rel_positions=rng.normal(size=(4, 3)),
        rel_scores=np.array([10.0, 5.0, 1.0, -1.0]),
    )
    graph.add_edge(rel, ids[0], ids[1])
    models = {
        1: CameraModel.create(400.0, (160.0, 120.0), (-0.01, 0.001, 0.0), (0, 0), 320, 240)
    }
    return graph, models


def test_graph_roundtrip_equality():
    graph, models = build_graph()
    text = serialize_graph(graph, models)
    graph2, models2 = deserialize_graph(text)
    assert graph2 == graph
    assert set(models2) == set(models)
    np.testing.assert_allclose(
        np.asarray(models2[1].radial_distortion),
        np.asarray(models[1].radial_distortion),
    )
    # double roundtrip is byte-stable
    assert serialize_graph(graph2, models2) == text


def test_geojson_export():
    graph, _ = build_graph()
    geo = GeoCoord()
    geo.set_origin(47.0, 8.0)
    gj = json.loads(to_visualized_geojson(graph, geo))
    assert gj["type"] == "FeatureCollection"
    kinds = [f["geometry"]["type"] for f in gj["features"]]
    assert kinds.count("Point") == 3
    assert kinds.count("LineString") == 1


def test_ply_roundtrip(tmp_path):
    mesh = TriMesh(
        np.array([[0.0, 0, 1], [1.0, 0, 2], [1.0, 1, 3], [0.0, 1, 4]]),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    path = str(tmp_path / "m.ply")
    save_ply(path, mesh)
    m2 = load_ply(path)
    np.testing.assert_allclose(m2.vertices, mesh.vertices)
    np.testing.assert_array_equal(m2.triangles, mesh.triangles)


def test_xyz_roundtrip_and_outlier_filter(tmp_path):
    pts = np.array([[0.0, 0, 0], [1.0, 1, 0.1], [2.0, 2, -0.1], [3.0, 3, 500.0]])
    kept = filter_outliers(pts, 1.5)
    assert len(kept) == 3
    path = str(tmp_path / "c.xyz")
    save_xyz(path, pts)
    back = load_xyz(path)
    np.testing.assert_allclose(back, pts, atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from opencalibration_tpu.pipeline.pipeline import Pipeline, PipelineState
    from opencalibration_tpu.surface.mesh import TriMesh
    from opencalibration_tpu.types.graph import SurfaceModel

    p = Pipeline()
    p.graph, p.model_store = build_graph()
    p.geocoord.set_origin(47.0, 8.0)
    p.surfaces = [
        SurfaceModel(
            cloud=[np.array([[1.0, 2, 3], [4.0, 5, 6]])],
            mesh=TriMesh(
                np.array([[0.0, 0, 0], [1.0, 0, 0], [0.0, 1, 0]]),
                np.array([[0, 1, 2]], np.int32),
            ),
        )
    ]
    p.reset_state(PipelineState.FINAL_GLOBAL_RELAX, 3)
    ckpt = str(tmp_path / "ckpt")
    assert p.save_checkpoint(ckpt)

    q = Pipeline()
    assert q.load_checkpoint(ckpt)
    assert q.get_state() == PipelineState.FINAL_GLOBAL_RELAX
    assert q.state_run_count() == 3
    assert q.graph == p.graph
    assert len(q.surfaces) == 1
    np.testing.assert_allclose(
        q.surfaces[0].cloud[0], p.surfaces[0].cloud[0], atol=1e-6
    )
    np.testing.assert_allclose(
        q.surfaces[0].mesh.vertices, p.surfaces[0].mesh.vertices
    )
    lat, lon = q.geocoord.origin
    assert (lat, lon) == (47.0, 8.0)
    assert len(q.gps_positions) == 3

    # invalid dir rejected
    assert not q.load_checkpoint(str(tmp_path / "nope"))
