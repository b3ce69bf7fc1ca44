"""End-to-end pipeline test on a synthetic rendered survey (the pattern
of reference test/test_pipeline.cpp, with exact ground truth instead of
the test_data submodule)."""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module

from opencalibration_tpu.ops.quaternion import (
    quat_angle,
    quat_conjugate,
    quat_multiply,
)
from opencalibration_tpu.pipeline.pipeline import Pipeline, PipelineState
from tests.synthetic_survey import write_survey

import jax.numpy as jnp


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("survey")
    return write_survey(str(tmpdir), rows=2, cols=3)


def test_pipeline_end_to_end(survey):
    paths, positions, quats = survey
    p = Pipeline(batch_size=3)
    # a 6-image flat-terrain survey with correct EXIF intrinsics is not an
    # intrinsics-calibration dataset (2-ray costs + free plane leave the
    # Brown coefficients ill-constrained); the reference faces the same
    # physics — skip the calibration stage like its runner's skip flag.
    p.skip_camera_param_relax = True
    progress = []
    p.step_callback = lambda info: progress.append(info)
    p.add(paths)
    final = p.run_to_completion(max_iterations=100)
    assert final == PipelineState.COMPLETE

    # all images loaded as graph nodes
    assert p.graph.size_nodes() == len(paths)
    # overlapping neighbours linked
    assert p.graph.size_edges() >= len(paths) - 1
    # origin set from the first image's GPS (reference load_stage semantics),
    # so the pipeline's local frame is offset from the synthetic frame by
    # the first camera's position: compare relative geometry.
    by_path = {
        p.graph.get_node(nid).payload.path: nid for nid in p.graph.node_ids()
    }
    node0 = p.graph.get_node(by_path[paths[0]]).payload
    errs_pos, errs_ori = [], []
    for i, path in enumerate(paths):
        node = p.graph.get_node(by_path[path]).payload
        rel_recovered = node.position - node0.position
        rel_truth = positions[i] - positions[0]
        errs_pos.append(np.linalg.norm(rel_recovered - rel_truth))
        rel = quat_multiply(
            quat_conjugate(jnp.asarray(quats[i])), jnp.asarray(node.orientation)
        )
        errs_ori.append(float(quat_angle(rel)))
    assert max(errs_pos) < 0.5, errs_pos
    assert max(errs_ori) < 0.1, errs_ori  # orientations recovered to < 6 deg

    # a ground surface was estimated near z ~ 0
    assert p.surfaces and p.surfaces[0].mesh is not None
    mesh_z = p.surfaces[0].mesh.vertices[:, 2]
    assert abs(np.median(mesh_z)) < 10.0

    # progress callbacks fired with monotonic global progress
    assert progress
    gp = [i.global_progress for i in progress]
    assert all(b >= a - 1e-9 for a, b in zip(gp, gp[1:]))


def test_overlap_matches_serial_order(survey):
    """The three-stage overlap (async relax dispatch + decode threads,
    reference interleave pipeline.cpp:548-556) must be a pure scheduling
    change: INITIAL_PROCESSING with overlap on and off produces identical
    poses and edges (the reference's determinism guarantee, README.md:7)."""
    paths, _, _ = survey

    def ingest(overlap):
        p = Pipeline(batch_size=2)
        p.overlap_io = overlap
        p.add(paths)
        while p.get_state() == PipelineState.INITIAL_PROCESSING:
            p.iterate_once()
        return p

    a, b = ingest(True), ingest(False)
    assert a.graph.size_nodes() == b.graph.size_nodes()
    assert a.graph.size_edges() == b.graph.size_edges()
    key = lambda p: {p.graph.get_node(n).payload.path: n for n in p.graph.node_ids()}
    ka, kb = key(a), key(b)
    for path, na in ka.items():
        pa = a.graph.get_node(na).payload
        pb = b.graph.get_node(kb[path]).payload
        np.testing.assert_allclose(pa.position, pb.position, atol=1e-6)
        np.testing.assert_allclose(pa.orientation, pb.orientation, atol=1e-6)


def test_pipeline_skips_unreadable_files(survey, tmp_path):
    paths, _, _ = survey
    bogus = str(tmp_path / "missing.jpg")
    p = Pipeline(batch_size=4)
    p.add([paths[0], bogus, paths[1]])
    p.run_to_completion(max_iterations=50)
    assert p.graph.size_nodes() == 2  # bad file skipped gracefully


def test_pipeline_resume_guard(survey):
    p = Pipeline()
    assert p.get_state() == PipelineState.INITIAL_PROCESSING
    assert not p.resume_from_state(PipelineState.BLEND_LAYERS)  # no skip-ahead
    p.reset_state(PipelineState.FINAL_GLOBAL_RELAX, 2)
    assert p.state_run_count() == 2
    assert p.resume_from_state(PipelineState.INITIAL_GLOBAL_RELAX)  # rewind ok
    assert p.get_state() == PipelineState.INITIAL_GLOBAL_RELAX
