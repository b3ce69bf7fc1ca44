"""Incremental INITIAL_PROCESSING with the depth-2 connection halo.

The reference co-optimizes each new batch with its already-placed 10-NN
connected neighbours (graph_connection_depth = 2 when there is a single
group, reference relax_stage.cpp:95 + relax_group.cpp:40-66) so
incremental ingestion anchors new images to the solved survey. Without
the halo, each batch relaxes only against itself and batches drift apart.
"""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module


def _run_pipeline(paths, batch_size):
    from opencalibration_tpu.pipeline.pipeline import Pipeline

    p = Pipeline(batch_size=batch_size)
    p.skip_camera_param_relax = True
    p.skip_final_global_relax = True
    p.skip_mesh_refinement = True
    p.generate_thumbnails = False
    p.add(paths)
    for _ in range(60):
        p.iterate_once()
        if p.get_state() != "INITIAL_PROCESSING":
            break
    return p


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    from tests.synthetic_survey import write_survey

    tmp = str(tmp_path_factory.mktemp("incr"))
    return write_survey(tmp, rows=3, cols=4)


def _orientations(p, paths):
    by_path = {
        node.payload.path: np.asarray(node.payload.orientation)
        for _, node in p.graph.nodes()
    }
    return np.stack([by_path[path] for path in paths])


class TestIncrementalHalo:
    def test_batched_matches_single_batch(self, survey):
        """3-batch ingestion recovers orientations within tolerance of the
        all-at-once run (reference semantics: the halo keeps batches in
        one consistent frame)."""
        paths, positions, quats = survey
        p_all = _run_pipeline(paths, batch_size=len(paths))
        p_inc = _run_pipeline(paths, batch_size=(len(paths) + 2) // 3)

        q_all = _orientations(p_all, paths)
        q_inc = _orientations(p_inc, paths)
        assert np.isfinite(q_all).all() and np.isfinite(q_inc).all()
        # quaternion angle difference per camera (sign-invariant)
        dots = np.abs(np.sum(q_all * q_inc, axis=1))
        angles_deg = np.degrees(2 * np.arccos(np.clip(dots, -1, 1)))
        assert np.median(angles_deg) < 5.0, angles_deg
        assert angles_deg.max() < 15.0, angles_deg

    def test_halo_groups_include_prior_batch_edges(self, survey):
        """After the second batch, the relax group working set must
        contain edges whose other endpoint is in the first batch."""
        from opencalibration_tpu.pipeline.stages import RelaxStage
        from opencalibration_tpu.relax.problem_builder import RelaxOptions

        paths, _, _ = survey
        p = _run_pipeline(paths, batch_size=len(paths))

        # a "new batch" = the spatially-last 4 images; the halo must pull
        # in their already-placed connected neighbours
        by_path = {
            node.payload.path: nid for nid, node in p.graph.nodes()
        }
        batch = [by_path[path] for path in paths[-4:]]
        stage = RelaxStage()
        stage.init(
            p.graph, batch, p.gps_positions, p.model_store,
            relax_all=False, disable_parallelism=False,
            options=RelaxOptions(orientation=True, ground_plane=True),
        )
        assert stage._groups
        g = stage._groups[0]
        batch_set = set(batch)
        pose_ids = {pose.node_id for pose in g.poses}
        # halo poses beyond the batch itself
        assert pose_ids - batch_set, "depth-2 halo must add prior nodes"
        cross = [
            eid
            for eid in g.edge_ids
            if len(
                {p.graph.get_edge(eid).source, p.graph.get_edge(eid).dest}
                & batch_set
            )
            == 1
        ]
        assert cross, "halo must include batch<->prior edges"
