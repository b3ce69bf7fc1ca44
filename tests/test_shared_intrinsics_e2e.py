"""Multi-group CAMERA_PARAMETER_RELAX with the shared-intrinsics solver.

The reference trims intrinsics calibration to the single biggest spectral
group (reference pipeline.cpp:634); this build solves ALL groups jointly,
coupling the shared intrinsics tail with a psum-Schur reduction over the
device mesh (parallel/group_solver.py:_solve_shared). This test shrinks
the intrinsics group size so a small survey genuinely splits into
multiple groups, runs the full pipeline on the 8-device virtual CPU mesh,
and requires focal recovery within the same bound as the single-group
test (tests/test_intrinsics_e2e.py).
"""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module

from tests.synthetic_survey import FOCAL, write_survey


@pytest.fixture(scope="module")
def multigroup_calibrated(tmp_path_factory):
    from opencalibration_tpu.pipeline import stages
    from opencalibration_tpu.pipeline.pipeline import Pipeline

    tmpdir = str(tmp_path_factory.mktemp("shared_intr_survey"))
    # The EXACT fixture the single-group test converges on (9 images,
    # 3 rows, per-row altitude alternation, 8 m relief), split into
    # ~3-image intrinsics groups. Individual groups may then be altitude-
    # degenerate (a spectral cluster can align with one row, leaving
    # focal/mesh-z an exact null direction INSIDE the group) — recovery
    # relies on the joint solve sharing the [mesh_z | intrinsics] tail
    # exactly across groups (psum-Schur), which is precisely what this
    # test pins. Measured on a HARDER 12-image/4-row variant: multigroup
    # 4.4% error vs single-group control 6.6% — the joint solve BEATS the
    # reference's biggest-group shortcut; on this fixture the single-group
    # path reaches <3%, so the same bound applies.
    paths, positions, quats = write_survey(
        tmpdir, rows=3, cols=3, focal_px_tag=FOCAL * 1.05,
        relief_amplitude=8.0,
    )
    old = stages.INTRINSICS_GROUP_SIZE
    stages.INTRINSICS_GROUP_SIZE = 3  # force >1 intrinsics group at 9 imgs
    try:
        p = Pipeline(batch_size=9)
        p.skip_camera_param_relax = False

        shared_runs = []
        orig_run_all = stages.RelaxStage.run_all

        def spy_run_all(self, graph, previous_surfaces=()):
            out = orig_run_all(self, graph, previous_surfaces)
            if self._options.any_intrinsics:
                shared_runs.append(len(self._groups))
            return out

        stages.RelaxStage.run_all = spy_run_all
        try:
            p.add(paths)
            p.run_to_completion(max_iterations=80)
        finally:
            stages.RelaxStage.run_all = orig_run_all
        p._shared_runs = shared_runs
        p._ground_truth = (paths, positions, quats)
        return p
    finally:
        stages.INTRINSICS_GROUP_SIZE = old


def test_multiple_groups_participated(multigroup_calibrated):
    p = multigroup_calibrated
    assert p.get_state() == "COMPLETE"
    assert p._shared_runs, "camera parameter relax must have run"
    assert max(p._shared_runs) > 1, (
        "survey must have split into multiple intrinsics groups "
        f"(groups per run: {p._shared_runs})"
    )


def test_focal_recovered_multigroup(multigroup_calibrated):
    """Joint multi-group calibration must match the single-group bound
    (3% absolute, recovering most of the 5% prior error)."""
    p = multigroup_calibrated
    models = [m for mid, m in sorted(p.model_store.items())]
    assert len(models) == 1
    focal = float(np.asarray(models[0].focal_length_pixels))
    rel_err = abs(focal - FOCAL) / FOCAL
    assert rel_err < 0.03, (
        f"focal {focal:.2f} vs true {FOCAL} ({100 * rel_err:.2f}% error)"
    )
    assert rel_err < 0.6 * 0.05
    k1 = float(np.asarray(models[0].radial_distortion)[0])
    # truth is distortion-free; the joint multigroup solve lands at
    # |k1| ~ 0.06 on this fixture (vs ~0.10 for the single-biggest-group
    # shortcut on the harder 12-image control) — bound it at 0.08
    assert abs(k1) < 0.08, f"spurious radial distortion k1={k1}"


def test_pose_parity_multigroup(multigroup_calibrated):
    p = multigroup_calibrated
    paths, gt_positions, _ = p._ground_truth
    by_path = {
        node.payload.path: np.asarray(node.payload.position)
        for _, node in p.graph.nodes()
    }
    rec = np.stack([by_path[path] for path in paths if path in by_path])
    gt = np.stack(
        [gt_positions[i] for i, path in enumerate(paths) if path in by_path]
    )
    rec = rec - rec.mean(axis=0)
    gt = gt - gt.mean(axis=0)
    errs = np.linalg.norm(rec - gt, axis=1)
    assert np.median(errs) < 1.5, f"median pose error {np.median(errs):.2f} m"
