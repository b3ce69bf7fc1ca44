"""End-to-end intrinsics calibration: the CAMERA_PARAMETER_RELAX schedule
(reference pipeline.cpp:592-643) must recover a perturbed focal prior on
an altitude-varied synthetic survey, through the full option schedule,
inverse->forward model copy-back (relax_problem.cpp:1416-1419) and
RelaxGroup edge refit (relax_group.cpp:119-178)."""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module

from tests.synthetic_survey import FOCAL, write_survey


@pytest.fixture(scope="module")
def calibrated_with_bad_focal(tmp_path_factory):
    from opencalibration_tpu.pipeline.pipeline import Pipeline

    tmpdir = str(tmp_path_factory.mktemp("intrinsics_survey"))
    # 5% focal error in the geotag prior; terrain relief + altitude-varied
    # rows make focal observable in every track (flat single-altitude
    # nadir surveys leave focal/mesh-z as an exact null direction)
    paths, positions, quats = write_survey(
        tmpdir, rows=3, cols=3, focal_px_tag=FOCAL * 1.05,
        relief_amplitude=8.0,
    )
    p = Pipeline(batch_size=9)
    p.skip_camera_param_relax = False
    p.add(paths)
    p.run_to_completion(max_iterations=80)
    p._ground_truth = (paths, positions, quats)
    return p


def test_focal_recovered(calibrated_with_bad_focal):
    """The calibration must recover most of the injected 5% focal error.

    Empirical bound: on this 9-image 320x240 relief survey the schedule
    converges to ~1-3% (the focal/radial/mesh-z valley is shallow at this
    image scale); the assertions pin (a) a strict improvement over the
    prior, (b) absolute error under 3%, (c) near-zero recovered radial
    distortion (truth is distortion-free)."""
    p = calibrated_with_bad_focal
    assert p.get_state() == "COMPLETE"
    models = [m for mid, m in sorted(p.model_store.items())]
    assert len(models) == 1  # one deduped camera model
    focal = float(np.asarray(models[0].focal_length_pixels))
    rel_err = abs(focal - FOCAL) / FOCAL
    prior_err = 0.05
    assert rel_err < 0.03, (
        f"focal {focal:.2f} vs true {FOCAL} ({100 * rel_err:.2f}% error; "
        f"prior was 5% off)"
    )
    assert rel_err < 0.6 * prior_err, "must recover most of the prior error"
    k1 = float(np.asarray(models[0].radial_distortion)[0])
    assert abs(k1) < 0.05, f"spurious radial distortion k1={k1}"


def test_pose_parity_after_calibration(calibrated_with_bad_focal):
    p = calibrated_with_bad_focal
    paths, gt_positions, _ = p._ground_truth
    by_path = {
        node.payload.path: np.asarray(node.payload.position)
        for _, node in p.graph.nodes()
    }
    rec = np.stack([by_path[path] for path in paths if path in by_path])
    gt = np.stack([gt_positions[i] for i, path in enumerate(paths) if path in by_path])
    assert len(rec) == len(paths)
    # the pipeline's local frame is centered on its first GPS fix, the
    # ground truth on the survey origin: compare after removing the
    # constant offset (gauge), which GPS priors pin only to accuracy
    rec = rec - rec.mean(axis=0)
    gt = gt - gt.mean(axis=0)
    errs = np.linalg.norm(rec - gt, axis=1)
    assert np.median(errs) < 1.5, f"median pose error {np.median(errs):.2f} m"


def test_edges_refit_with_calibrated_intrinsics(calibrated_with_bad_focal):
    """After intrinsics change, every edge's homography must have been
    re-fit from its inliers (reference relax_group.cpp:119-178)."""
    p = calibrated_with_bad_focal
    n_edges = 0
    for eid, edge in p.graph.edges():
        rel = edge.payload
        H = np.asarray(rel.ransac_relation)
        if np.isfinite(H).all():
            n_edges += 1
            assert len(rel.inlier_pixel1) > 0
    assert n_edges >= 8  # 3x3 survey is well connected
