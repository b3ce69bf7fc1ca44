"""Dense stereo densification test on the calibrated synthetic survey
(the pattern of reference test/test_dense.cpp)."""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module


@pytest.fixture(scope="module")
def calibrated(calibrated_pipeline_session):
    return calibrated_pipeline_session


def test_densify_appends_consistent_points(calibrated):
    """Densify consumes a SEPARATE, larger dense feature set (reference
    extract_features.cpp:62-83 split; dense_stereo.cpp:50-54), so the
    densified cloud is far denser than the sparse BA track cloud."""
    from opencalibration_tpu.dense.dense_stereo import densify_mesh

    p = calibrated
    n_clouds_before = len(p.surfaces[0].cloud)
    sparse_tracks = sum(len(c) for c in p.surfaces[0].cloud)
    n = densify_mesh(p.graph, p.model_store, p.surfaces)
    assert n > 50, f"only {n} densified points"
    assert len(p.surfaces[0].cloud) == n_clouds_before + 1
    pts = p.surfaces[0].cloud[-1]
    # dense set beats the sparse track count by a wide margin (the 320x240
    # test images only hold a few thousand features total, bounding the
    # achievable multiple; real-resolution surveys go much higher)
    assert n >= 2.5 * sparse_tracks, (
        f"dense cloud {n} should be >=2.5x sparse tracks {sparse_tracks}"
    )
    # densified points lie near the true ground plane z=0
    assert abs(np.median(pts[:, 2])) < 2.0
    assert np.percentile(np.abs(pts[:, 2]), 90) < 5.0
    # and inside the survey footprint
    assert pts[:, 0].min() > -50 and pts[:, 0].max() < 200


def test_densify_falls_back_to_sparse_features(calibrated):
    """Images missing on disk -> densify still works from the sparse sets
    (graceful degradation, reference extract_image.cpp:37-40 pattern)."""
    from opencalibration_tpu.dense.dense_stereo import densify_mesh

    p = calibrated
    before = len(p.surfaces[0].cloud)
    n = densify_mesh(
        p.graph, p.model_store, p.surfaces, use_dense_extraction=False
    )
    assert n > 50
    assert len(p.surfaces[0].cloud) == before + 1
    p.surfaces[0].cloud.pop()  # leave fixture state unchanged
