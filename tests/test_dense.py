"""Dense stereo densification test on the calibrated synthetic survey
(the pattern of reference test/test_dense.cpp)."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def calibrated(calibrated_pipeline_session):
    return calibrated_pipeline_session


def test_densify_appends_consistent_points(calibrated):
    from opencalibration_tpu.dense.dense_stereo import densify_mesh

    p = calibrated
    n_clouds_before = len(p.surfaces[0].cloud)
    n = densify_mesh(p.graph, p.model_store, p.surfaces)
    assert n > 50, f"only {n} densified points"
    assert len(p.surfaces[0].cloud) == n_clouds_before + 1
    pts = p.surfaces[0].cloud[-1]
    # densified points lie near the true ground plane z=0
    assert abs(np.median(pts[:, 2])) < 2.0
    assert np.percentile(np.abs(pts[:, 2]), 90) < 5.0
    # and inside the survey footprint
    assert pts[:, 0].min() > -50 and pts[:, 0].max() < 200
