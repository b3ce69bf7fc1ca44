"""CLI runner smoke test: full run with every output artifact requested,
the pattern of the reference's end-to-end test target
(reference test/CMakeLists.txt:71-83 + verify_pipeline_outputs.cmake)."""


import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module


def test_pipeline_runner_outputs(tmp_path, survey_dir):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))
    import pipeline_runner

    out = tmp_path / "out"
    out.mkdir()
    rc = pipeline_runner.main(
        [
            "-i", survey_dir,
            "--batch-size", "4",
            "--camera-param-relax", "0",  # flat synthetic survey (see test_pipeline)
            "--final-relax", "1",
            "-c", str(out / "ckpt"),
            "-g", str(out / "graph.geojson"),
            "--graph-file", str(out / "graph.json"),
            "-p", str(out / "cloud.xyz"),
            "-m", str(out / "mesh.ply"),
            "-o", str(out / "ortho.tif"),
            "--dsm-file", str(out / "dsm.tif"),
            "--camera-id-file", str(out / "camera_ids.tif"),
            "-x", str(out / "textured.obj"),
            "-t", str(out / "thumb.png"),
            "--update-camera-db", str(out / "camera_db.json"),
            "-d", "2",
        ]
    )
    assert rc == 0
    # every requested artifact exists and is non-empty — the reference's
    # all-features end-to-end check (verify_pipeline_outputs.cmake:1-37
    # asserts 14 non-empty outputs after a full-featured pipeline_runner run)
    artifacts = [
        "graph.geojson", "graph.json", "cloud.xyz", "mesh.ply",
        "ortho.tif", "dsm.tif", "camera_ids.tif",
        "textured.obj", "textured.mtl", "textured.jpg",
        "thumb.png", "camera_db.json",
    ]
    for name in artifacts:
        path = out / name
        assert path.exists() and path.stat().st_size > 0, name
    assert (out / "ckpt" / "metadata.json").exists()
    assert (out / "ckpt" / "graph.json").exists()
    # 12 requested files + 2 checkpoint files = 14 verified artifacts,
    # matching the reference's count

    gj = json.loads((out / "graph.geojson").read_text())
    assert len(gj["features"]) > 0
    db = json.loads((out / "camera_db.json").read_text())
    assert db["version"] == 1 and len(db["cameras"]) >= 1

    # restore from the checkpoint and rewind (resume contract)
    rc2 = pipeline_runner.main(
        [
            "-r", str(out / "ckpt"),
            "--resume-from", "FINAL_GLOBAL_RELAX",
            "--camera-param-relax", "0",
            "-d", "1",
        ]
    )
    assert rc2 == 0


@pytest.fixture(scope="module")
def survey_dir(tmp_path_factory):
    from tests.synthetic_survey import write_survey

    tmpdir = str(tmp_path_factory.mktemp("cli_survey"))
    write_survey(tmpdir, rows=2, cols=2)
    return tmpdir
