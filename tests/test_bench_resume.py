"""Mid-INITIAL_PROCESSING checkpoint/resume equivalence.

The 10k BASELINE run is chained across device-tunnel failures with
bench_e2e's checkpoint + IP sidecar (tools/run_10k_chained.sh); these
tests pin the property that machinery exists to provide: a run killed
mid-IP and resumed processes exactly the same image set as an
uninterrupted run (in-flight batches roll back to the last fully
processed batch; nothing is lost or duplicated).
"""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_e2e import _resume_mid_ip, _save_ip_sidecar  # noqa: E402
from opencalibration_tpu.pipeline.pipeline import Pipeline, PipelineState


@pytest.fixture(scope="module")
def survey(tmp_path_factory):
    from tests.synthetic_survey import write_survey

    td = tmp_path_factory.mktemp("resume_survey")
    paths, positions, quats = write_survey(td, rows=2, cols=6)
    return paths, positions


def _run_ip(p, iterations):
    for _ in range(iterations):
        if p.get_state() != PipelineState.INITIAL_PROCESSING:
            break
        p.iterate_once()


def _finish_ip(p):
    for _ in range(100):
        if p.get_state() != PipelineState.INITIAL_PROCESSING:
            break
        p.iterate_once()


def _graph_paths(p):
    return sorted(node.payload.path for _, node in p.graph.nodes())


@pytest.mark.slow
def test_mid_ip_sidecar_resume_equivalent(survey, tmp_path):
    paths, _ = survey
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt, exist_ok=True)

    # uninterrupted reference run
    ref = Pipeline(batch_size=4, parallelism=2)
    ref.generate_thumbnails = False
    ref.skip_dense_mesh = True
    ref.add(paths)
    _finish_ip(ref)
    ref_paths = _graph_paths(ref)
    assert len(ref_paths) == len(paths)

    # interrupted run: 2 iterates, checkpoint + sidecar, then abandon
    p1 = Pipeline(batch_size=4, parallelism=2)
    p1.generate_thumbnails = False
    p1.skip_dense_mesh = True
    p1.add(paths)
    _run_ip(p1, 2)
    assert p1.get_state() == PipelineState.INITIAL_PROCESSING
    p1.save_checkpoint(ckpt)
    _save_ip_sidecar(p1, ckpt)

    # resumed run picks up the in-flight batches + unconsumed queue
    p2 = Pipeline(batch_size=4, parallelism=2)
    p2.generate_thumbnails = False
    p2.skip_dense_mesh = True
    assert p2.load_checkpoint(ckpt)
    _resume_mid_ip(p2, ckpt)
    _finish_ip(p2)
    assert _graph_paths(p2) == ref_paths
    # no duplicate nodes for any path
    assert len(set(_graph_paths(p2))) == len(_graph_paths(p2))


def test_stale_sidecar_ignored(survey, tmp_path):
    """A kill between save_checkpoint and the sidecar write leaves a
    NEWER graph paired with a STALE sidecar; the fingerprint must reject
    it (re-adding its 'pending' paths would duplicate image nodes)."""
    paths, _ = survey
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(ckpt, exist_ok=True)

    p1 = Pipeline(batch_size=4, parallelism=2)
    p1.generate_thumbnails = False
    p1.skip_dense_mesh = True
    p1.add(paths)
    _run_ip(p1, 2)
    p1.save_checkpoint(ckpt)
    _save_ip_sidecar(p1, ckpt)
    # advance and re-checkpoint WITHOUT refreshing the sidecar
    _run_ip(p1, 1)
    p1.save_checkpoint(ckpt)

    p2 = Pipeline(batch_size=4, parallelism=2)
    p2.generate_thumbnails = False
    p2.skip_dense_mesh = True
    assert p2.load_checkpoint(ckpt)
    before = p2.graph.size_nodes()
    _resume_mid_ip(p2, ckpt)  # must detect the mismatch and no-op
    assert p2.graph.size_nodes() == before


def test_corrupt_sidecar_survives(survey, tmp_path):
    paths, _ = survey
    ckpt = str(tmp_path / "ckpt3")
    os.makedirs(ckpt, exist_ok=True)

    p1 = Pipeline(batch_size=4, parallelism=2)
    p1.generate_thumbnails = False
    p1.skip_dense_mesh = True
    p1.add(paths)
    _run_ip(p1, 1)
    p1.save_checkpoint(ckpt)
    with open(os.path.join(ckpt, "ip_sidecar.json"), "w") as f:
        f.write('{"remaining": [truncated')  # hard-kill mid-write

    p2 = Pipeline(batch_size=4, parallelism=2)
    p2.generate_thumbnails = False
    p2.skip_dense_mesh = True
    assert p2.load_checkpoint(ckpt)
    _resume_mid_ip(p2, ckpt)  # must not raise
