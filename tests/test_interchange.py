"""Reference-format graph.json interchange (SURVEY §7 fallback plan).

Validates that features/descriptors/matches in the reference's checkpoint
schema (reference src/io/serialize_MeasurementGraph.cpp:210-608) can be
loaded and drive the match -> RANSAC -> relax stack:

* descriptor bit-packing parity: the reference packs bit j of the 486-bit
  MLDB bitset at byte j>>3, bit j&7 (bitset_to_bytes,
  serialize_MeasurementGraph.cpp:20-27); ours packs bit j at uint32 word
  j>>5, bit j&31 — LSB-first both, so bytes<->words must reinterpret
  exactly;
* a full write -> read round trip preserves features, descriptors,
  matches, inlier sets, relations and relative poses;
* a graph holding ONLY reference-format features (as if extracted by the
  reference's AKAZE) links + relaxes to the correct relative geometry.
"""

import json

import numpy as np
import pytest

from opencalibration_tpu.io.interchange import (
    DESCRIPTOR_BITS,
    _desc_from_b64,
    _desc_to_b64,
    load_reference_graph,
    save_reference_graph,
)


def _reference_pack_bits(bits: np.ndarray) -> bytes:
    """Reimplementation of the reference's bitset_to_bytes for test
    ground truth (serialize_MeasurementGraph.cpp:20-27)."""
    out = bytearray((len(bits) + 7) >> 3)
    for j, b in enumerate(bits):
        if b:
            out[j >> 3] |= 1 << (j & 7)
    return bytes(out)


def _our_pack_bits(bits: np.ndarray) -> np.ndarray:
    words = np.zeros(16, np.uint32)
    for j, b in enumerate(bits):
        if b:
            words[j >> 5] |= np.uint32(1) << np.uint32(j & 31)
    return words


class TestDescriptorPacking:
    def test_bit_layout_parity(self):
        rng = np.random.RandomState(42)
        for _ in range(5):
            bits = rng.rand(DESCRIPTOR_BITS) > 0.5
            ref_bytes = _reference_pack_bits(bits)
            words = _our_pack_bits(bits)
            import base64

            loaded = _desc_from_b64(base64.b64encode(ref_bytes).decode())
            np.testing.assert_array_equal(loaded, words)
            # and back
            assert base64.b64decode(_desc_to_b64(words)) == ref_bytes

    def test_roundtrip_hamming_identity(self):
        """Descriptors loaded from reference bytes produce zero Hamming
        distance against their originals."""
        from opencalibration_tpu.ops.hamming import hamming_matrix
        import base64
        import jax.numpy as jnp

        rng = np.random.RandomState(7)
        bits = rng.rand(4, DESCRIPTOR_BITS) > 0.5
        ours = np.stack([_our_pack_bits(b) for b in bits])
        via_ref = np.stack(
            [
                _desc_from_b64(base64.b64encode(_reference_pack_bits(b)).decode())
                for b in bits
            ]
        )
        dm = np.asarray(hamming_matrix(jnp.asarray(ours), jnp.asarray(via_ref)))
        assert np.all(np.diag(dm) == 0)


@pytest.fixture(scope="module")
def survey_graph():
    """A small calibrated survey graph with real extracted features."""
    from opencalibration_tpu.pipeline.pipeline import Pipeline
    from tests.synthetic_survey import write_survey
    import tempfile

    tmp = tempfile.mkdtemp(prefix="interchange_")
    paths, positions, quats = write_survey(tmp, rows=2, cols=2)
    p = Pipeline(batch_size=4)
    p.skip_camera_param_relax = True
    p.skip_final_global_relax = True
    p.skip_mesh_refinement = True
    p.generate_thumbnails = False
    p.add(paths)
    for _ in range(30):
        p.iterate_once()
        if p.get_state() not in ("INITIAL_PROCESSING",):
            break
    return p


class TestReferenceGraphRoundTrip:
    def test_roundtrip_preserves_everything(self, survey_graph):
        p = survey_graph
        text = save_reference_graph(p.graph, p.model_store)
        data = json.loads(text)
        assert data["version"] == 1
        g2, models2 = load_reference_graph(text)

        assert sorted(g2.node_ids()) == sorted(p.graph.node_ids())
        for nid in p.graph.node_ids():
            a = p.graph.get_node(nid).payload
            b = g2.get_node(nid).payload
            assert a.path == b.path
            np.testing.assert_allclose(b.position, a.position, atol=1e-9)
            fa, fb = a.features, b.features
            na = int(np.sum(fa.valid))
            assert int(np.sum(fb.valid)) == na
            np.testing.assert_allclose(
                fb.xy[:na], fa.xy[fa.valid][:na], atol=1e-5
            )
            np.testing.assert_array_equal(
                fb.descriptors[:na], fa.descriptors[fa.valid][:na]
            )
        assert len(list(g2.edges())) == p.graph.size_edges()
        for eid, e in p.graph.edges():
            e2 = g2.get_edge(eid)
            assert e2 is not None
            np.testing.assert_array_equal(
                e2.payload.inlier_idx1, e.payload.inlier_idx1
            )
            np.testing.assert_allclose(
                e2.payload.ransac_relation, e.payload.ransac_relation, atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(e2.payload.rel_quats),
                np.asarray(e.payload.rel_quats),
                atol=1e-12,
            )

    def test_reference_features_drive_link_and_relax(self, survey_graph):
        """Strip everything but the (reference-format round-tripped)
        features and re-run link + relax: poses must recover the survey's
        relative geometry — the SURVEY §7 fallback validation that
        match/RANSAC/BA work on reference-extracted features."""
        from opencalibration_tpu.pipeline.stages import LinkStage, RelaxStage
        from opencalibration_tpu.relax.problem_builder import RelaxOptions

        p = survey_graph
        text = save_reference_graph(p.graph, p.model_store)
        g2, models2 = load_reference_graph(text)
        # keep nodes + features only (as if deserialized from a reference
        # extraction checkpoint): drop all edges
        for eid in [eid for eid, _ in list(g2.edges())]:
            g2.remove_edge(eid)
        gps = {
            nid: np.asarray(g2.get_node(nid).payload.position[:2])
            for nid in g2.node_ids()
        }
        for nid in g2.node_ids():
            g2.get_node(nid).payload.orientation = np.full(4, np.nan)

        link = LinkStage()
        link.init(g2, gps, sorted(g2.node_ids()))
        link.run(g2, models2)
        linked = link.finalize(g2)
        assert len(linked) >= 4, "reference-format features must link"

        relax_stage = RelaxStage()
        relax_stage.init(
            g2, linked, gps, models2, relax_all=True,
            disable_parallelism=True,
            options=RelaxOptions(orientation=True, ground_plane=True),
        )
        relax_stage.run_all(g2, [])
        relax_stage.finalize(g2, models2)

        # nadir-ish survey: every recovered orientation is within 15 deg
        # of straight down like the original pipeline produced
        from opencalibration_tpu.ops.quaternion import quat_rotate

        import jax.numpy as jnp

        for nid in g2.node_ids():
            q = np.asarray(g2.get_node(nid).payload.orientation)
            assert np.isfinite(q).all()
            down = np.asarray(
                quat_rotate(jnp.asarray(q)[None], jnp.asarray([[0.0, 0.0, 1.0]]))
            )[0]
            ang = np.degrees(np.arccos(np.clip(-down[2], -1, 1)))
            orig = np.asarray(p.graph.get_node(nid).payload.orientation)
            down0 = np.asarray(
                quat_rotate(jnp.asarray(orig)[None], jnp.asarray([[0.0, 0.0, 1.0]]))
            )[0]
            ang0 = np.degrees(np.arccos(np.clip(-down0[2], -1, 1)))
            assert abs(ang - ang0) < 15.0
