"""refit_all_edges: batched bucketed refit must match the serial per-edge
reference implementation (reference relax_group.cpp:119-178)."""

import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module

import copy

import numpy as np

import jax.numpy as jnp

from opencalibration_tpu.ops import distort as D
from opencalibration_tpu.ops import models as M
from opencalibration_tpu.pipeline.stages import refit_all_edges
from opencalibration_tpu.types.graph import RelationType


def _serial_refit(graph, model_store):
    """The pre-batching serial loop, kept as the golden reference."""
    for eid, e in sorted(graph.edges()):
        rel = e.payload
        if len(rel.match_idx1) == 0:
            continue
        ns, nd = graph.get_node(e.source), graph.get_node(e.dest)
        ms = model_store[ns.payload.model_id].astype(jnp.float64)
        mdm = model_store[nd.payload.model_id].astype(jnp.float64)
        px1 = ns.payload.features.xy[rel.match_idx1]
        px2 = nd.payload.features.xy[rel.match_idx2]
        r1, r2 = D.distort_keypoints(jnp.asarray(px1), jnp.asarray(px2), ms, mdm)
        p1 = M.hnormalize(r1)
        p2 = M.hnormalize(r2)
        n = len(px1)
        inliers = np.zeros(n, bool)
        valid_idx = rel.inlier_match_index[rel.inlier_match_index < n]
        inliers[valid_idx] = True
        if inliers.sum() < 4:
            continue
        w = jnp.asarray(inliers, jnp.float64)
        Hm = None
        for _ in range(3):
            Hm = M.homography_fit_weighted(p1, p2, w)
            err = M.homography_error(Hm, p1, p2)
            inl = np.asarray(err) < M.HOMOGRAPHY_INLIER_THRESHOLD
            w = jnp.asarray(inl, jnp.float64)
        inl = np.asarray(w, bool)
        rel.ransac_relation = np.asarray(Hm, np.float64)
        rel.relation_type = RelationType.HOMOGRAPHY
        Rs, ts, nrm, _ = M.homography_decompose(Hm)
        scores = M.score_homography_poses(Rs, ts, nrm, r1, r2, jnp.asarray(w))
        order = np.argsort(-np.asarray(scores), kind="stable")
        quats = M.poses_to_quaternions(Rs)
        t_src = -jnp.einsum("kji,kj->ki", Rs, ts)
        rel.rel_quats = np.asarray(quats)[order]
        rel.rel_positions = np.asarray(t_src)[order]
        rel.rel_scores = np.asarray(scores)[order]
        if inl.sum() > 4 * 1.5 and scores[order[0]] > 0:
            keep = np.where(inl)[0]
            rel.inlier_idx1 = rel.match_idx1[keep]
            rel.inlier_idx2 = rel.match_idx2[keep]
            rel.inlier_pixel1 = px1[keep]
            rel.inlier_pixel2 = px2[keep]
            rel.inlier_match_index = keep.astype(np.int32)
        else:
            rel.inlier_idx1 = np.zeros(0, np.int32)
            rel.inlier_idx2 = np.zeros(0, np.int32)
            rel.inlier_pixel1 = np.zeros((0, 2))
            rel.inlier_pixel2 = np.zeros((0, 2))
            rel.inlier_match_index = np.zeros(0, np.int32)


def test_batched_refit_matches_serial(calibrated_pipeline_session):
    p = calibrated_pipeline_session
    g_batched = copy.deepcopy(p.graph)
    g_serial = copy.deepcopy(p.graph)
    refit_all_edges(g_batched, p.model_store)
    _serial_refit(g_serial, p.model_store)

    edges_b = dict(g_batched.edges())
    edges_s = dict(g_serial.edges())
    assert edges_b.keys() == edges_s.keys() and len(edges_b) > 0
    for eid in edges_b:
        rb, rs = edges_b[eid].payload, edges_s[eid].payload
        np.testing.assert_allclose(
            rb.ransac_relation, rs.ransac_relation, atol=1e-9,
            err_msg=f"edge {eid} homography",
        )
        np.testing.assert_array_equal(rb.inlier_idx1, rs.inlier_idx1)
        np.testing.assert_array_equal(rb.inlier_idx2, rs.inlier_idx2)
        np.testing.assert_allclose(rb.rel_scores, rs.rel_scores, atol=1e-9)
        for k in range(4):
            qb, qs = rb.rel_quats[k], rs.rel_quats[k]
            if np.dot(qb, qs) < 0:
                qb = -qb
            np.testing.assert_allclose(qb, qs, atol=1e-9)
        np.testing.assert_allclose(
            rb.rel_positions, rs.rel_positions, atol=1e-9
        )
