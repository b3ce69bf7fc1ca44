"""Dense multi-view densification.

TPU-native re-design of reference src/dense/dense_stereo.cpp:40-405: the
reference walks dense features in Hilbert order with a per-feature KD-tree
radius search; here the mesh-guided epipolar-free gating becomes a masked
Hamming matrix: for each image pair, the dense descriptor distance matrix
(one MXU matmul) is masked by "predicted position within 150 px" before
the top-2 ratio test — identical acceptance rules
(SEARCH_RADIUS_PIXELS=150, RATIO_THRESHOLD=0.85,
MAX_ABSOLUTE_DESCRIPTOR_DISTANCE=0.35, MAX_CANDIDATE_IMAGES=10,
MAX_REPROJECTION_ERROR_PIXELS=8, dense_stereo.cpp:50-54), then UnionFind
track merging + batched multi-ray triangulation with the 8 px reprojection
gate, appending the merged cloud to surfaces[0]
(dense_stereo.cpp:382-392).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops import distort as D
from opencalibration_tpu.ops import hamming as H
from opencalibration_tpu.ops.intersection import triangulate_tracks
from opencalibration_tpu.ops.quaternion import quat_rotate, quat_rotate_inverse

SEARCH_RADIUS_PIXELS = 150.0
RATIO_THRESHOLD = 0.85
MAX_CANDIDATE_IMAGES = 10
MAX_ABSOLUTE_DESCRIPTOR_DISTANCE = 0.35
MAX_REPROJECTION_ERROR_PIXELS = 8.0
MAX_TRACK_RAYS = 8

# dense feature budget: the reference extracts one big AKAZE set and
# splits it into sparse (NMS survivors, used for linking) and dense
# (everything else, used only by densifyMesh) — extract_features.cpp:62-83.
# Here the linking path keeps its small memory footprint and the dense set
# is re-extracted on demand at DENSIFY time with a larger budget + lower
# detector threshold (the extractor is a batched device kernel, so the
# re-extract is cheap relative to carrying 8k descriptors per image
# through the whole pipeline and its serialization).
DENSE_MAX_FEATURES = 8192
DENSE_THRESHOLD_SCALE = 0.2  # x the sparse detector threshold
DENSE_EXTRACT_BATCH = 16


class UnionFind:
    """reference types/union_find.hpp."""

    def __init__(self, n: int):
        self.parent = list(range(n))

    def find(self, x: int) -> int:
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def unite(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


@functools.partial(jax.jit, static_argnames=())
def _gated_match(desc1, xy1, valid1, desc2, xy2, valid2, predicted_xy):
    """Masked dense match: Hamming distances gated by |xy2 - predicted| <=
    SEARCH_RADIUS, then ratio/absolute acceptance."""
    dist = H.hamming_matrix(desc1, desc2).astype(jnp.float32) / H.DESCRIPTOR_BITS
    d2 = jnp.sum(
        (xy2[None, :, :] - predicted_xy[:, None, :]) ** 2, axis=-1
    )
    in_radius = d2 <= SEARCH_RADIUS_PIXELS**2
    ok = in_radius & valid2[None, :]
    big = jnp.float32(2.0)
    masked = jnp.where(ok, dist, big)
    best = jnp.min(masked, axis=1)
    idx = jnp.argmin(masked, axis=1)
    cols = jnp.arange(masked.shape[1])
    masked2 = jnp.where(cols[None, :] == idx[:, None], big, masked)
    second = jnp.min(masked2, axis=1)
    n_candidates = jnp.sum(ok, axis=1)
    good = jnp.where(
        n_candidates >= 2,
        best < RATIO_THRESHOLD * second,
        best < MAX_ABSOLUTE_DESCRIPTOR_DISTANCE,
    )
    good = good & valid1 & (best < MAX_ABSOLUTE_DESCRIPTOR_DISTANCE)
    return idx, best, good


def extract_dense_featuresets(
    graph,
    nodes,
    max_features: int = DENSE_MAX_FEATURES,
    batch: int = DENSE_EXTRACT_BATCH,
):
    """Re-decode + re-extract a dense feature set per image
    (reference extract_features.cpp:62-83 dense split, consumed by
    dense_stereo.cpp:50-54). Feature sets are padded to one common count
    (rounded up to 512) so every pair's gated match compiles once.

    Returns {node_id: FeatureSet}; images that fail to decode are skipped
    (caller falls back to the sparse set)."""
    import concurrent.futures

    from opencalibration_tpu.extract.image_loader import (
        batch_sparse_masks,
        features_from_device,
        load_and_decode,
        pad_gray_batch,
    )
    from opencalibration_tpu.ops import features as F

    threshold = F.DETECTOR_THRESHOLD * DENSE_THRESHOLD_SCALE
    raw: Dict[int, object] = {}
    for c0 in range(0, len(nodes), batch):
        chunk = nodes[c0 : c0 + batch]
        paths = [graph.get_node(nid).payload.path for nid in chunk]
        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            decoded = list(ex.map(load_and_decode, paths))
        good = [(nid, d) for nid, d in zip(chunk, decoded) if d is not None]
        if not good:
            continue
        gray_batch, sizes = pad_gray_batch([d.gray for _, d in good])
        out = F.extract_features(
            jnp.asarray(gray_batch), max_features=max_features, threshold=threshold
        )
        out_np, sparse_masks = batch_sparse_masks(out, sizes)
        for i, (nid, d) in enumerate(good):
            raw[nid] = features_from_device(
                out_np, i, d.scale, sizes[i], max_features,
                sparse_mask=sparse_masks[i],
            )
    if not raw:
        return {}
    # pad to a common count so the matcher compiles once
    cap = max(len(f.xy) for f in raw.values())
    cap = min(max_features, ((cap + 511) // 512) * 512)
    for nid, f in raw.items():
        n = len(f.xy)
        if n < cap:
            f.xy = np.concatenate([f.xy, np.full((cap - n, 2), 1e9)])
            f.strength = np.concatenate([f.strength, np.zeros(cap - n, np.float32)])
            f.descriptors = np.concatenate(
                [f.descriptors, np.zeros((cap - n,) + f.descriptors.shape[1:],
                                         f.descriptors.dtype)]
            )
            f.valid = np.concatenate([f.valid, np.zeros(cap - n, bool)])
        elif n > cap:
            f.xy, f.strength = f.xy[:cap], f.strength[:cap]
            f.descriptors, f.valid = f.descriptors[:cap], f.valid[:cap]
    return raw


def densify_mesh(
    graph, model_store, surfaces,
    dense_features: Optional[Dict[int, object]] = None,
    use_dense_extraction: bool = True,
    dense_max_features: int = DENSE_MAX_FEATURES,
) -> int:
    """Densify: returns the number of new 3d points appended."""
    mesh = None
    for s in surfaces:
        if s.mesh is not None and s.mesh.num_vertices > 0:
            mesh = s.mesh
            break
    if mesh is None:
        return 0

    nodes = [
        nid
        for nid, node in sorted(graph.nodes())
        if np.isfinite(np.asarray(node.payload.orientation)).all()
        and node.payload.features is not None
    ]
    if len(nodes) < 2:
        return 0

    import scipy.spatial

    positions = {nid: np.asarray(graph.get_node(nid).payload.position) for nid in nodes}
    tree = scipy.spatial.cKDTree(np.stack([positions[n][:2] for n in nodes]))
    node_arr = np.asarray(nodes)

    # global feature key -> track index bookkeeping
    key_to_obs: Dict[tuple, int] = {}
    observations: List[tuple] = []  # (node_id, feat_idx)
    uf_edges: List[tuple] = []

    if dense_features is None and use_dense_extraction:
        dense_features = extract_dense_featuresets(
            graph, nodes, max_features=dense_max_features
        )

    def feats_of(nid):
        if dense_features:
            f = dense_features.get(nid)
            if f is not None:
                return f
        return graph.get_node(nid).payload.features

    for nid in nodes:
        fa = feats_of(nid)
        qa = np.asarray(graph.get_node(nid).payload.orientation)
        pa_ = positions[nid]
        ma = model_store[graph.get_node(nid).payload.model_id].astype(jnp.float64)
        # dense feature rays -> mesh intersection -> predicted pixel in B
        rays_a = np.asarray(
            D.distort_keypoints(
                jnp.asarray(fa.xy), jnp.asarray(fa.xy), ma, ma
            )[0]
        )
        world_dirs = np.asarray(quat_rotate(jnp.asarray(qa)[None], jnp.asarray(rays_a)))
        # intersect with mesh: solve along ray for mesh z iteratively (one
        # step: use mesh z under the camera as plane)
        z0 = mesh.interpolate_z(pa_[None, :2])[0]
        if not np.isfinite(z0):
            z0 = float(mesh.vertices[:, 2].mean())
        t = (z0 - pa_[2]) / np.where(
            np.abs(world_dirs[:, 2]) < 1e-9, -1e-9, world_dirs[:, 2]
        )
        ground = pa_[None] + t[:, None] * world_dirs
        # refine z at the intersection xy
        z1 = mesh.interpolate_z(ground[:, :2])
        z1 = np.where(np.isfinite(z1), z1, z0)
        t = (z1 - pa_[2]) / np.where(
            np.abs(world_dirs[:, 2]) < 1e-9, -1e-9, world_dirs[:, 2]
        )
        ground = pa_[None] + t[:, None] * world_dirs
        valid_a = np.asarray(fa.valid) & (t > 0)

        k = min(MAX_CANDIDATE_IMAGES + 1, len(nodes))
        _, nn = tree.query(pa_[:2], k=k)
        for j in np.atleast_1d(nn):
            nid_b = int(node_arr[j])
            if nid_b <= nid:  # process each unordered pair once
                continue
            fb = feats_of(nid_b)
            qb = np.asarray(graph.get_node(nid_b).payload.orientation)
            pb_ = positions[nid_b]
            mb = model_store[graph.get_node(nid_b).payload.model_id].astype(jnp.float64)
            # predicted pixels of A's ground points in B
            rays_b = quat_rotate_inverse(
                jnp.asarray(qb)[None], jnp.asarray(ground - pb_[None])
            )
            pred = np.asarray(
                jax.vmap(lambda r: D.image_from_3d(r, mb))(rays_b)
            )
            in_front = np.asarray(rays_b)[:, 2] > 0

            idx, dist, good = _gated_match(
                jnp.asarray(fa.descriptors), jnp.asarray(fa.xy, jnp.float32),
                jnp.asarray(valid_a & in_front),
                jnp.asarray(fb.descriptors), jnp.asarray(fb.xy, jnp.float32),
                jnp.asarray(fb.valid), jnp.asarray(pred, jnp.float32),
            )
            idx = np.asarray(idx)
            good = np.asarray(good)
            for ia in np.where(good)[0]:
                ka = (nid, int(ia))
                kb = (nid_b, int(idx[ia]))
                for kk in (ka, kb):
                    if kk not in key_to_obs:
                        key_to_obs[kk] = len(observations)
                        observations.append(kk)
                uf_edges.append((key_to_obs[ka], key_to_obs[kb]))

    if not uf_edges:
        return 0

    uf = UnionFind(len(observations))
    for a, b in uf_edges:
        uf.unite(a, b)
    tracks: Dict[int, List[tuple]] = {}
    for i, obs in enumerate(observations):
        tracks.setdefault(uf.find(i), []).append(obs)

    # batched multi-ray triangulation: precompute per-node world-ray tables
    # (ONE vmapped undistort per node, not one dispatch per observation)
    node_world_rays: Dict[int, np.ndarray] = {}
    for nid in nodes:
        f = feats_of(nid)
        m = model_store[graph.get_node(nid).payload.model_id].astype(jnp.float64)
        cam_rays = jax.vmap(lambda p: D.image_to_3d(p, m))(jnp.asarray(f.xy))
        q = jnp.asarray(graph.get_node(nid).payload.orientation)
        node_world_rays[nid] = np.asarray(quat_rotate(q[None], cam_rays))

    track_list = [t for t in tracks.values() if len(t) >= 2]
    if not track_list:
        return 0
    T = len(track_list)
    dirs = np.zeros((T, MAX_TRACK_RAYS, 3))
    origins = np.zeros((T, MAX_TRACK_RAYS, 3))
    valid = np.zeros((T, MAX_TRACK_RAYS), bool)
    pix = np.zeros((T, MAX_TRACK_RAYS, 2))
    track_nodes = []
    for ti, obs_list in enumerate(track_list):
        # dedup by node (reference: one observation per image per track)
        seen = {}
        for nid, fi in obs_list:
            if nid not in seen:
                seen[nid] = fi
        items = sorted(seen.items())[:MAX_TRACK_RAYS]
        track_nodes.append(items)
        for k, (nid, fi) in enumerate(items):
            dirs[ti, k] = node_world_rays[nid][fi]
            origins[ti, k] = positions[nid]
            pix[ti, k] = feats_of(nid).xy[fi]
            valid[ti, k] = True

    pts, msd = triangulate_tracks(
        jnp.asarray(dirs), jnp.asarray(origins), jnp.asarray(valid)
    )
    pts = np.asarray(pts)

    # reprojection gate (MAX_REPROJECTION_ERROR_PIXELS), batched: gather
    # per-observation camera state and project all track-rays in one call
    keep = np.isfinite(pts).all(axis=1)
    obs_q = np.zeros((T, MAX_TRACK_RAYS, 4))
    obs_p = np.zeros((T, MAX_TRACK_RAYS, 3))
    # one shared model assumed per projection batch is not general; gather
    # model params per observation instead
    models_list = sorted({graph.get_node(nid).payload.model_id
                          for items in track_nodes for nid, _ in items})
    model_slot = {mid: i for i, mid in enumerate(models_list)}
    from opencalibration_tpu.types.camera import stack_cameras, take_camera

    batched_models = stack_cameras(
        [model_store[mid].astype(jnp.float64) for mid in models_list]
    )
    obs_m = np.zeros((T, MAX_TRACK_RAYS), np.int32)
    for ti, items in enumerate(track_nodes):
        for k, (nid, fi) in enumerate(items):
            node = graph.get_node(nid)
            obs_q[ti, k] = np.asarray(node.payload.orientation)
            obs_p[ti, k] = positions[nid]
            obs_m[ti, k] = model_slot[node.payload.model_id]

    def reproject(q, p, mi, pt):
        ray = quat_rotate_inverse(q, pt - p)
        return D.image_from_3d(ray, take_camera(batched_models, mi))

    repro = np.asarray(
        jax.vmap(jax.vmap(reproject, in_axes=(0, 0, 0, None)))(
            jnp.asarray(obs_q), jnp.asarray(obs_p), jnp.asarray(obs_m),
            jnp.asarray(pts),
        )
    )
    err = np.linalg.norm(repro - pix, axis=-1)
    ok_rays = (err <= MAX_REPROJECTION_ERROR_PIXELS) | ~valid
    keep &= ok_rays.all(axis=1)

    new_points = pts[keep]
    if len(new_points):
        surfaces[0].cloud.append(new_points)
    return len(new_points)
