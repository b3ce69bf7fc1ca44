"""Multi-image feature-track construction for ground-mesh BA.

Host-side re-design of reference src/relax/relax_problem.cpp:608-929
(addMultiRayTrackCosts): per-edge inlier matches become 2-view tracks,
UnionFind merges measurements shared across edges into multi-image tracks,
tracks are grid-filtered by length (longest track per image cell), rays
are outlier-rejected against the robust centroid of their mesh-plane
intersections, and the surviving 3-5-ray tracks are emitted as padded
plane_ray block rows (the device consumes one homogeneous batch instead of
N-templated Ceres cost functions).

Returns the per-image covered-cell sets and used measurements so the
2-ray fallback (phase 3) can skip what tracks already constrain
(reference relax_problem.cpp:435-466).
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops import distort as D
from opencalibration_tpu.ops.intersection import ray_intersection
from opencalibration_tpu.types.camera import stack_cameras

MIN_TRACK_RAYS = 3
MAX_TRACK_RAYS = 5  # reference ROBUST_CENTROID_MAX_POINTS / cost arity


def _np_quat_rotate(q, v):
    """Rotate [3] (or [N,3]) vectors by a wxyz quaternion — numpy, so hot
    host loops never pay an eager device dispatch per item."""
    u, w = q[..., 1:], q[..., :1]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


@jax.jit
def _undistort_nodes_device(px, models):
    """[K, N, 2] pixels through K stacked models -> [K, N, 3] camera rays
    in ONE dispatch (an eager per-node vmap re-traces the iterative
    undistort every call and dominates the track builder)."""
    return jax.vmap(
        lambda p, m: jax.vmap(lambda q: D.image_to_3d(q, m))(p)
    )(px, models)


class _UF:
    def __init__(self, n):
        self.p = list(range(n))

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def unite(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def build_multiray_tracks(
    graph,
    cam_index: Dict[int, int],
    node_model: Dict[int, int],
    fwd_models: Dict[int, object],
    quats: np.ndarray,
    positions: np.ndarray,
    mesh,
    edge_ids: Sequence[int],
    grid_fraction: float,
):
    """Build padded multi-ray track rows.

    Returns dict with arrays (vert_idx [B,3], tri_xy [B,3,2], cam_idx
    [B,5], ray_valid [B,5], pixel [B,5,2], fixed_dir [B,5,3], model_i [B]),
    used_measurements set[(node_id, feat_idx)], covered_cells
    dict[node_id -> set[cell_key]]. Empty dict rows when no tracks.
    """
    # ---- phase 1: collect per-edge 2-view measurement pairs -----------------
    key_to_idx: Dict[Tuple[int, int], int] = {}
    keys: List[Tuple[int, int]] = []
    pairs: List[Tuple[int, int]] = []

    def key_id(k):
        if k not in key_to_idx:
            key_to_idx[k] = len(keys)
            keys.append(k)
        return key_to_idx[k]

    for eid in edge_ids:
        e = graph.get_edge(eid)
        if e is None or e.source not in cam_index or e.dest not in cam_index:
            continue
        rel = e.payload
        for i1, i2 in zip(rel.inlier_idx1, rel.inlier_idx2):
            a = key_id((e.source, int(i1)))
            b = key_id((e.dest, int(i2)))
            pairs.append((a, b))

    if not pairs:
        return {}, set(), {}

    uf = _UF(len(keys))
    for a, b in pairs:
        uf.unite(a, b)
    tracks: Dict[int, List[Tuple[int, int]]] = {}
    for i, k in enumerate(keys):
        tracks.setdefault(uf.find(i), []).append(k)

    # ---- per-track ray data (dedup by node, reference :650-676) ------------
    cand = []
    for root, ms in tracks.items():
        seen: Dict[int, int] = {}
        for nid, fi in ms:
            if nid not in seen and nid in cam_index:
                seen[nid] = fi
        if len(seen) >= MIN_TRACK_RAYS:
            cand.append(sorted(seen.items()))
    if not cand:
        return {}, set(), {}

    # ---- grid filter by track length (reference :678-702) ------------------
    def cell_key(nid, px):
        m = fwd_models[node_model[nid]]
        nx = px[0] / max(float(m.pixels_cols), 1.0)
        ny = px[1] / max(float(m.pixels_rows), 1.0)
        return (int(np.floor(nx / grid_fraction)), int(np.floor(ny / grid_fraction)))

    best_per_cell: Dict[Tuple[int, Tuple[int, int]], Tuple[int, int]] = {}
    for ti, items in enumerate(cand):
        score = len(items)
        for nid, fi in items:
            px = graph.get_node(nid).payload.features.xy[fi]
            k = (nid, cell_key(nid, px))
            if k not in best_per_cell or score > best_per_cell[k][0]:
                best_per_cell[k] = (score, ti)
    accepted = {ti for _, ti in best_per_cell.values()}

    # ---- batched ray construction ------------------------------------------
    # ALL nodes' undistorts in ONE jitted dispatch, feature counts padded
    # to a common bucket so repeated pipeline iterations reuse the compile
    from opencalibration_tpu.relax.problem_builder import _bucket

    node_list = sorted({nid for items in cand for nid, _ in items})
    node_rays: Dict[int, np.ndarray] = {}
    if node_list:
        counts = [
            len(graph.get_node(nid).payload.features.xy) for nid in node_list
        ]
        nb = _bucket(max(counts), minimum=64)
        px_stack = np.zeros((len(node_list), nb, 2))
        for i, nid in enumerate(node_list):
            xy = np.asarray(graph.get_node(nid).payload.features.xy)
            px_stack[i, : len(xy)] = xy
        models_stacked = stack_cameras(
            [fwd_models[node_model[nid]] for nid in node_list]
        )
        rays = np.asarray(
            _undistort_nodes_device(jnp.asarray(px_stack), models_stacked)
        )
        for i, nid in enumerate(node_list):
            node_rays[nid] = rays[i, : counts[i]]

    accepted_list = sorted(accepted)
    first_dirs, first_orig = [], []
    for ti in accepted_list:
        items = cand[ti]
        (n0, f0), (n1, f1) = items[0], items[1]
        d0 = _np_quat_rotate(quats[cam_index[n0]], node_rays[n0][f0])
        d1 = _np_quat_rotate(quats[cam_index[n1]], node_rays[n1][f1])
        first_dirs.append((d0, d1))
        first_orig.append((positions[cam_index[n0]], positions[cam_index[n1]]))
    if not accepted_list:
        return {}, set(), {}
    nb_t = _bucket(len(accepted_list), minimum=64)  # stable compile shape

    def padstack(parts, idx):
        arr = np.stack([p[idx] for p in parts])
        pad = nb_t - len(arr)
        if pad > 0:
            arr = np.concatenate([arr, np.ones((pad,) + arr.shape[1:])])
        return arr

    mids, _ = ray_intersection(
        jnp.asarray(padstack(first_dirs, 0)), jnp.asarray(padstack(first_orig, 0)),
        jnp.asarray(padstack(first_dirs, 1)), jnp.asarray(padstack(first_orig, 1)),
    )
    mids = np.asarray(mids)[: len(accepted_list)]
    finite = np.isfinite(mids).all(axis=1)
    tri_idx_all = np.full(len(accepted_list), -1, np.int64)
    if finite.any():
        tri_idx_all[finite] = mesh.find_triangles(mids[finite, :2])

    rows = dict(vert_idx=[], tri_xy=[], cam_idx=[], ray_valid=[], pixel=[],
                fixed_dir=[], model_i=[])
    used: Set[Tuple[int, int]] = set()
    covered: Dict[int, Set] = {}

    for ai, ti in enumerate(accepted_list):
        items = cand[ti]
        nids = [nid for nid, _ in items]
        same_model = len({node_model[n] for n in nids}) == 1
        pixels = np.stack(
            [graph.get_node(nid).payload.features.xy[fi] for nid, fi in items]
        )
        dirs_cam = np.stack([node_rays[nid][fi] for nid, fi in items])
        cams = np.asarray([cam_index[nid] for nid in nids])
        q = quats[cams]
        t = positions[cams]
        # world rotation in numpy (tiny arrays; avoid device dispatch)
        w_, x_, y_, z_ = q[:, 0:1], q[:, 1:2], q[:, 2:3], q[:, 3:4]
        u = q[:, 1:]
        uv = np.cross(u, dirs_cam)
        world = dirs_cam + 2.0 * (w_ * uv + np.cross(u, uv))

        if tri_idx_all[ai] < 0:
            continue
        tri = mesh.triangles[tri_idx_all[ai]]
        v = mesh.vertices

        # plane intersections + robust centroid rejection (:735-775)
        n_vec = np.cross(v[tri[0]] - v[tri[1]], v[tri[0]] - v[tri[2]])
        n_vec = n_vec / max(np.linalg.norm(n_vec), 1e-30)
        denom = world @ n_vec
        if np.any(np.abs(denom) < 1e-9):
            continue
        s = ((v[tri[0]] - t) @ n_vec) / denom
        inter = t + s[:, None] * world
        dist = np.linalg.norm(inter - t, axis=1)
        avg = dist.mean()
        centroid = inter.mean(axis=0)
        for _ in range(3):
            err = np.linalg.norm(inter - centroid, axis=1)
            w = 1.0 / (err + 1e-8)
            hub = avg * 0.01
            w = np.where(err > hub, w * hub / np.maximum(err, 1e-30), w)
            centroid = (w[:, None] * inter).sum(0) / w.sum()
        err = np.linalg.norm(inter - centroid, axis=1) / max(avg, 1e-30)
        med = np.median(err)
        thr = max(med * 3.0, 1e-6)
        good = np.argsort(err)
        good = [g for g in good if err[g] <= thr][:MAX_TRACK_RAYS]
        if len(good) < MIN_TRACK_RAYS:
            continue

        pad = MAX_TRACK_RAYS - len(good)
        sel = list(good) + [good[0]] * pad
        rows["vert_idx"].append(tri)
        rows["tri_xy"].append(v[tri, :2])
        rows["cam_idx"].append(cams[sel])
        rows["ray_valid"].append(
            np.asarray([True] * len(good) + [False] * pad)
        )
        rows["pixel"].append(pixels[sel])
        rows["fixed_dir"].append(dirs_cam[sel])
        rows["model_i"].append(node_model[nids[good[0]]] if same_model else -1)

        for g in good:
            nid, fi = items[g]
            used.add((nid, fi))
            covered.setdefault(nid, set()).add(cell_key(nid, pixels[g]))

    if not rows["vert_idx"]:
        return {}, set(), {}
    return (
        {k: np.stack(vs) for k, vs in rows.items()},
        used,
        covered,
    )
