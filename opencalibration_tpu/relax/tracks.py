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


@jax.jit
def _rays_and_first_mids_device(
    px, models, node_quats, node_pos, n0, f0, n1, f1, mem_n, mem_f
):
    """Fused undistort + world rotation + first-two-ray triangulation in
    ONE dispatch: through a remote-TPU tunnel every awaited dispatch costs
    a full round-trip (~0.2 s measured, with multi-second outliers), so
    the split undistort -> host loop -> intersection pattern paid twice
    per build.

    Only the (mem_n, mem_f) track-member rays are RETURNED: the full
    [K, N, 3] ray field is ~50 MB at 1k-survey group sizes and the
    remote link's device->host direction measured as slow as ~0.2 MB/s
    under load (a 245 s pull for the array this used to return); the
    gathered members are ~1 MB. Returns (member rays [M, 3],
    track midpoints [T, 3])."""
    from opencalibration_tpu.ops.intersection import ray_intersection
    from opencalibration_tpu.ops.quaternion import quat_rotate

    rays = jax.vmap(
        lambda p, m: jax.vmap(lambda q: D.image_to_3d(q, m))(p)
    )(px, models)
    d0 = quat_rotate(node_quats[n0], rays[n0, f0])
    d1 = quat_rotate(node_quats[n1], rays[n1, f1])
    mids, _ = ray_intersection(d0, node_pos[n0], d1, node_pos[n1])
    return rays[mem_n, mem_f], mids


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
    from opencalibration_tpu.utils.performance import PerformanceMeasure

    # ---- phase 1: per-edge 2-view measurement pairs -> connected tracks ----
    # vectorized: encoded (node, feature) keys -> np.unique indexing ->
    # sparse connected_components. The dict/UnionFind equivalent walked
    # every inlier of every edge in Python (reference :608-676 does the
    # same in C++ where it's free; here it dominated problem builds).
    with PerformanceMeasure("tracks: phase1+2 host"):
        # node ids are random 64-bit — remap to dense indices before the
        # (node, feature) key encoding
        nid_order = sorted(cam_index)
        nid_dense = {nid: i for i, nid in enumerate(nid_order)}
        nid_arr = np.asarray(nid_order, np.int64)

        e_src, e_dst, e_i1, e_i2 = [], [], [], []
        for eid in edge_ids:
            e = graph.get_edge(eid)
            if e is None or e.source not in cam_index or e.dest not in cam_index:
                continue
            rel = e.payload
            n = len(rel.inlier_idx1)
            if n == 0:
                continue
            e_src.append(np.full(n, nid_dense[e.source], np.int64))
            e_dst.append(np.full(n, nid_dense[e.dest], np.int64))
            e_i1.append(np.asarray(rel.inlier_idx1, np.int64))
            e_i2.append(np.asarray(rel.inlier_idx2, np.int64))
        if not e_src:
            return {}, set(), {}
        a_keys = (np.concatenate(e_src) << 32) | np.concatenate(e_i1)
        b_keys = (np.concatenate(e_dst) << 32) | np.concatenate(e_i2)
        # interleave a/b so first-occurrence order matches the sequential
        # key_id() walk (dedup below keeps the FIRST feature per node)
        inter = np.empty(2 * len(a_keys), np.int64)
        inter[0::2] = a_keys
        inter[1::2] = b_keys
        uniq, first_pos, inv = np.unique(
            inter, return_index=True, return_inverse=True
        )
        a_idx, b_idx = inv[0::2], inv[1::2]

        import scipy.sparse
        import scipy.sparse.csgraph

        n_keys = len(uniq)
        adj = scipy.sparse.coo_matrix(
            (np.ones(len(a_idx), np.int8), (a_idx, b_idx)),
            shape=(n_keys, n_keys),
        )
        _, labels = scipy.sparse.csgraph.connected_components(
            adj, directed=False
        )

        key_nid = nid_arr[(uniq >> 32).astype(np.int64)]  # real node ids
        key_fi = (uniq & 0xFFFFFFFF).astype(np.int64)

        # ---- dedup per (track, node): keep first-seen feature ---------------
        order = np.lexsort((first_pos, key_nid, labels))
        ln = labels[order]
        nn = key_nid[order]
        keep_first = np.ones(len(order), bool)
        keep_first[1:] = (ln[1:] != ln[:-1]) | (nn[1:] != nn[:-1])
        dk = order[keep_first]  # deduped key indices, grouped by track
        d_lab = labels[dk]
        d_nid = key_nid[dk]
        d_fi = key_fi[dk]

        # track sizes after dedup; accept >= MIN_TRACK_RAYS
        sizes = np.bincount(d_lab, minlength=d_lab.max() + 1)
        key_score = sizes[d_lab]
        ok_track = key_score >= MIN_TRACK_RAYS
        if not ok_track.any():
            return {}, set(), {}
        d_lab, d_nid, d_fi, key_score = (
            d_lab[ok_track], d_nid[ok_track], d_fi[ok_track],
            key_score[ok_track],
        )
        d_first = first_pos[dk][ok_track]

        # candidate index per surviving track, ordered by first appearance
        # (parity with the sequential tracks-dict insertion order)
        lab_uniq, lab_inv = np.unique(d_lab, return_inverse=True)
        lab_first = np.full(len(lab_uniq), np.iinfo(np.int64).max)
        np.minimum.at(lab_first, lab_inv, d_first)
        ti_of_lab = np.empty(len(lab_uniq), np.int64)
        ti_of_lab[np.argsort(lab_first, kind="stable")] = np.arange(len(lab_uniq))
        d_ti = ti_of_lab[lab_inv]

        # ---- grid filter by track length (reference :678-702) --------------
        node_list_all = sorted({int(x) for x in np.unique(d_nid)})
        nid_index = {nid: i for i, nid in enumerate(node_list_all)}
        xy_parts = [
            np.asarray(graph.get_node(nid).payload.features.xy)
            for nid in node_list_all
        ]
        offs = np.zeros(len(node_list_all) + 1, np.int64)
        offs[1:] = np.cumsum([len(x) for x in xy_parts])
        xy_cat = (
            np.concatenate(xy_parts) if xy_parts else np.zeros((0, 2))
        )
        d_nrow = np.asarray([nid_index[int(x)] for x in d_nid])
        px_all = xy_cat[offs[d_nrow] + d_fi]  # [K, 2]
        dims = np.stack(
            [
                [
                    max(float(fwd_models[node_model[nid]].pixels_cols), 1.0),
                    max(float(fwd_models[node_model[nid]].pixels_rows), 1.0),
                ]
                for nid in node_list_all
            ]
        )
        cell_xy = np.floor(
            px_all / dims[d_nrow] / grid_fraction
        ).astype(np.int64)
        cell_id = (
            d_nrow.astype(np.int64) * (1 << 24)
            + (cell_xy[:, 0] & 0xFFF) * (1 << 12)
            + (cell_xy[:, 1] & 0xFFF)
        )
        # best per cell: max score, ties -> smallest candidate index
        corder = np.lexsort((d_ti, -key_score, cell_id))
        cfirst = np.ones(len(corder), bool)
        cid_s = cell_id[corder]
        cfirst[1:] = cid_s[1:] != cid_s[:-1]
        accepted = set(d_ti[corder[cfirst]].tolist())

        # cand[ti] = sorted (nid, fi) items of the track
        sort_items = np.lexsort((d_nid, d_ti))
        cand: List[List[Tuple[int, int]]] = [[] for _ in range(len(lab_uniq))]
        for j in sort_items:
            cand[d_ti[j]].append((int(d_nid[j]), int(d_fi[j])))

    def cell_key(nid, px):
        m = fwd_models[node_model[nid]]
        nx = px[0] / max(float(m.pixels_cols), 1.0)
        ny = px[1] / max(float(m.pixels_rows), 1.0)
        return (int(np.floor(nx / grid_fraction)), int(np.floor(ny / grid_fraction)))

    # ---- batched ray construction ------------------------------------------
    # ALL nodes' undistorts in ONE jitted dispatch, feature counts padded
    # to a common bucket so repeated pipeline iterations reuse the compile
    from opencalibration_tpu.relax.problem_builder import _bucket

    _pm_rays = PerformanceMeasure("tracks: ray construction")
    accepted_list = sorted(accepted)
    if not accepted_list:
        _pm_rays.__exit__()
        return {}, set(), {}
    node_list = sorted({nid for items in cand for nid, _ in items})
    counts = [
        len(graph.get_node(nid).payload.features.xy) for nid in node_list
    ]
    nb = _bucket(max(counts), minimum=64)
    # bucket the NODE dimension too: per-group node counts vary, and an
    # exact-size [N, nb, 2] stack compiles a fresh undistort kernel per
    # distinct N — measured 6.7 s/compile x ~20 groups = ~190 s of a 1k
    # run's problem builds (padded rows reuse node 0's model/pose and are
    # never referenced by the track index rows)
    n_pad = _bucket(len(node_list), minimum=16)
    px_stack = np.zeros((n_pad, nb, 2), np.float32)
    for i, nid in enumerate(node_list):
        xy = np.asarray(graph.get_node(nid).payload.features.xy)
        px_stack[i, : len(xy)] = xy
    pad_models = [fwd_models[node_model[nid]] for nid in node_list]
    pad_models += [pad_models[0]] * (n_pad - len(node_list))
    models_stacked = stack_cameras(pad_models)
    row_of = {nid: i for i, nid in enumerate(node_list)}

    nb_t = _bucket(len(accepted_list), minimum=64)  # stable compile shape
    tr = np.zeros((nb_t, 4), np.int32)
    for ai, ti in enumerate(accepted_list):
        (n0, f0), (n1, f1) = cand[ti][0], cand[ti][1]
        tr[ai] = (row_of[n0], f0, row_of[n1], f1)
    node_quats = np.zeros((n_pad, 4))
    node_quats[:, 0] = 1.0
    node_pos = np.zeros((n_pad, 3))
    for i, nid in enumerate(node_list):
        node_quats[i] = quats[cam_index[nid]]
        node_pos[i] = positions[cam_index[nid]]

    # member list over accepted tracks: the only rays the row loop reads
    mem_pairs = [
        (row_of[nid], fi) for ti in accepted_list for nid, fi in cand[ti]
    ]
    nb_m = _bucket(max(len(mem_pairs), 1), minimum=64)
    mem_n = np.zeros(nb_m, np.int32)
    mem_f = np.zeros(nb_m, np.int32)
    for i, (r, fi) in enumerate(mem_pairs):
        mem_n[i] = r
        mem_f[i] = fi

    # ONE awaited dispatch: undistort + world rotation + 2-ray midpoints
    mem_rays_d, mids_d = _rays_and_first_mids_device(
        jnp.asarray(px_stack), models_stacked,
        jnp.asarray(node_quats), jnp.asarray(node_pos),
        jnp.asarray(tr[:, 0]), jnp.asarray(tr[:, 1]),
        jnp.asarray(tr[:, 2]), jnp.asarray(tr[:, 3]),
        jnp.asarray(mem_n), jnp.asarray(mem_f),
    )
    mem_rays = np.asarray(mem_rays_d)
    mids = np.asarray(mids_d)[: len(accepted_list)]
    ray_at: Dict[Tuple[int, int], np.ndarray] = {}
    k_mem = 0
    for ti in accepted_list:
        for nid, fi in cand[ti]:
            ray_at[(nid, fi)] = mem_rays[k_mem]
            k_mem += 1
    finite = np.isfinite(mids).all(axis=1)
    tri_idx_all = np.full(len(accepted_list), -1, np.int64)
    if finite.any():
        tri_idx_all[finite] = mesh.find_triangles(mids[finite, :2])

    _pm_rays.__exit__()
    rows = dict(vert_idx=[], tri_xy=[], cam_idx=[], ray_valid=[], pixel=[],
                fixed_dir=[], model_i=[])
    used: Set[Tuple[int, int]] = set()
    covered: Dict[int, Set] = {}

    _pm_rows = PerformanceMeasure("tracks: row loop")
    for ai, ti in enumerate(accepted_list):
        items = cand[ti]
        nids = [nid for nid, _ in items]
        same_model = len({node_model[n] for n in nids}) == 1
        pixels = np.stack(
            [graph.get_node(nid).payload.features.xy[fi] for nid, fi in items]
        )
        dirs_cam = np.stack([ray_at[(nid, fi)] for nid, fi in items])
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

    _pm_rows.__exit__()
    if not rows["vert_idx"]:
        return {}, set(), {}
    return (
        {k: np.stack(vs) for k, vs in rows.items()},
        used,
        covered,
    )
