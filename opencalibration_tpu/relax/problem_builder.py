"""Build batched relax problems from the measurement graph.

Host-side equivalent of the reference's RelaxProblem setup methods
(reference src/relax/relax_problem.cpp: setupDecompositionProblem :40,
setupGroundPlaneProblem :61, setupGroundMeshProblem :83, grid filtering
:234-309) re-shaped for the TPU: instead of adding one Ceres residual
block per measurement, the builder emits *padded arrays* per block family
and hands them to relax.lm.solve.

Simplifications vs the reference, by design (documented contracts):
* the one-image-at-a-time NaN-orientation bootstrap (relax.cpp:44-79)
  becomes fill-then-batch-solve — the downwards prior plus GPS-pinned
  positions provide the same basin;
* multi-ray (3-5) track costs use the same padded plane_ray block as the
  2-ray fallback; track construction (UnionFind over edge tracks) is in
  relax.tracks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops import distort as D
from opencalibration_tpu.ops.intersection import ray_intersection
from opencalibration_tpu.ops.quaternion import quat_rotate
from opencalibration_tpu.relax import blocks as B
from opencalibration_tpu.relax import lm
from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout
from opencalibration_tpu.surface.mesh import TriMesh, build_minimal_mesh
from opencalibration_tpu.types.camera import (
    CameraModel, FORWARD, INVERSE, stack_cameras, take_camera,
)
from opencalibration_tpu.types.graph import MeasurementGraph, NodePose, SurfaceModel

DOWN_QUAT = np.array([0.0, 1.0, 0.0, 0.0])  # 180deg about x: nadir, north-up

def _wide():
    """float64 when x64 is enabled (CPU parity tests), float32 otherwise
    (TPU has no f64 — this avoids per-call truncation warnings)."""
    import jax

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32



def _bucket(n: int, minimum: int = 16) -> int:
    """Round up to the next power of two so jitted solver shapes repeat
    across pipeline iterations (padded instances carry weight 0)."""
    b = minimum
    while b < n:
        b *= 2
    return b


def _pad_rows(arr, target, fill=0):
    arr = np.asarray(arr)
    if len(arr) >= target:
        return arr[:target]
    pad_shape = (target - len(arr),) + arr.shape[1:]
    return np.concatenate([arr, np.full(pad_shape, fill, arr.dtype)])


@dataclasses.dataclass(frozen=True)
class RelaxOptions:
    """Typed subset of the reference's RelaxOptionSet
    (reference types/relax_options.hpp:9-151)."""

    orientation: bool = True
    ground_plane: bool = False
    ground_mesh: bool = False
    points_3d: bool = False
    focal: bool = False
    principal: bool = False
    radial_tier: int = 0  # 0=off, 1=Brown2, 2=Brown24, 3=Brown246
    tangential: bool = False
    minimal_mesh: bool = False
    # measurement grid-filter cell size as a fraction of the image
    # (reference RelaxConfig.ground_mesh_grid_fraction,
    # types/relax_options.hpp:139-151); the mesh-refinement level schedule
    # halves it per level (pipeline.cpp:698)
    grid_fraction: float = 0.15

    @property
    def any_intrinsics(self) -> bool:
        return self.focal or self.principal or self.radial_tier > 0 or self.tangential


@dataclasses.dataclass
class BuiltProblem:
    params: RelaxParams
    layout: TangentLayout
    blocks: list
    free_mask: jnp.ndarray
    surface_free_mask: jnp.ndarray  # relaxObservedModelOnly mask
    cam_index: Dict[int, int]  # node_id -> camera slot
    model_index: Dict[int, int]  # model_id -> intrinsics slot
    mesh: Optional[TriMesh]
    inverse_models: bool  # whether intrinsics leaves hold INVERSE coefficients
    track_points: np.ndarray  # [N, 3] triangulated points for surface output
    track_errors: np.ndarray  # [N]
    # structure-cache metadata (refresh_problem): problem family, count of
    # optimized (non-halo) camera slots, real (unpadded) mesh vertex count
    kind: str = "mesh"  # "mesh" | "points" | "decomposition"
    num_opt: int = 0
    v_real: int = 0


def _gather_cameras(
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    edge_ids: Sequence[int],
):
    """Optimized cameras first, then frozen boundary cameras referenced by
    the edges (nodeid2poseopt optimize=false semantics,
    reference relax_problem.cpp:181-232)."""
    cam_index: Dict[int, int] = {}
    quats, positions, opt = [], [], []
    for np_ in node_poses:
        cam_index[np_.node_id] = len(quats)
        q = np.asarray(np_.orientation, np.float64)
        quats.append(np.where(np.isfinite(q).all(), q, DOWN_QUAT))
        positions.append(np.asarray(np_.position, np.float64))
        opt.append(True)
    for edge_id in edge_ids:
        e = graph.get_edge(edge_id)
        if e is None:
            continue
        for nid in (e.source, e.dest):
            if nid in cam_index:
                continue
            node = graph.get_node(nid)
            if node is None:
                continue
            q = np.asarray(node.payload.orientation, np.float64)
            p = np.asarray(node.payload.position, np.float64)
            if not (np.isfinite(q).all() and np.isfinite(p).all()):
                continue
            cam_index[nid] = len(quats)
            quats.append(q)
            positions.append(p)
            opt.append(False)
    return cam_index, np.asarray(quats), np.asarray(positions), np.asarray(opt)


def _usable_edges(graph, cam_index, edge_ids):
    out = []
    for edge_id in sorted(edge_ids):
        e = graph.get_edge(edge_id)
        if e is None:
            continue
        if e.source in cam_index and e.dest in cam_index:
            out.append(edge_id)
    return out


def build_decomposition_problem(
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    edge_ids: Sequence[int],
    dtype=None,
) -> Optional[BuiltProblem]:
    """Relative-orientation problem (setupDecompositionProblem,
    reference relax_problem.cpp:40-59 + addRelationCost :312-377)."""
    if dtype is None:
        dtype = _wide()
    cam_index, quats, positions, opt = _gather_cameras(graph, node_poses, edge_ids)
    if len(quats) == 0:
        return None
    layout = TangentLayout(len(quats), 0, 0, 1)
    params = RelaxParams.create(
        np.asarray(quats, dtype), np.asarray(positions, dtype), dtype=dtype
    )

    ci, cj, RQ, RT, RS, RV = [], [], [], [], [], []
    for edge_id in _usable_edges(graph, cam_index, edge_ids):
        e = graph.get_edge(edge_id)
        rel = e.payload
        if len(rel.inlier_idx1) == 0:
            continue
        scores = np.asarray(rel.rel_scores, np.float64)
        if not np.any(scores > 0):
            continue
        max_score = scores.max()
        valid = scores > 0.25 * max_score  # reference relax_cost_function.hpp:276
        q = np.asarray(rel.rel_quats, np.float64)
        t = np.asarray(rel.rel_positions, np.float64)
        valid &= np.isfinite(q).all(axis=1) & np.isfinite(t).all(axis=1)
        if not valid.any():
            continue
        ci.append(cam_index[e.source])
        cj.append(cam_index[e.dest])
        RQ.append(np.where(valid[:, None], q, DOWN_QUAT[None]))
        RT.append(np.where(valid[:, None], t, 0.0))
        RS.append(np.where(valid, scores, 0.0))
        RV.append(valid)
    if not ci:
        return None

    # numpy end-to-end: block data crosses into XLA at the jitted solve
    # boundary; eager jnp here costs op-by-op compiles per new bucket
    nb = _bucket(len(ci))
    blk = B.decomposed_rotation_block(
        layout,
        _pad_rows(np.asarray(ci, np.int32), nb),
        _pad_rows(np.asarray(cj, np.int32), nb),
        np.asarray(_pad_rows(np.stack(RQ), nb), dtype),
        np.asarray(_pad_rows(np.stack(RT), nb), dtype),
        np.asarray(_pad_rows(np.stack(RS), nb), dtype),
        _pad_rows(np.stack(RV), nb, fill=False),
        np.asarray(_pad_rows(np.ones(len(ci)), nb), dtype),
    )
    down = B.downwards_prior_block(
        layout,
        np.arange(len(quats), dtype=np.int32),
        np.asarray(opt, dtype),
    )
    free = layout.build_free_mask(rot_free=np.asarray(opt))
    return BuiltProblem(
        params=params, layout=layout, blocks=[blk, down], free_mask=free,
        surface_free_mask=np.zeros_like(free), cam_index=cam_index,
        model_index={}, mesh=None, inverse_models=False,
        track_points=np.zeros((0, 3)), track_errors=np.zeros(0),
        kind="decomposition", num_opt=len(node_poses), v_real=0,
    )


def _np_ray_error(rays1_w, rays2_w, pos1, pos2):
    """Signed squared inter-ray distance, numpy (mirrors
    ops.intersection.ray_intersection's error output for host callers —
    an eager device call per edge costs a fresh tiny-op compile per
    distinct shape on TPU)."""
    n1dn1 = np.sum(rays1_w * rays1_w, axis=-1)
    n1dn2 = np.sum(rays1_w * rays2_w, axis=-1)
    n2dn2 = np.sum(rays2_w * rays2_w, axis=-1)
    denom = n1dn1 * n2dn2 - n1dn2 * n1dn2
    offset = pos1[None] - pos2[None]
    odn1 = np.sum(offset * rays1_w, axis=-1)
    odn2 = np.sum(offset * rays2_w, axis=-1)
    denom_safe = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
    t1 = (n1dn2 * odn2 - n2dn2 * odn1) / denom_safe
    t2 = (n1dn1 * odn2 - n1dn2 * odn1) / denom_safe
    p1 = pos1[None] + t1[:, None] * rays1_w
    p2 = pos2[None] + t2[:, None] * rays2_w
    err = np.sum((p1 - p2) ** 2, axis=-1)
    behind = (t1 < 0) | (t2 < 0)
    return np.where(behind, -err, err)


def _grid_filter_edge(
    pixels1, pixels2, rays1_w, rays2_w, pos1, pos2, distances, ransac_H,
    dims1, dims2, cell_fraction: float, err=None,
):
    """Composite-score grid filter for one edge's inliers
    (reference relax_problem.cpp:234-309). All numpy, vectorized.
    Returns boolean keep mask (union of best-per-cell in either image)."""
    n = len(pixels1)
    if n == 0:
        return np.zeros(0, bool)
    if err is None:
        err = _np_ray_error(
            np.asarray(rays1_w), np.asarray(rays2_w),
            np.asarray(pos1), np.asarray(pos2),
        )
    err = np.asarray(err)
    inter_score = np.where(err < 0, 0.0, 1.0 / (1.0 + err))
    cosang = np.sum(np.asarray(rays1_w) * np.asarray(rays2_w), axis=1)
    angle_score = 1.0 - cosang**2
    desc_score = 1.0 - np.asarray(distances)
    if ransac_H is not None and np.isfinite(ransac_H).all():
        # reference compares normalized pixel coords through the homography
        src = np.concatenate([pixels1, np.ones((n, 1))], axis=1)
        dst = src @ ransac_H.T
        dst = dst[:, :2] / np.where(np.abs(dst[:, 2:3]) < 1e-12, 1e-12, dst[:, 2:3])
        ransac_score = 1.0 / (1.0 + np.linalg.norm(dst - pixels2, axis=1))
    else:
        ransac_score = np.ones(n)
    score = inter_score * angle_score * desc_score * ransac_score

    keep = np.zeros(n, bool)
    for pixels, dims in ((pixels1, dims1), (pixels2, dims2)):
        gx = np.floor(pixels[:, 0] / dims[0] / cell_fraction).astype(np.int64)
        gy = np.floor(pixels[:, 1] / dims[1] / cell_fraction).astype(np.int64)
        cells = gx * 100000 + gy
        order = np.lexsort((-score, cells))
        sorted_cells = cells[order]
        first = np.ones(n, bool)
        first[1:] = sorted_cells[1:] != sorted_cells[:-1]
        best = order[first]
        keep[best[score[best] > 0]] = True
    return keep


@jax.jit
def _edge_rows_device(px1, px2, mi1, mi2, q1, q2, p1, p2, models):
    """Per-inlier-row device work for ALL edges in one dispatch:
    undistort each pixel through its row's (forward) camera model, rotate
    into world frame, 2-ray triangulate. Row count is bucketed by the
    caller so repeated pipeline iterations reuse this compile."""

    def one(a, b, i1, i2, qa, qb):
        r1 = D.image_to_3d(a, take_camera(models, i1))
        r2 = D.image_to_3d(b, take_camera(models, i2))
        return r1, r2, quat_rotate(qa, r1), quat_rotate(qb, r2)

    r1c, r2c, r1w, r2w = jax.vmap(one)(px1, px2, mi1, mi2, q1, q2)
    mid, err = ray_intersection(r1w, p1, r2w, p2)
    return r1c, r2c, r1w, r2w, mid, err


def build_mesh_problem(
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    cam_models: Dict[int, CameraModel],
    edge_ids: Sequence[int],
    options: RelaxOptions,
    previous_surfaces: Sequence[SurfaceModel] = (),
    grid_fraction: float = 0.15,
    dtype=None,
) -> Optional[BuiltProblem]:
    """Ground-plane / ground-mesh problem: ray/triangle costs over a
    surface mesh, optional shared-inverse-model intrinsics
    (setupGroundPlaneProblem / setupGroundMeshProblem,
    reference relax_problem.cpp:61-120)."""
    if dtype is None:
        dtype = _wide()
    cam_index, quats, positions, opt = _gather_cameras(graph, node_poses, edge_ids)
    if len(quats) < 2:
        return None
    edge_list = _usable_edges(graph, cam_index, edge_ids)
    if not edge_list:
        return None

    # ---- mesh initialization (initializeGroundPlane / initializeGroundMesh)
    prior_pts = None
    prev_mesh = None
    for s in previous_surfaces:
        if s.mesh is not None and getattr(s.mesh, "num_vertices", 0) > 0:
            prev_mesh = s.mesh
        for c in s.cloud:
            prior_pts = c if prior_pts is None else np.concatenate([prior_pts, c])
    if options.ground_mesh and prev_mesh is not None and not (
        options.minimal_mesh and prev_mesh.num_vertices <= 4
    ):
        mesh = prev_mesh.copy()
    elif options.ground_plane:
        # one big triangle 50m under the cameras (initializeGroundPlane,
        # reference relax_problem.cpp:1193-1240)
        margin = 50.0
        center = 0.5 * (positions[:, :2].min(0) + positions[:, :2].max(0))
        spacing = (positions[:, :2].max(0) - positions[:, :2].min(0)).max() + margin
        height = positions[:, 2].mean() - margin
        mesh = TriMesh(
            np.array(
                [
                    [center[0] - spacing, center[1] - spacing, height],
                    [center[0] + spacing, center[1] - spacing, height],
                    [center[0], center[1] + spacing, height],
                ]
            ),
            np.array([[0, 1, 2]], np.int32),
        )
    else:
        mesh = build_minimal_mesh(positions, prior_pts)
        if mesh is None:
            return None

    # ---- intrinsics slots (shared inverse model per camera model id)
    model_index: Dict[int, int] = {}
    inv_models: List[CameraModel] = []
    use_intrinsics = options.any_intrinsics
    from opencalibration_tpu.utils.performance import PerformanceMeasure

    with PerformanceMeasure("build: model inversion"):
        for mid, m in sorted(cam_models.items()):
            model_index[mid] = len(inv_models)
            inv_models.append(D.convert_to_inverse(m.astype(_wide())))
    if not inv_models:
        # derive from graph nodes
        for nid in cam_index:
            node = graph.get_node(nid)
            mid = node.payload.model_id
            if mid not in model_index:
                model_index[mid] = len(inv_models)
                inv_models.append(None)  # placeholder; filled by caller
    M = max(1, len(inv_models))

    # pad the mesh-z tangent to a bucket: the refinement loop grows the
    # vertex count every iteration, and an exact-size layout would compile
    # a fresh LM module each time (padded slots carry no residuals and are
    # frozen in the free masks)
    V_real = mesh.num_vertices
    V_pad = _bucket(V_real, minimum=32)
    layout = TangentLayout(len(quats), V_pad, 0, M)
    mesh_z0 = np.zeros(V_pad)
    mesh_z0[:V_real] = mesh.vertices[:, 2]
    focal = np.array([float(m.focal_length_pixels) for m in inv_models]) if inv_models else np.array([1.0])
    principal = (
        np.stack([np.asarray(m.principal_point) for m in inv_models])
        if inv_models else np.zeros((1, 2))
    )
    radial = (
        np.stack([np.asarray(m.radial_distortion) for m in inv_models])
        if inv_models else np.zeros((1, 3))
    )
    tangential = (
        np.stack([np.asarray(m.tangential_distortion) for m in inv_models])
        if inv_models else np.zeros((1, 2))
    )
    params = RelaxParams.create(
        np.asarray(quats, dtype), np.asarray(positions, dtype),
        mesh_z=np.asarray(mesh_z0, dtype),
        focal=np.asarray(focal, dtype), principal=np.asarray(principal, dtype),
        radial=np.asarray(radial, dtype), tangential=np.asarray(tangential, dtype),
    )

    # ---- per-edge measurements: grid filter + triangle assignment
    b_vert, b_trixy, b_cam, b_valid, b_pix, b_dir, b_model = [], [], [], [], [], [], []
    tp_list, te_list = [], []
    node_model = {nid: graph.get_node(nid).payload.model_id for nid in cam_index}
    fwd_models = {mid: cam_models[mid].astype(_wide()) for mid in cam_models}

    # ---- phases 1-2 (ground mesh only): multi-ray track costs
    # (reference relax_problem.cpp:93-106, 608-929)
    used_measurements = set()
    covered_cells = {}
    if options.ground_mesh:
        from opencalibration_tpu.relax.tracks import build_multiray_tracks
        from opencalibration_tpu.utils.performance import PerformanceMeasure

        with PerformanceMeasure("build: multiray tracks"):
            track_rows, used_measurements, covered_cells = build_multiray_tracks(
                graph, cam_index, node_model, fwd_models, quats, positions,
                mesh, edge_list, grid_fraction,
            )
        if track_rows:
            # whole-array part (a per-row append loop here cost ~2 min of
            # host time per 1k run: thousands of 1-row views re-stacked)
            mi_raw = np.asarray(track_rows["model_i"], np.int64)
            uniq, inv = np.unique(mi_raw, return_inverse=True)
            mapped = np.asarray(
                [model_index.get(int(v), 0) for v in uniq], np.int64
            )[inv]
            b_vert.append(np.asarray(track_rows["vert_idx"]))
            b_trixy.append(np.asarray(track_rows["tri_xy"]))
            b_cam.append(np.asarray(track_rows["cam_idx"]))
            b_valid.append(np.asarray(track_rows["ray_valid"]))
            b_model.append(mapped)
            b_pix.append(np.asarray(track_rows["pixel"]))
            b_dir.append(np.asarray(track_rows["fixed_dir"]))

    # ---- ONE batched device pass over every edge's inliers: per-row
    # undistort -> world rays -> 2-ray triangulation. (A per-edge loop of
    # these calls traces the iterative undistort eagerly for every edge
    # and dominates the whole build — the 'no per-item jnp calls on host
    # paths' rule.) Rows are bucketed so repeated builds reuse the compile.
    model_order = sorted(model_index, key=model_index.get)
    fwd_stack = stack_cameras([fwd_models[mid] for mid in model_order])
    live_edges = []
    _pm_gather = PerformanceMeasure("build: edge gather host")
    A_px1, A_px2, A_mi1, A_mi2, A_q1, A_q2, A_p1, A_p2 = ([] for _ in range(8))
    for edge_id in edge_list:
        e = graph.get_edge(edge_id)
        rel = e.payload
        n = len(rel.inlier_idx1)
        if n == 0:
            continue
        if node_model[e.source] not in fwd_models or node_model[e.dest] not in fwd_models:
            continue
        live_edges.append((edge_id, n))
        A_px1.append(np.asarray(rel.inlier_pixel1, np.float64))
        A_px2.append(np.asarray(rel.inlier_pixel2, np.float64))
        A_mi1.append(np.full(n, model_index[node_model[e.source]], np.int32))
        A_mi2.append(np.full(n, model_index[node_model[e.dest]], np.int32))
        A_q1.append(np.repeat(quats[cam_index[e.source]][None], n, 0))
        A_q2.append(np.repeat(quats[cam_index[e.dest]][None], n, 0))
        A_p1.append(np.repeat(positions[cam_index[e.source]][None], n, 0))
        A_p2.append(np.repeat(positions[cam_index[e.dest]][None], n, 0))
    _pm_gather.__exit__()

    if live_edges:
        from opencalibration_tpu.utils.performance import PerformanceMeasure

        total = sum(n for _, n in live_edges)
        nb_rows = _bucket(total, minimum=64)

        def cat(parts, fill=0.0):
            return _pad_rows(np.concatenate(parts), nb_rows, fill=fill)

        with PerformanceMeasure("build: edge rows device"):
            r1c_all, r2c_all, r1w_all, r2w_all, mid_all, err_all = jax.tree.map(
                np.asarray,
                _edge_rows_device(
                    jnp.asarray(cat(A_px1)), jnp.asarray(cat(A_px2)),
                    jnp.asarray(cat(A_mi1)), jnp.asarray(cat(A_mi2)),
                    jnp.asarray(cat(A_q1)), jnp.asarray(cat(A_q2)),
                    jnp.asarray(cat(A_p1)), jnp.asarray(cat(A_p2)),
                    fwd_stack,
                ),
            )
    from opencalibration_tpu.utils.performance import PerformanceMeasure

    _pm_filter = PerformanceMeasure("build: grid filter + triangle assign")
    # ---- fully vectorized over ALL edges' rows (a per-edge Python loop
    # scales linearly with edge count: ~6 ms/edge -> minutes at 10k scale)
    if live_edges:
        R = sum(n for _, n in live_edges)
        row_edge = np.repeat(np.arange(len(live_edges)), [n for _, n in live_edges])
        px1_all = np.concatenate(A_px1)
        px2_all = np.concatenate(A_px2)
        e_objs = [graph.get_edge(eid) for eid, _ in live_edges]
        src_slot = np.asarray([cam_index[e.source] for e in e_objs])
        dst_slot = np.asarray([cam_index[e.dest] for e in e_objs])
        # node ids are random 64-bit — dense-remap before any key encoding
        nid_dense = {nid: i for i, nid in enumerate(sorted(cam_index))}
        src_nid = np.asarray([nid_dense[e.source] for e in e_objs], np.int64)
        dst_nid = np.asarray([nid_dense[e.dest] for e in e_objs], np.int64)
        model_row = np.asarray(
            [model_index.get(node_model[e.source], 0) for e in e_objs]
        )
        dims_src = np.stack(
            [
                [
                    max(float(fwd_models[node_model[e.source]].pixels_cols), 1.0),
                    max(float(fwd_models[node_model[e.source]].pixels_rows), 1.0),
                ]
                for e in e_objs
            ]
        )
        dims_dst = np.stack(
            [
                [
                    max(float(fwd_models[node_model[e.dest]].pixels_cols), 1.0),
                    max(float(fwd_models[node_model[e.dest]].pixels_rows), 1.0),
                ]
                for e in e_objs
            ]
        )
        dist_parts, H_parts, idx1_parts, idx2_parts = [], [], [], []
        for (eid, n), e in zip(live_edges, e_objs):
            rel = e.payload
            dist_parts.append(
                np.asarray(rel.match_distance)[np.asarray(rel.inlier_match_index)]
                if len(rel.match_distance)
                else np.zeros(n)
            )
            Hm = np.asarray(rel.ransac_relation, np.float64)
            if Hm.shape != (3, 3) or not np.isfinite(Hm).all():
                Hm = np.full((3, 3), np.nan)
            H_parts.append(Hm)
            idx1_parts.append(np.asarray(rel.inlier_idx1, np.int64))
            idx2_parts.append(np.asarray(rel.inlier_idx2, np.int64))
        dist_all = np.concatenate(dist_parts)
        idx1_all = np.concatenate(idx1_parts)
        idx2_all = np.concatenate(idx2_parts)
        H_edge = np.stack(H_parts)  # [E, 3, 3]

        # composite score (reference relax_problem.cpp:234-309);
        # device row arrays are padded to a bucket — slice to the R real rows
        err_r = err_all[:R]
        inter_score = np.where(err_r < 0, 0.0, 1.0 / (1.0 + err_r))
        cosang = np.sum(r1w_all[:R] * r2w_all[:R], axis=1)
        angle_score = 1.0 - cosang**2
        desc_score = 1.0 - dist_all
        He = H_edge[row_edge]  # [R, 3, 3]
        src_h = np.concatenate([px1_all, np.ones((R, 1))], axis=1)
        dst_h = np.einsum("rij,rj->ri", He, src_h)
        wcoord = np.where(np.abs(dst_h[:, 2:3]) < 1e-12, 1e-12, dst_h[:, 2:3])
        reproj = np.linalg.norm(dst_h[:, :2] / wcoord - px2_all, axis=1)
        ransac_score = np.where(
            np.isfinite(reproj), 1.0 / (1.0 + reproj), 1.0
        )
        score = inter_score * angle_score * desc_score * ransac_score

        # best-per-cell in EITHER image, per edge
        keep_all = np.zeros(R, bool)
        for px_all, dims in ((px1_all, dims_src), (px2_all, dims_dst)):
            g = np.floor(px_all / dims[row_edge] / grid_fraction).astype(np.int64)
            cells = (row_edge.astype(np.int64) << 28) | (
                (g[:, 0] & 0x3FFF) << 14
            ) | (g[:, 1] & 0x3FFF)
            order = np.lexsort((-score, cells))
            sc = cells[order]
            first = np.ones(R, bool)
            first[1:] = sc[1:] != sc[:-1]
            best = order[first]
            keep_all[best[score[best] > 0]] = True

        finite_all = np.isfinite(mid_all[:R]).all(axis=1)
        sel = keep_all & finite_all
        tp_list.append(mid_all[:R][sel])
        te_list.append(err_all[:R][sel])

        tri_idx_all2 = np.full(R, -1, np.int64)
        if sel.any():
            with PerformanceMeasure("build: find triangles"):
                tri_idx_all2[sel] = mesh.find_triangles(mid_all[:R][sel, :2])
        cand_rows = np.flatnonzero(tri_idx_all2 >= 0)

        # phase 3 skip rules (reference relax_problem.cpp:435-466):
        # measurements in multi-ray tracks, or whose cells in BOTH images
        # are already track-covered, are redundant
        if len(cand_rows):
            if used_measurements:
                um_n = np.asarray(
                    [nid_dense.get(k[0], -1) for k in used_measurements],
                    np.int64,
                )
                um_f = np.asarray([k[1] for k in used_measurements], np.int64)
                um_keys = um_n * (1 << 24) + um_f
                k1_keys = src_nid[row_edge[cand_rows]] * (1 << 24) + idx1_all[cand_rows]
                k2_keys = dst_nid[row_edge[cand_rows]] * (1 << 24) + idx2_all[cand_rows]
                in_track = np.isin(k1_keys, um_keys) | np.isin(k2_keys, um_keys)
                cand_rows = cand_rows[~in_track]
        if len(cand_rows) and covered_cells:
            cov_keys = np.asarray(
                [
                    nid_dense[nid] * (1 << 28)
                    + ((cx & 0x3FFF) << 14) + (cy & 0x3FFF)
                    for nid, cs in covered_cells.items()
                    for cx, cy in cs
                    if nid in nid_dense
                ],
                np.int64,
            )
            g1 = np.floor(
                px1_all[cand_rows] / dims_src[row_edge[cand_rows]] / grid_fraction
            ).astype(np.int64)
            g2 = np.floor(
                px2_all[cand_rows] / dims_dst[row_edge[cand_rows]] / grid_fraction
            ).astype(np.int64)
            c1k = src_nid[row_edge[cand_rows]] * (1 << 28) + (
                (g1[:, 0] & 0x3FFF) << 14
            ) + (g1[:, 1] & 0x3FFF)
            c2k = dst_nid[row_edge[cand_rows]] * (1 << 28) + (
                (g2[:, 0] & 0x3FFF) << 14
            ) + (g2[:, 1] & 0x3FFF)
            both_cov = np.isin(c1k, cov_keys) & np.isin(c2k, cov_keys)
            cand_rows = cand_rows[~both_cov]

        if len(cand_rows):
            re = row_edge[cand_rows]
            tri = mesh.triangles[tri_idx_all2[cand_rows]]  # [K, 3]
            b_vert.append(tri)
            b_trixy.append(mesh.vertices[tri][:, :, :2])
            cam5 = np.zeros((len(cand_rows), 5), np.int64)
            cam5[:, 0] = src_slot[re]
            cam5[:, 1] = dst_slot[re]
            b_cam.append(cam5)
            valid5 = np.zeros((len(cand_rows), 5), bool)
            valid5[:, :2] = True
            b_valid.append(valid5)
            b_model.append(model_row[re])
            p1k = px1_all[cand_rows]
            p2k = px2_all[cand_rows]
            b_pix.append(np.stack([p1k, p2k, p1k, p1k, p1k], axis=1))
            r1k = r1c_all[cand_rows]
            r2k = r2c_all[cand_rows]
            b_dir.append(np.stack([r1k, r2k, r1k, r1k, r1k], axis=1))

    _pm_filter.__exit__()

    if not b_vert:
        return None

    _pm_stack = PerformanceMeasure("build: stack blocks")
    # b_* hold a few WHOLE-ARRAY parts (tracks part + edges part), not
    # per-row views — concatenate is O(rows) memcpy, no Python per row
    v_all = np.concatenate(b_vert)
    NB = len(v_all)
    nb = _bucket(NB, minimum=64)
    common = dict(
        vert_idx=np.asarray(_pad_rows(v_all, nb), np.int32),
        tri_xy=np.asarray(_pad_rows(np.concatenate(b_trixy), nb), dtype),
        cam_idx=np.asarray(_pad_rows(np.concatenate(b_cam), nb), np.int32),
        ray_valid=_pad_rows(np.concatenate(b_valid), nb, fill=False),
        weight=np.asarray(_pad_rows(np.ones(NB), nb), dtype),
        model_i=np.asarray(
            _pad_rows(np.concatenate(b_model).astype(np.int32), nb),
            np.int32,
        ),
    )
    if use_intrinsics:
        blk = B.plane_ray_block(
            layout,
            pixel=np.asarray(_pad_rows(np.concatenate(b_pix), nb), dtype),
            **common,
        )
    else:
        blk = B.plane_ray_block(
            layout,
            fixed_dir=np.asarray(_pad_rows(np.concatenate(b_dir), nb), dtype),
            **common,
        )

    blocks = [blk]
    blocks.append(
        B.downwards_prior_block(
            layout, np.arange(len(quats), dtype=np.int32), np.asarray(opt, dtype)
        )
    )
    if options.ground_mesh:
        edges_all = mesh.all_edges()
        if len(edges_all):
            blocks.append(
                B.mesh_flat_block(
                    layout,
                    np.asarray(edges_all[:, 0], np.int32),
                    np.asarray(edges_all[:, 1], np.int32),
                    np.ones(len(edges_all), dtype),
                )
            )
        blocks.append(
            B.mesh_anchor_block(
                layout,
                np.arange(mesh.num_vertices, dtype=np.int32),
                np.asarray(mesh.vertices[:, 2], dtype),
                np.ones(mesh.num_vertices, dtype),
            )
        )
        interior, opposite, _ = mesh.interior_edges()
        if len(interior):
            v = mesh.vertices
            blocks.append(
                B.mesh_smooth_block(
                    layout,
                    np.asarray(interior[:, 0], np.int32),
                    np.asarray(interior[:, 1], np.int32),
                    np.asarray(opposite[:, 0], np.int32),
                    np.asarray(opposite[:, 1], np.int32),
                    np.asarray(v[interior[:, 0], :2], dtype),
                    np.asarray(v[interior[:, 1], :2], dtype),
                    np.asarray(v[opposite[:, 0], :2], dtype),
                    np.asarray(v[opposite[:, 1], :2], dtype),
                    np.ones(len(interior), dtype),
                )
            )
    if use_intrinsics and inv_models:
        # the monotonicity prior is present whenever intrinsics are in the
        # problem, gated by WEIGHT (0 until a radial tier opens) — so the
        # camera-parameter tier schedule (radial 0 -> 1 -> 2 -> 3) changes
        # only values/masks and the cached problem STRUCTURE survives the
        # whole state (the tier switch previously forced a full rebuild)
        r_max, obs_w, midx = [], [], []
        for mid, slot in model_index.items():
            m = cam_models.get(mid)
            if m is None:
                continue
            half = np.hypot(float(m.pixels_cols), float(m.pixels_rows)) / 2.0
            r_max.append(half / max(float(m.focal_length_pixels), 1.0))
            obs_w.append(np.sqrt(NB / 10.0))
            midx.append(slot)
        if midx:
            w_tier = 1.0 if options.radial_tier > 0 else 0.0
            blocks.append(
                B.monotonicity_block(
                    layout, np.asarray(midx, np.int32),
                    np.asarray(r_max, dtype), np.asarray(obs_w, dtype),
                    np.full(len(midx), w_tier, dtype),
                )
            )

    _pm_stack.__exit__()
    mesh_free = np.arange(V_pad) < V_real  # padded slots frozen
    free = layout.build_free_mask(
        rot_free=np.asarray(opt) if options.orientation else np.zeros(len(quats), bool),
        mesh_free=mesh_free,
        focal_free=options.focal,
        principal_free=options.principal,
        radial_tiers=options.radial_tier,
    )
    surface_free = layout.build_free_mask(
        rot_free=np.zeros(len(quats), bool), mesh_free=mesh_free
    )
    return BuiltProblem(
        params=params, layout=layout, blocks=blocks, free_mask=free,
        surface_free_mask=surface_free, cam_index=cam_index,
        model_index=model_index, mesh=mesh, inverse_models=True,
        track_points=np.concatenate(tp_list) if tp_list else np.zeros((0, 3)),
        track_errors=np.concatenate(te_list) if te_list else np.zeros(0),
        kind="mesh", num_opt=len(node_poses), v_real=V_real,
    )


def build_points_problem(
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    cam_models: Dict[int, CameraModel],
    edge_ids: Sequence[int],
    options: RelaxOptions,
    grid_fraction: float = 0.05,
    dtype=None,
) -> Optional[BuiltProblem]:
    """3d-point bundle adjustment (setup3dPointProblem,
    reference relax_problem.cpp:122-145 + addPointMeasurementsCost
    :986-1190): each surviving inlier match becomes one optimizable 3d
    point with two pixel-reprojection residuals against the FORWARD camera
    models. The reference solves this with SPARSE_SCHUR; here points live
    in the dense tangent (grid filtering bounds their count per group —
    distributed/Schur elimination for the full-survey scale lives in
    parallel.sharded_ba)."""
    if dtype is None:
        dtype = _wide()
    cam_index, quats, positions, opt = _gather_cameras(graph, node_poses, edge_ids)
    if len(quats) < 2:
        return None
    edge_list = _usable_edges(graph, cam_index, edge_ids)
    if not edge_list:
        return None

    model_index: Dict[int, int] = {}
    fwd_list: List[CameraModel] = []
    for mid, m in sorted(cam_models.items()):
        model_index[mid] = len(fwd_list)
        fwd_list.append(m.astype(_wide()))
    if not fwd_list:
        return None
    M_count = len(fwd_list)
    node_model = {nid: graph.get_node(nid).payload.model_id for nid in cam_index}
    fwd_models = {mid: cam_models[mid].astype(_wide()) for mid in cam_models}

    pts_list = []
    err_list = []
    obs = dict(cam_i=[], point_i=[], model_i=[], pixel=[])

    for edge_id in edge_list:
        e = graph.get_edge(edge_id)
        rel = e.payload
        n = len(rel.inlier_idx1)
        if n == 0:
            continue
        s_model = fwd_models.get(node_model[e.source])
        d_model = fwd_models.get(node_model[e.dest])
        if s_model is None or d_model is None:
            continue
        px1 = np.asarray(rel.inlier_pixel1, np.float64)
        px2 = np.asarray(rel.inlier_pixel2, np.float64)
        r1, r2 = D.distort_keypoints(jnp.asarray(px1), jnp.asarray(px2), s_model, d_model)
        q1 = quats[cam_index[e.source]]
        q2 = quats[cam_index[e.dest]]
        p1w = positions[cam_index[e.source]]
        p2w = positions[cam_index[e.dest]]
        r1w = np.asarray(quat_rotate(jnp.asarray(q1)[None], r1))
        r2w = np.asarray(quat_rotate(jnp.asarray(q2)[None], r2))
        dist = (
            np.asarray(rel.match_distance)[np.asarray(rel.inlier_match_index)]
            if len(rel.match_distance)
            else np.zeros(n)
        )
        dims1 = (float(s_model.pixels_cols), float(s_model.pixels_rows))
        dims2 = (float(d_model.pixels_cols), float(d_model.pixels_rows))
        keep = _grid_filter_edge(
            px1, px2, r1w, r2w, p1w, p2w, dist,
            np.asarray(rel.ransac_relation), dims1, dims2, grid_fraction,
        )
        if not keep.any():
            continue
        k = np.where(keep)[0]
        mid, err = ray_intersection(
            jnp.asarray(r1w[k]), jnp.asarray(np.repeat(p1w[None], len(k), 0)),
            jnp.asarray(r2w[k]), jnp.asarray(np.repeat(p2w[None], len(k), 0)),
        )
        mid = np.asarray(mid)
        err = np.asarray(err)
        finite = np.isfinite(mid).all(axis=1)
        for j, ki in zip(np.where(finite)[0], k[finite]):
            p_idx = len(pts_list)
            pts_list.append(mid[j])
            err_list.append(err[j])
            for nid, px in ((e.source, px1[ki]), (e.dest, px2[ki])):
                obs["cam_i"].append(cam_index[nid])
                obs["point_i"].append(p_idx)
                obs["model_i"].append(model_index[node_model[nid]])
                obs["pixel"].append(px)

    if not pts_list:
        return None

    P_count = len(pts_list)
    layout = TangentLayout(len(quats), 0, P_count, M_count)
    params = RelaxParams.create(
        np.asarray(quats, dtype), np.asarray(positions, dtype),
        points=np.asarray(np.stack(pts_list), dtype),
        focal=np.asarray([float(m.focal_length_pixels) for m in fwd_list], dtype),
        principal=jnp.asarray(
            np.stack([np.asarray(m.principal_point) for m in fwd_list]), dtype
        ),
        radial=jnp.asarray(
            np.stack([np.asarray(m.radial_distortion) for m in fwd_list]), dtype
        ),
        tangential=jnp.asarray(
            np.stack([np.asarray(m.tangential_distortion) for m in fwd_list]), dtype
        ),
    )

    nb = _bucket(len(obs["cam_i"]), minimum=64)
    blk = B.pixel_error_block(
        layout,
        _pad_rows(np.asarray(obs["cam_i"], np.int32), nb),
        _pad_rows(np.asarray(obs["point_i"], np.int32), nb),
        _pad_rows(np.asarray(obs["model_i"], np.int32), nb),
        np.asarray(_pad_rows(np.stack(obs["pixel"]), nb), dtype),
        np.asarray(_pad_rows(np.ones(len(obs["cam_i"])), nb), dtype),
    )
    blocks = [blk]

    if options.any_intrinsics:
        # weight-gated like the mesh problem: tier changes stay value-only
        r_max, obs_w, midx = [], [], []
        for mid, slot in model_index.items():
            m = cam_models[mid]
            half = np.hypot(float(m.pixels_cols), float(m.pixels_rows)) / 2.0
            r_max.append(half / max(float(m.focal_length_pixels), 1.0))
            obs_w.append(np.sqrt(P_count / 10.0))
            midx.append(slot)
        w_tier = 1.0 if options.radial_tier > 0 else 0.0
        blocks.append(
            B.monotonicity_block(
                layout, np.asarray(midx, np.int32),
                np.asarray(r_max, dtype), np.asarray(obs_w, dtype),
                np.full(len(midx), w_tier, dtype),
            )
        )

    free = layout.build_free_mask(
        rot_free=np.asarray(opt) if options.orientation else np.zeros(len(quats), bool),
        points_free=True,
        focal_free=options.focal,
        principal_free=options.principal,
        radial_tiers=options.radial_tier,
        tangential_free=options.tangential,
    )
    surface_free = layout.build_free_mask(
        rot_free=np.zeros(len(quats), bool), points_free=True
    )
    return BuiltProblem(
        params=params, layout=layout, blocks=blocks, free_mask=free,
        surface_free_mask=surface_free, cam_index=cam_index,
        model_index=model_index, mesh=None, inverse_models=False,
        track_points=np.stack(pts_list), track_errors=np.asarray(err_list),
        kind="points", num_opt=len(node_poses), v_real=0,
    )


def refresh_problem(
    built: BuiltProblem,
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    cam_models: Dict[int, CameraModel],
    previous_surfaces: Sequence[SurfaceModel],
    options: RelaxOptions,
) -> bool:
    """Refresh a cached BuiltProblem's parameter VALUES (poses, mesh z,
    intrinsics), free masks, and anchor targets from current pipeline
    state — without re-running measurement selection (grid filter, track
    building, triangle assignment).

    REPEAT iterations of a relax state re-solve the same structure with
    slightly moved parameters; the reference pays a full Ceres setup per
    pass (relax_stage.cpp:100-111), which at survey scale costs as much
    as the solve itself. Structure that IS stale after a refresh — which
    triangle a measurement's triangulated point falls in, fixed ray
    directions — moves second-order between converging passes; anything
    that changes it structurally (mesh refinement, edge refit, new
    images) must invalidate the cache key instead (pipeline holds the
    key). Returns False when the cached structure no longer matches (the
    caller then rebuilds from scratch)."""
    dt = np.asarray(built.params.quats).dtype
    pose_by_id = {p.node_id: p for p in node_poses}

    C = built.params.C
    quats = np.array(np.asarray(built.params.quats), np.float64)
    positions = np.array(np.asarray(built.params.positions), np.float64)
    for nid, slot in built.cam_index.items():
        p = pose_by_id.get(nid)
        if p is not None:
            q, pos = np.asarray(p.orientation, np.float64), np.asarray(p.position, np.float64)
        else:
            node = graph.get_node(nid)
            if node is None:
                return False
            q = np.asarray(node.payload.orientation, np.float64)
            pos = np.asarray(node.payload.position, np.float64)
        if not np.isfinite(q).all():
            q = DOWN_QUAT
        if slot >= C or not np.isfinite(pos).all():
            return False
        quats[slot] = q
        positions[slot] = pos

    mesh_z = np.array(np.asarray(built.params.mesh_z), np.float64)
    if built.kind == "mesh":
        prev_mesh = None
        for s in previous_surfaces:
            if s.mesh is not None and s.mesh.num_vertices == built.mesh.num_vertices:
                prev_mesh = s.mesh
        if prev_mesh is None or not np.array_equal(
            prev_mesh.triangles, built.mesh.triangles
        ):
            return False
        built.mesh.vertices[:, 2] = prev_mesh.vertices[:, 2]
        mesh_z[: built.v_real] = prev_mesh.vertices[:, 2]

    focal = np.array(np.asarray(built.params.focal), np.float64)
    principal = np.array(np.asarray(built.params.principal), np.float64)
    radial = np.array(np.asarray(built.params.radial), np.float64)
    tangential = np.array(np.asarray(built.params.tangential), np.float64)
    for mid, slot in built.model_index.items():
        m = cam_models.get(mid)
        if m is None:
            continue
        m = m.astype(_wide())
        if built.inverse_models:
            m = D.convert_to_inverse(m)
        focal[slot] = float(m.focal_length_pixels)
        principal[slot] = np.asarray(m.principal_point)
        radial[slot] = np.asarray(m.radial_distortion)
        tangential[slot] = np.asarray(m.tangential_distortion)

    # host numpy leaves on purpose: the group stackers re-pad and re-stack
    # these every repeat — device leaves would cost a synchronizing D2H
    # pull per leaf per group per iteration (47 s of a 104-image run
    # through the remote-TPU tunnel); numpy keeps the refresh free and the
    # stack pays one H2D per leaf
    built.params = dataclasses.replace(
        built.params,
        quats=quats.astype(dt),
        positions=positions.astype(dt),
        mesh_z=mesh_z.astype(dt),
        focal=focal.astype(dt),
        principal=principal.astype(dt),
        radial=radial.astype(dt),
        tangential=tangential.astype(dt),
    )

    # free masks follow the option schedule (Brown tiers / principal live
    # in the mask, not the block structure)
    layout = built.layout
    opt = np.arange(C) < built.num_opt
    rot_free = np.asarray(opt) if options.orientation else np.zeros(C, bool)
    if built.kind == "mesh":
        mesh_free = np.arange(layout.V) < built.v_real
        built.free_mask = layout.build_free_mask(
            rot_free=rot_free, mesh_free=mesh_free,
            focal_free=options.focal, principal_free=options.principal,
            radial_tiers=options.radial_tier,
        )
        built.surface_free_mask = layout.build_free_mask(
            rot_free=np.zeros(C, bool), mesh_free=mesh_free
        )
    elif built.kind == "points":
        built.free_mask = layout.build_free_mask(
            rot_free=rot_free, points_free=True,
            focal_free=options.focal, principal_free=options.principal,
            radial_tiers=options.radial_tier,
            tangential_free=options.tangential,
        )
        built.surface_free_mask = layout.build_free_mask(
            rot_free=np.zeros(C, bool), points_free=True
        )

    # the anchor prior follows the pass-entry mesh (the reference rebuilds
    # each pass, anchoring to the entry z — same semantics)
    mid_of_slot = {slot: mid for mid, slot in built.model_index.items()}
    for i, blk in enumerate(built.blocks):
        if blk.name == "mesh_anchor":
            z_now = np.asarray(
                built.mesh.vertices[np.asarray(blk.data["v_i"]), 2], dt
            )
            data = dict(blk.data)
            data["target"] = z_now
            built.blocks[i] = dataclasses.replace(blk, data=data)
        elif blk.name == "monotonicity":
            # tier schedule lives in the WEIGHT (0 = prior off); r_max
            # tracks the current focal the way a rebuild would
            w_tier = 1.0 if options.radial_tier > 0 else 0.0
            r_max = np.array(np.asarray(blk.data["r_max"]), np.float64)
            for r, slot in enumerate(np.asarray(blk.data["model_i"])):
                m = cam_models.get(mid_of_slot.get(int(slot)))
                if m is not None:
                    half = np.hypot(
                        float(m.pixels_cols), float(m.pixels_rows)
                    ) / 2.0
                    r_max[r] = half / max(float(m.focal_length_pixels), 1.0)
            data = dict(blk.data)
            data["r_max"] = np.asarray(r_max, dt)
            built.blocks[i] = dataclasses.replace(
                blk,
                data=data,
                weight=np.full_like(np.asarray(blk.weight), w_tier),
            )
    return True


def solve_problem(
    built: BuiltProblem,
    node_poses: Sequence[NodePose],
    cam_models: Optional[Dict[int, CameraModel]] = None,
    pre_solve_surface: bool = False,
    max_iterations: int = lm.DEFAULT_MAX_ITERATIONS,
) -> SurfaceModel:
    """Run LM (optionally the mesh-only pre-solve first), write results
    back into node_poses / cam_models, return the surface model
    (solve + getSurfaceModel, reference relax_problem.cpp:1390-1507)."""
    params = built.params
    if pre_solve_surface and bool(jnp.any(built.surface_free_mask)):
        params, _ = lm.solve(
            params, built.blocks, built.layout, built.surface_free_mask,
            max_iterations=max_iterations,
        )
    params, info = lm.solve(
        params, built.blocks, built.layout, built.free_mask,
        max_iterations=max_iterations,
    )
    return apply_solution(built, params, node_poses, cam_models)


def apply_solution(
    built: BuiltProblem,
    params: RelaxParams,
    node_poses: Sequence[NodePose],
    cam_models: Optional[Dict[int, CameraModel]] = None,
) -> SurfaceModel:
    """Write solved parameters back into node_poses / cam_models and build
    the surface model (getSurfaceModel, reference relax_problem.cpp:1449-1507).
    Split from solve_problem so batched/sharded group solvers
    (parallel.group_solver) can reuse the identical write-back."""
    quats = np.asarray(params.quats)
    for np_ in node_poses:
        slot = built.cam_index.get(np_.node_id)
        if slot is not None:
            np_.orientation = quats[slot]

    if cam_models is not None and built.model_index:
        for mid, slot in built.model_index.items():
            if mid not in cam_models:
                continue
            old = cam_models[mid]
            if built.inverse_models:
                inv = CameraModel(
                    focal_length_pixels=params.focal[slot],
                    principal_point=params.principal[slot],
                    radial_distortion=params.radial[slot],
                    tangential_distortion=params.tangential[slot],
                    pixels_cols=old.pixels_cols,
                    pixels_rows=old.pixels_rows,
                    tag=INVERSE,
                )
                changed = not np.allclose(
                    np.asarray(inv.radial_distortion),
                    -np.asarray(old.radial_distortion),
                    atol=1e-12,
                ) or not np.isclose(
                    float(inv.focal_length_pixels), float(old.focal_length_pixels)
                )
                if changed:
                    cam_models[mid] = D.convert_to_forward(inv).astype(old.dtype)
            else:
                # points problems optimize the forward models directly
                cam_models[mid] = old.replace(
                    focal_length_pixels=np.asarray(
                        params.focal[slot], old.dtype
                    ),
                    principal_point=np.asarray(params.principal[slot], old.dtype),
                    radial_distortion=np.asarray(params.radial[slot], old.dtype),
                    tangential_distortion=np.asarray(
                        params.tangential[slot], old.dtype
                    ),
                )

    surface = SurfaceModel()
    if built.mesh is not None:
        mesh = built.mesh.copy()
        mesh.vertices[:, 2] = np.asarray(params.mesh_z)[: mesh.num_vertices]
        surface.mesh = mesh
    if built.params.P > 0 and not built.inverse_models:
        # optimized 3d points are the cloud (points problem)
        pts = np.asarray(params.points)
        good = np.isfinite(pts).all(axis=1)
        if good.any():
            surface.cloud.append(pts[good])
    else:
        good = np.isfinite(built.track_errors) & (np.abs(built.track_errors) < 1.0)
        if good.any():
            surface.cloud.append(built.track_points[good])
    return surface
