"""Pipeline stages: load, link, relax.

TPU-first re-design of reference src/pipeline/load_stage.cpp,
link_stage.cpp, relax_stage.cpp. The reference expresses each stage as a
list of per-item closures run under OpenMP; here each stage is
host-orchestrated *batched device work*:

* LoadStage: thread-pooled JPEG decode on host (cv2 releases the GIL; the
  decode itself is native), then ONE batched feature-extraction call for
  the whole batch of images;
* LinkStage: candidate pairs matched and RANSAC'd in vmapped chunks with
  padded per-image feature subsets;
* RelaxStage: spectral clustering into bounded groups (reference
  relax_stage.cpp:48-57), each group solved as one dense-LM device
  problem with frozen-boundary halos, surfaces merged at finalize.

Determinism contract (reference SURVEY section 2.3 item 6): every stage
sorts its results into canonical order before mutating the graph.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import functools
import json
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from opencalibration_tpu.extract.image_loader import (
    DecodedImage,
    camera_model_kwargs,
    batch_sparse_masks,
    features_from_device,
    load_and_decode,
    pad_gray_batch,
)
from opencalibration_tpu.geo.geo_coord import GeoCoord
from opencalibration_tpu.ops import distort as D
from opencalibration_tpu.ops import features as F
from opencalibration_tpu.ops import hamming as H
from opencalibration_tpu.ops import ransac as R
from opencalibration_tpu.ops.clustering import spectral_cluster
from opencalibration_tpu.relax.problem_builder import RelaxOptions
from opencalibration_tpu.relax.relax import relax
from opencalibration_tpu.types.camera import CameraModel, stack_cameras, take_camera
from opencalibration_tpu.types.graph import (
    CameraRelations,
    ImageNode,
    MeasurementGraph,
    NodePose,
    RelationType,
    SurfaceModel,
)

MAX_FEATURES = 2048

def _wide():
    """float64 when x64 is enabled (CPU parity tests), float32 otherwise
    (TPU has no f64 — this avoids per-call truncation warnings)."""
    import jax

    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

LINK_SUBSET = 1024  # padded per-image sparse subset for matching
COARSE_SPACING_PIXELS = 40.0  # reference link_stage.cpp:63
KNN_NEIGHBOURS = 10  # reference link_stage.cpp:22-38
POSE_GROUP_SIZE = 50  # reference relax_stage.cpp:48-57
INTRINSICS_GROUP_SIZE = 150


def _apply_sidecar_metadata(node: ImageNode):
    """Optional `<image>.json` sidecar overrides EXIF fields — extension
    point for externally geotagged surveys and synthetic tests."""
    sidecar = os.path.splitext(node.path)[0] + ".json"
    if not os.path.exists(sidecar):
        return
    try:
        with open(sidecar) as f:
            data = json.load(f)
    except (OSError, json.JSONDecodeError):
        return
    md = node.metadata
    for key in (
        "latitude", "longitude", "altitude", "relative_altitude",
        "focal_length_px", "camera_make", "camera_model", "lens_model",
        "gps_accuracy_xy", "gps_accuracy_z",
    ):
        if key in data:
            setattr(md, key, data[key])


class LoadStage:
    """reference src/pipeline/load_stage.cpp:11-108."""

    def __init__(self, max_features: int = MAX_FEATURES):
        self.max_features = max_features
        self._decoded: List[Optional[DecodedImage]] = []
        self._paths: List[str] = []

    def init(self, paths: Sequence[str]):
        self._paths = list(paths)
        self._decoded = []
        self._futures = None
        self._executor = None

    def start_decode(self, parallelism: int = 8):
        """Kick off host-side JPEG decode on a thread pool WITHOUT
        blocking — the heterogeneous-overlap half of the reference's
        interleaved staged pipeline (pipeline.cpp:548-556): batch N
        decodes on host threads while the device links batch N-1 and
        relaxes batch N-2."""
        if not self._paths:
            return
        self._executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=parallelism
        )
        self._futures = [
            self._executor.submit(load_and_decode, p) for p in self._paths
        ]

    def finish(self):
        """Join the decode threads and run ONE batched device extraction."""
        from opencalibration_tpu.utils.performance import PerformanceMeasure

        with PerformanceMeasure("load: decode join"):
            if self._futures is not None:
                self._decoded = [f.result() for f in self._futures]
                self._executor.shutdown(wait=False)
                self._futures = None
                self._executor = None
            if not self._paths:
                self._decoded = []
                return
            for d in self._decoded:
                if d is not None:
                    _apply_sidecar_metadata(d.node)

        good = [d for d in self._decoded if d is not None]
        if not good:
            return
        with PerformanceMeasure("load: extract device"):
            batch, sizes = pad_gray_batch([d.gray for d in good])
            out = F.extract_features(
                jnp.asarray(batch), max_features=self.max_features
            )
            # one device_get + one batched NMS dispatch per image size —
            # NOT a device round-trip per image (remote-TPU tunnel
            # latency made the per-image path dominate the load stage)
            out_np, sparse_masks = batch_sparse_masks(out, sizes)
            for i, d in enumerate(good):
                d.node.features = features_from_device(
                    out_np, i, d.scale, sizes[i], self.max_features,
                    sparse_mask=sparse_masks[i],
                )

    def run(self, parallelism: int = 8):
        if self._futures is None:
            self.start_decode(parallelism)
        self.finish()

    def finalize(
        self,
        graph: MeasurementGraph,
        geocoord: GeoCoord,
        model_store: Dict[int, CameraModel],
        model_key_to_id: Dict[tuple, int],
        gps_positions: Dict[int, np.ndarray],
    ) -> List[int]:
        """Deterministic (input-order) graph mutation: dedup camera models
        by camera_info equality, set the GeoCoord origin from the first
        GPS-tagged image, convert GPS to local positions."""
        new_ids = []
        for d in self._decoded:
            if d is None:
                continue  # unloadable image skipped (extract_image.cpp:37-40)
            node = d.node
            md = node.metadata
            key = (
                md.camera_make, md.camera_model, md.lens_model,
                md.width_px, md.height_px, round(md.focal_length_px or 0.0, 3),
            )
            if key not in model_key_to_id:
                kw = camera_model_kwargs(md)
                model_id = len(model_store) + 1
                if not math.isfinite(kw["focal_length_pixels"] or float("nan")):
                    # last-resort prior: ~55deg horizontal FOV
                    kw["focal_length_pixels"] = max(md.width_px, md.height_px)
                model_key_to_id[key] = model_id
                model_store[model_id] = CameraModel.create(dtype=None, **kw)
            node.model_id = model_key_to_id[key]

            if md.has_gps():
                if not geocoord.is_initialized():
                    geocoord.set_origin(md.latitude, md.longitude)
                alt = md.altitude if math.isfinite(md.altitude) else 0.0
                node.position = geocoord.to_local(md.latitude, md.longitude, alt)
            node_id = graph.add_node(node)
            if np.isfinite(node.position[:2]).all():
                gps_positions[node_id] = node.position[:2].copy()
            new_ids.append(node_id)
        self._decoded = []
        self._paths = []
        return new_ids


def _subsample_for_link(feats, model: CameraModel):
    """Strength-ordered spatially-spread subset padded to LINK_SUBSET
    (reference match_features.cpp:8-52 with 40px spacing).

    The reference's 40px min-spacing is calibrated for its <=1600px
    extraction resolution (extract_features.cpp:25-33); smaller inputs get
    a proportionally finer grid so the subset keeps the same angular
    density (a fixed 40px grid on a 320px test image would leave only ~48
    candidates and starve RANSAC on wide-baseline pairs)."""
    from opencalibration_tpu.ops.spatial import spatial_subsample

    from opencalibration_tpu.relax.problem_builder import _bucket, _pad_rows

    n = len(feats.xy)
    count = feats.num_sparse if feats.num_sparse > 0 else n
    # bucket the candidate count so the jitted subsample compiles once per
    # bucket, not once per image (a 96-image survey would otherwise pay
    # ~96 fresh compiles here)
    nb = _bucket(max(count, 1), minimum=256)
    xy = _pad_rows(feats.xy[:count], nb)
    strength = _pad_rows(feats.strength[:count], nb)
    valid = _pad_rows(feats.valid[:count], nb, fill=False)
    cols = max(float(model.pixels_cols), 1.0)
    rows = max(float(model.pixels_rows), 1.0)
    spacing = COARSE_SPACING_PIXELS * min(1.0, max(cols, rows) / 1600.0)
    spacing = max(spacing, 4.0)
    ncx = max(2, int(math.ceil(cols / spacing)))
    ncy = max(2, int(math.ceil(rows / spacing)))
    keep = np.asarray(
        spatial_subsample(
            jnp.asarray(xy), jnp.asarray(strength),
            jnp.asarray(valid), spacing, ncx, ncy,
        )
    )[:count]
    idx = np.where(keep)[0][:LINK_SUBSET]
    pad = LINK_SUBSET - len(idx)
    sel = np.concatenate([idx, np.zeros(pad, np.int64)])
    valid = np.concatenate([np.ones(len(idx), bool), np.zeros(pad, bool)])
    return sel.astype(np.int32), valid


def _match_and_ransac_one(
    desc1, xy1, valid1, desc2, xy2, valid2, model1, model2, num_hypotheses=2048
):
    """One candidate edge's device work (the body of the reference's link
    runner, link_stage.cpp:75-112): match -> undistort -> RANSAC
    homography -> decompose."""
    from opencalibration_tpu.ops.hamming import _match_descriptors_xla

    idx2, dist, matched = _match_descriptors_xla(desc1, desc2, valid1, valid2)
    mp2 = xy2[idx2]
    r1, r2 = D.distort_keypoints(xy1, mp2, model1, model2)
    res, quats, ts, scores = R.ransac_homography_with_poses(
        r1, r2, dist.astype(r1.dtype), matched, num_hypotheses=num_hypotheses
    )
    return dict(
        idx2=idx2, dist=dist, matched=matched,
        model=res.model, inliers=res.inliers, score=res.score,
        quats=quats, ts=ts, pose_scores=scores,
    )


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _match_and_ransac_batch(
    desc1, xy1, valid1, desc2, xy2, valid2, models1, models2, num_hypotheses=2048
):
    """Vmapped link work over a whole chunk of candidate pairs — one
    device dispatch instead of one per edge (the reference runs one OMP
    closure per pair; on TPU the batch IS the parallelism)."""
    return jax.vmap(
        functools.partial(_match_and_ransac_one, num_hypotheses=num_hypotheses)
    )(desc1, xy1, valid1, desc2, xy2, valid2, models1, models2)


LINK_CHUNK = 16  # pairs per device dispatch (padded to bucket)


class LinkStage:
    """reference src/pipeline/link_stage.cpp."""

    def __init__(self):
        self._candidates: List[Tuple[int, int]] = []
        self._results = []

    def init(
        self,
        graph: MeasurementGraph,
        gps_positions: Dict[int, np.ndarray],
        node_ids: Sequence[int],
    ):
        """Candidate edges: KNN_NEIGHBOURS nearest GPS neighbours per new
        node (link_stage.cpp:22-38)."""
        self._candidates = []
        self._results = []
        if not node_ids or len(gps_positions) < 2:
            return
        import scipy.spatial

        ids = sorted(gps_positions.keys())
        pts = np.stack([gps_positions[i] for i in ids])
        tree = scipy.spatial.cKDTree(pts)
        id_arr = np.asarray(ids)
        for nid in sorted(node_ids):
            if nid not in gps_positions:
                continue
            k = min(KNN_NEIGHBOURS + 1, len(ids))
            _, nn = tree.query(gps_positions[nid], k=k)
            for j in np.atleast_1d(nn):
                other = int(id_arr[j])
                if other == nid:
                    continue
                if graph.get_edge_id(nid, other) is not None:
                    continue
                if graph.get_edge_id(other, nid) is not None:
                    continue
                if (nid, other) in self._candidates or (other, nid) in self._candidates:
                    continue
                self._candidates.append((nid, other))

    def run(self, graph: MeasurementGraph, model_store: Dict[int, CameraModel]):
        # gather host-side per-pair arrays, then dispatch vmapped chunks;
        # the spatial subsample is per NODE, so cache it across pairs
        prepared = []
        sub_cache: Dict[int, tuple] = {}

        def subsample_of(nid, node, model):
            if nid not in sub_cache:
                sub_cache[nid] = _subsample_for_link(node.payload.features, model)
            return sub_cache[nid]

        for source, dest in self._candidates:
            ns, nd = graph.get_node(source), graph.get_node(dest)
            if ns is None or nd is None or ns.payload.features is None or nd.payload.features is None:
                continue
            ms = model_store[ns.payload.model_id].astype(jnp.float32)
            md = model_store[nd.payload.model_id].astype(jnp.float32)
            sel1, v1 = subsample_of(source, ns, ms)
            sel2, v2 = subsample_of(dest, nd, md)
            f1, f2 = ns.payload.features, nd.payload.features
            prepared.append(
                (
                    source, dest, sel1, sel2,
                    f1.descriptors[sel1], f1.xy[sel1].astype(np.float32), v1,
                    f2.descriptors[sel2], f2.xy[sel2].astype(np.float32), v2,
                    ms, md,
                )
            )

        for c0 in range(0, len(prepared), LINK_CHUNK):
            chunk = prepared[c0 : c0 + LINK_CHUNK]
            n = len(chunk)
            pad = LINK_CHUNK - n  # fixed chunk shape keeps the jit cache hot
            chunk_p = chunk + [chunk[-1]] * pad
            out = _match_and_ransac_batch(
                jnp.asarray(np.stack([c[4] for c in chunk_p])),
                jnp.asarray(np.stack([c[5] for c in chunk_p])),
                jnp.asarray(np.stack([c[6] for c in chunk_p])),
                jnp.asarray(np.stack([c[7] for c in chunk_p])),
                jnp.asarray(np.stack([c[8] for c in chunk_p])),
                jnp.asarray(np.stack([c[9] for c in chunk_p])),
                stack_cameras([c[10] for c in chunk_p]),
                stack_cameras([c[11] for c in chunk_p]),
            )
            # keep DEVICE results: jax dispatch is async, so run() returns
            # while the chunks still execute — the relax stage's host-side
            # problem building then overlaps the link device work (the
            # reference interleaves load/link/relax runners the same way,
            # pipeline.cpp:548-556); finalize() synchronizes.
            self._results.append((chunk, n, out))

    def finalize(self, graph: MeasurementGraph) -> List[int]:
        """Deterministic sorted edge insertion (link_stage.cpp:119-143)."""
        resolved = []
        for chunk, n, out in self._results:
            out_np = jax.tree.map(np.asarray, out)
            for i in range(n):
                source, dest, sel1, sel2 = chunk[i][:4]
                resolved.append(
                    (
                        source, dest, sel1, sel2,
                        {k: v[i] for k, v in out_np.items()},
                    )
                )
        new_node_ids = set()
        for source, dest, sel1, sel2, out in sorted(
            resolved, key=lambda r: (r[0], r[1])
        ):
            matched = out["matched"]
            inliers = out["inliers"] & matched
            if inliers.sum() < 4 * 1.5:  # decompose gate like relax_group.cpp:168
                continue
            rel = CameraRelations()
            m = np.where(matched)[0]
            # matches sorted by descending distance (match_features.cpp:100)
            m = m[np.argsort(-out["dist"][m], kind="stable")]
            rel.match_idx1 = sel1[m].astype(np.int32)
            rel.match_idx2 = sel2[out["idx2"][m]].astype(np.int32)
            rel.match_distance = out["dist"][m].astype(np.float32)
            inl = np.where(inliers)[0]
            # rank of each match index within the sorted match list
            # (vectorized: the per-inlier np.where scan was O(|inl|*|m|)
            # Python work — ~20 s/iterate of 10k-scale link finalize)
            ranks = np.full(len(matched), -1, np.int64)
            ranks[m] = np.arange(len(m))
            inl = inl[np.argsort(ranks[inl])]
            ns, nd = graph.get_node(source), graph.get_node(dest)
            rel.inlier_idx1 = sel1[inl].astype(np.int32)
            rel.inlier_idx2 = sel2[out["idx2"][inl]].astype(np.int32)
            rel.inlier_pixel1 = ns.payload.features.xy[rel.inlier_idx1]
            rel.inlier_pixel2 = nd.payload.features.xy[rel.inlier_idx2]
            rel.inlier_match_index = np.where(
                ranks[inl] >= 0, ranks[inl], 0
            ).astype(np.int32)
            rel.ransac_relation = out["model"].astype(np.float64)
            rel.relation_type = RelationType.HOMOGRAPHY
            rel.rel_quats = out["quats"].astype(np.float64)
            rel.rel_positions = out["ts"].astype(np.float64)
            rel.rel_scores = out["pose_scores"].astype(np.float64)
            graph.add_edge(rel, source, dest)
            new_node_ids.update((source, dest))
        self._results = []
        self._candidates = []
        return sorted(new_node_ids)


@dataclasses.dataclass
class RelaxGroupState:
    node_ids: List[int]
    poses: List[NodePose]
    cam_models: Dict[int, CameraModel]
    edge_ids: List[int]
    # node ids whose solved poses finalize() writes back to the graph;
    # None = all poses. Multi-group intrinsics runs restrict write-back to
    # the CORE: cross-group halo duplicates are co-optimized locally but
    # owned (written) by their home group.
    write_ids: Optional[set] = None


@dataclasses.dataclass
class RelaxPlan:
    """Cached problem structure for REPEAT iterations of one relax state:
    groups + built problems + the stacked batch. The pipeline owns the
    cache key (graph/mesh/options structure); RelaxStage refreshes the
    parameter values each reuse (problem_builder.refresh_problem)."""

    key: tuple
    groups: List[RelaxGroupState]
    builts: list  # List[Optional[BuiltProblem]], one per group
    live: List[int]
    pre_solve: bool
    batch: object = None  # cached GroupBatch (stacked problems)


class RelaxStage:
    """Spectral-clustered group relaxation
    (reference src/pipeline/relax_stage.cpp + relax_group.cpp).

    Groups are solved in ONE batched device dispatch (padded to a common
    tangent layout, vmapped LM, sharded over a `groups` mesh axis when
    several devices are visible) — the TPU-native replacement for the
    reference's one-Ceres-solve-per-OMP-thread loop. Set
    ``use_batched_solver=False`` to fall back to the serial per-group
    path (used by parity tests)."""

    def __init__(self, use_batched_solver: bool = True):
        self._groups: List[RelaxGroupState] = []
        self._options = RelaxOptions()
        self._surfaces: List[SurfaceModel] = []
        self.use_batched_solver = use_batched_solver
        self._plan: Optional[RelaxPlan] = None  # set by reuse_plan
        self.last_plan: Optional[RelaxPlan] = None  # exported by run_all
        self._inflight = None  # (batch, solved, info, builts, live) between dispatch/join
        self.max_lm_iterations: Optional[int] = None  # None = lm.DEFAULT_MAX_ITERATIONS

    def init(
        self,
        graph: MeasurementGraph,
        node_ids: Sequence[int],
        gps_positions: Dict[int, np.ndarray],
        model_store: Dict[int, CameraModel],
        relax_all: bool,
        disable_parallelism: bool,
        options: RelaxOptions,
    ):
        self._options = options
        self._surfaces = []
        self._groups = []
        self._plan = None
        self.last_plan = None
        ids = (
            sorted(graph.node_ids())
            if relax_all
            else sorted(set(node_ids))
        )
        ids = [i for i in ids if graph.get_node(i) is not None]
        ids = [
            i for i in ids
            if np.isfinite(np.asarray(graph.get_node(i).payload.position)).all()
        ]
        if not ids:
            return

        group_size = (
            INTRINSICS_GROUP_SIZE if options.any_intrinsics else POSE_GROUP_SIZE
        )
        if disable_parallelism or len(ids) <= group_size:
            labels = np.zeros(len(ids), np.int64)
        else:
            idx_of = {nid: k for k, nid in enumerate(ids)}
            edges, weights = [], []
            for eid, e in graph.edges():
                if e.source in idx_of and e.dest in idx_of:
                    edges.append((idx_of[e.source], idx_of[e.dest]))
                    weights.append(max(1.0, float(len(e.payload.inlier_idx1))))
            pts = np.stack([np.asarray(graph.get_node(i).payload.position)[:2] for i in ids])
            labels = spectral_cluster(len(ids), edges, weights, pts, group_size)

        # big groups first (relax_stage.cpp:100)
        by_label: Dict[int, List[int]] = {}
        for nid, lab in zip(ids, labels):
            by_label.setdefault(int(lab), []).append(nid)
        # single group gets a depth-2 connection halo — the incremental
        # INITIAL_PROCESSING case: the new batch is co-optimized with its
        # already-placed 10-NN neighbours so it anchors to the solved
        # survey instead of relaxing against itself only
        # (reference relax_stage.cpp:95: depth = num_groups > 1 ? 0 : 2)
        depth = 0 if len(by_label) > 1 else 2
        for lab in sorted(by_label, key=lambda l: (-len(by_label[l]), l)):
            g_ids = by_label[lab]
            self._groups.append(
                self._build_group(graph, g_ids, gps_positions, model_store,
                                  connection_depth=depth)
            )

    def _build_group(
        self, graph, g_ids, gps_positions, model_store, connection_depth=0
    ) -> RelaxGroupState:
        """Working set: copies of poses + models, edges among 10-NN GPS
        neighbours; `connection_depth` rounds of frontier expansion add
        connected out-of-group nodes as CO-OPTIMIZED poses with their
        edges into the core (reference relax_group.cpp:14-111: halo nodes
        join _local_poses; only edges with one endpoint in the original
        group are optimized)."""
        import scipy.spatial

        core = set(g_ids)
        ids = sorted(gps_positions.keys())
        pts = np.stack([gps_positions[i] for i in ids]) if ids else np.zeros((0, 2))
        tree = scipy.spatial.cKDTree(pts) if len(ids) else None
        id_arr = np.asarray(ids)

        edge_ids = set()
        directly_connected = set()

        # Intrinsics runs additionally take CROSS-group edges whose SOURCE
        # lives in this group (source-side ownership: each cross edge is
        # counted by exactly one group in the joint objective). The out-of-
        # group endpoint joins as a CO-OPTIMIZED halo duplicate — its home
        # group owns the written-back pose; the local copy is free so the
        # measurement never drags the shared [mesh_z | intrinsics] tail
        # back toward the entry values (a FROZEN boundary copy pins the
        # focal/height valley at the prior: measured 420 -> 417.8 recovery
        # vs truth 400 on the shared-intrinsics fixture). This mirrors the
        # reference's halo semantics (relax_group.cpp:40-66: halo nodes
        # join _local_poses as optimized) applied per-group.
        cross_ok = self._options.any_intrinsics
        cross_halo = set()

        def build_edges(nid):
            node = graph.get_node(nid)
            if tree is None or nid not in gps_positions:
                return
            k = min(KNN_NEIGHBOURS + 1, len(ids))
            _, nn = tree.query(gps_positions[nid], k=k)
            ideal = {int(id_arr[j]) for j in np.atleast_1d(nn)} - {nid}
            for eid in node.edges:
                e = graph.get_edge(eid)
                other = e.dest if e.source == nid else e.source
                if other in ideal:
                    directly_connected.add(other)
                    # an edge is optimized iff its other endpoint is in
                    # the ORIGINAL group (relax_group.cpp:96-108): core
                    # edges from the core pass, halo->core edges from the
                    # frontier pass; halo-halo edges never join
                    if other in core:
                        edge_ids.add(eid)
                    elif cross_ok and nid in core and e.source == nid:
                        onode = graph.get_node(other)
                        if onode is not None and np.isfinite(
                            np.asarray(onode.payload.orientation)
                        ).all() and np.isfinite(
                            np.asarray(onode.payload.position)
                        ).all():
                            edge_ids.add(eid)
                            cross_halo.add(other)

        local = list(g_ids)
        for nid in g_ids:
            build_edges(nid)
        for _ in range(connection_depth):
            newly = sorted(directly_connected - set(local))
            for nid in newly:
                node = graph.get_node(nid)
                if node is None or not np.isfinite(
                    np.asarray(node.payload.position)
                ).all():
                    continue
                local.append(nid)
                build_edges(nid)
        cross_halo -= set(local)
        local.extend(sorted(cross_halo))

        poses = []
        # intrinsics runs carry the FULL model store so every group's
        # model slot list is identical — the shared-intrinsics batch then
        # aligns groups on one global intrinsics tail with no permutation
        cam_models = (
            dict(model_store) if self._options.any_intrinsics else {}
        )
        for nid in sorted(local, key=lambda i: graph.get_node(i).payload.path):
            node = graph.get_node(nid)
            poses.append(
                NodePose(
                    node_id=nid,
                    orientation=np.asarray(node.payload.orientation, np.float64).copy(),
                    position=np.asarray(node.payload.position, np.float64).copy(),
                )
            )
            mid = node.payload.model_id
            if mid not in cam_models and mid in model_store:
                cam_models[mid] = model_store[mid]
        return RelaxGroupState(
            node_ids=list(g_ids), poses=poses, cam_models=cam_models,
            edge_ids=sorted(edge_ids),
            write_ids=set(g_ids) if cross_halo else None,
        )

    def trim_groups(self, n: int):
        """Keep only the n biggest groups (intrinsics calibration uses the
        single biggest, reference pipeline.cpp:634)."""
        self._groups = self._groups[:n]

    def reuse_plan(
        self,
        plan: RelaxPlan,
        graph: MeasurementGraph,
        model_store: Dict[int, CameraModel],
        options: RelaxOptions,
    ):
        """Enter a REPEAT iteration from a cached plan instead of init():
        restore the groups, refresh their poses/models from the graph —
        run_all will then refresh the built problems' values in place of
        rebuilding structure."""
        self._options = options
        self._surfaces = []
        self._groups = plan.groups
        self._plan = plan
        self.last_plan = None
        for g in self._groups:
            for pose in g.poses:
                node = graph.get_node(pose.node_id)
                if node is None:
                    continue
                pose.orientation = np.asarray(
                    node.payload.orientation, np.float64
                ).copy()
                pose.position = np.asarray(
                    node.payload.position, np.float64
                ).copy()
            for mid in list(g.cam_models):
                if mid in model_store:
                    g.cam_models[mid] = model_store[mid]

    def run_all(self, graph: MeasurementGraph, previous_surfaces=()):
        """Build, solve and write back in one call (dispatch + join)."""
        self.dispatch(graph, previous_surfaces)
        self.join()

    def dispatch(self, graph: MeasurementGraph, previous_surfaces=()):
        """Host-side problem build + ASYNC device solve dispatch.

        The jitted LM solve runs on the device queue while the caller does
        other host work (the reference interleaves load/link/relax runners,
        pipeline.cpp:548-556; here the analogous overlap is host match prep
        vs the in-flight group solve). ``join()`` blocks on the results and
        writes them back; ``run_all`` = dispatch + join.
        """
        self._inflight = None
        self._surfaces = []
        if not self._groups:
            return
        if not self.use_batched_solver or len(self._groups) == 0:
            for g in self._groups:
                surf = relax(
                    graph, g.poses, g.cam_models, g.edge_ids, self._options,
                    previous_surfaces,
                )
                self._surfaces.append(surf)
            return

        from opencalibration_tpu.parallel.group_solver import (
            build_group_batch,
            extract_group_params,
            fetch_solved,
            refresh_group_batch,
            solve_group_batch,
            solve_group_batch_shared,
        )
        from opencalibration_tpu.relax.problem_builder import (
            apply_solution,
            refresh_problem,
        )
        from opencalibration_tpu.relax.relax import build_problem

        from opencalibration_tpu.utils.performance import PerformanceMeasure

        builts = None
        cached_batch = None
        pre_solve = False
        if self._plan is not None:
            with PerformanceMeasure("relax refresh problems"):
                ok = all(
                    b is None
                    or refresh_problem(
                        b, graph, g.poses, g.cam_models,
                        previous_surfaces, self._options,
                    )
                    for g, b in zip(self._groups, self._plan.builts)
                )
            if ok:
                builts = self._plan.builts
                pre_solve = self._plan.pre_solve
                cached_batch = self._plan.batch
            self._plan = None
        if builts is None:
            builts = []
            with PerformanceMeasure("relax build problems"):
                for g in self._groups:
                    built, pre = build_problem(
                        graph, g.poses, g.cam_models, g.edge_ids,
                        self._options, previous_surfaces,
                    )
                    builts.append(built)
                    pre_solve = pre_solve or (pre and built is not None)

        live = [i for i, b in enumerate(builts) if b is not None]
        self._surfaces = [SurfaceModel() for _ in self._groups]
        if not live:
            return
        self.last_plan = RelaxPlan(
            key=(), groups=self._groups, builts=builts, live=live,
            pre_solve=pre_solve,
        )
        # several groups optimizing the SAME camera models: couple the
        # intrinsics tail exactly across groups with the psum-Schur joint
        # solver — scaling past the reference's single-biggest-group
        # intrinsics shortcut (pipeline.cpp:634)
        shared = self._options.any_intrinsics and len(live) > 1
        with PerformanceMeasure("relax batch groups"):
            if cached_batch is not None and cached_batch.shared_intrinsics == shared:
                # structure cached: re-stack only values/masks/anchors
                batch = refresh_group_batch(cached_batch)
            else:
                batch = build_group_batch(
                    [builts[i] for i in live], shared_intrinsics=shared
                )
        self.last_plan.batch = batch
        from opencalibration_tpu.relax import lm

        iters = self.max_lm_iterations or lm.DEFAULT_MAX_ITERATIONS
        with PerformanceMeasure("relax solve dispatch"):
            if shared:
                solved, info = solve_group_batch_shared(
                    batch, pre_solve=pre_solve, max_iterations=iters
                )
            else:
                solved, info = solve_group_batch(
                    batch, pre_solve=pre_solve, max_iterations=iters
                )
        self._inflight = (batch, solved, info, builts, live)

    def join(self):
        """Block on the in-flight group solve and write results back."""
        if getattr(self, "_inflight", None) is None:
            return
        from opencalibration_tpu.parallel.group_solver import (
            extract_group_params,
            fetch_solved,
        )
        from opencalibration_tpu.relax.problem_builder import apply_solution
        from opencalibration_tpu.utils.performance import PerformanceMeasure

        batch, solved, info, builts, live = self._inflight
        self._inflight = None
        with PerformanceMeasure("relax solve"):
            # the jitted solve was dispatched asynchronously — reading the
            # iteration count is the first sync point, so keep it INSIDE
            # this measure or the whole solve compute shows up between
            # counters (observed: 2000s+ of a 1k-image run unattributed)
            if info is not None:
                from opencalibration_tpu.utils.performance import add_event_count

                try:
                    add_event_count(
                        "lm iterations",
                        float(np.sum(np.asarray(info.iterations))),
                    )
                except (AttributeError, TypeError):
                    pass
        with PerformanceMeasure("relax writeback"):
            solved = fetch_solved(solved)  # ONE device pull for all groups
            for k, i in enumerate(live):
                params_g = extract_group_params(batch, solved, k)
                g = self._groups[i]
                self._surfaces[i] = apply_solution(
                    builts[i], params_g, g.poses, g.cam_models
                )

    def finalize(
        self,
        graph: MeasurementGraph,
        model_store: Dict[int, CameraModel],
        refit: bool = True,
    ) -> List[int]:
        """Write poses/models back. ``refit=False`` defers the
        maximum-likelihood edge refit (reference runs it per finalize,
        relax_group.cpp:119-178); the pipeline defers it to the END of
        CAMERA_PARAMETER_RELAX — one refit per state instead of one per
        tier iteration, which both saves its wall time and keeps the
        cached problem structure valid across tiers."""
        optimized = []
        model_changed = self._options.any_intrinsics
        for g in self._groups:
            for pose in g.poses:
                if g.write_ids is not None and pose.node_id not in g.write_ids:
                    continue  # halo duplicate: home group owns the write
                node = graph.get_node(pose.node_id)
                if node is None:
                    continue
                node.payload.orientation = pose.orientation
                node.payload.position = pose.position
                optimized.append(pose.node_id)
            if model_changed:
                for mid, m in g.cam_models.items():
                    model_store[mid] = m
        if model_changed and refit:
            refit_all_edges(graph, model_store)
        self._groups = []
        return sorted(set(optimized))

    def surfaces(self) -> List[SurfaceModel]:
        return self._surfaces


@jax.jit
def _refit_edges_batch(px1, px2, valid, w0, models1, models2):
    """Vmapped 3x maximum-likelihood homography refit + decompose + pose
    scoring for a bucket of edges — one device dispatch per (E, N) shape
    instead of ~10 per edge (reference relax_group.cpp:119-178)."""
    from opencalibration_tpu.ops import models as M

    def one(px1, px2, valid, w, m1, m2):
        r1, r2 = D.distort_keypoints(px1, px2, m1, m2)
        p1 = M.hnormalize(r1)
        p2 = M.hnormalize(r2)

        def body(w, _):
            Hm = M.homography_fit_weighted(p1, p2, w)
            err = M.homography_error(Hm, p1, p2)
            inl = (err < M.HOMOGRAPHY_INLIER_THRESHOLD) & valid
            return inl.astype(w.dtype), Hm

        w, Hs = jax.lax.scan(body, w, None, length=3)
        Hm = Hs[-1]
        Rs, ts, nrm, _ = M.homography_decompose(Hm)
        scores = M.score_homography_poses(Rs, ts, nrm, r1, r2, w)
        quats = M.poses_to_quaternions(Rs)
        t_src = -jnp.einsum("kji,kj->ki", Rs, ts)
        return Hm, w > 0, quats, t_src, scores

    return jax.vmap(one)(px1, px2, valid, w0, models1, models2)


def refit_all_edges(graph: MeasurementGraph, model_store: Dict[int, CameraModel]):
    """Re-fit every edge's homography from its previous inliers after
    intrinsics changed — deterministic 'maximum likelihood' 3x refit
    (reference relax_group.cpp:119-178), batched: edges are bucketed by
    padded match count and each bucket refits in one vmapped dispatch."""
    from opencalibration_tpu.utils.performance import PerformanceMeasure

    with PerformanceMeasure("refit all edges"):
        return _refit_all_edges_impl(graph, model_store)


def _refit_all_edges_impl(graph, model_store):
    from opencalibration_tpu.relax.problem_builder import _bucket, _pad_rows

    entries = []
    for eid, e in sorted(graph.edges()):
        rel = e.payload
        n = len(rel.match_idx1)
        if n == 0:
            continue
        ns, nd = graph.get_node(e.source), graph.get_node(e.dest)
        ms = model_store[ns.payload.model_id].astype(_wide())
        mdm = model_store[nd.payload.model_id].astype(_wide())
        px1 = ns.payload.features.xy[rel.match_idx1]
        px2 = nd.payload.features.xy[rel.match_idx2]
        inliers = np.zeros(n, bool)
        valid_idx = rel.inlier_match_index[rel.inlier_match_index < n]
        inliers[valid_idx] = True
        if inliers.sum() < 4:
            continue
        entries.append((e, n, px1, px2, inliers, ms, mdm))

    # bucket by padded match count so jit shapes repeat
    buckets: Dict[int, list] = {}
    for entry in entries:
        buckets.setdefault(_bucket(entry[1], minimum=16), []).append(entry)

    for nb in sorted(buckets):
        group = buckets[nb]
        eb = _bucket(len(group), minimum=1)
        padded = group + [group[-1]] * (eb - len(group))
        px1 = np.stack([_pad_rows(g[2].astype(np.float64), nb) for g in padded])
        px2 = np.stack([_pad_rows(g[3].astype(np.float64), nb) for g in padded])
        valid = np.stack(
            [_pad_rows(np.ones(g[1], bool), nb, fill=False) for g in padded]
        )
        w0 = np.stack(
            [_pad_rows(g[4].astype(np.float64), nb) for g in padded]
        )
        Hm_b, inl_b, quats_b, t_b, scores_b = jax.tree.map(
            np.asarray,
            _refit_edges_batch(
                jnp.asarray(px1), jnp.asarray(px2), jnp.asarray(valid),
                jnp.asarray(w0),
                stack_cameras([g[5] for g in padded]),
                stack_cameras([g[6] for g in padded]),
            ),
        )
        for i, (e, n, epx1, epx2, _, _, _) in enumerate(group):
            rel = e.payload
            inl = inl_b[i, :n]
            scores = scores_b[i]
            rel.ransac_relation = Hm_b[i].astype(np.float64)
            rel.relation_type = RelationType.HOMOGRAPHY
            order = np.argsort(-scores, kind="stable")
            rel.rel_quats = quats_b[i][order]
            rel.rel_positions = t_b[i][order]
            rel.rel_scores = scores[order]
            if inl.sum() > 4 * 1.5 and scores[order[0]] > 0:
                keep = np.where(inl)[0]
                rel.inlier_idx1 = rel.match_idx1[keep]
                rel.inlier_idx2 = rel.match_idx2[keep]
                rel.inlier_pixel1 = epx1[keep]
                rel.inlier_pixel2 = epx2[keep]
                rel.inlier_match_index = keep.astype(np.int32)
            else:
                rel.inlier_idx1 = np.zeros(0, np.int32)
                rel.inlier_idx2 = np.zeros(0, np.int32)
                rel.inlier_pixel1 = np.zeros((0, 2))
                rel.inlier_pixel2 = np.zeros((0, 2))
                rel.inlier_match_index = np.zeros(0, np.int32)
