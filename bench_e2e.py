"""End-to-end pipeline benchmark at BASELINE.md survey scales.

Runs the REAL pipeline (LoadStage decode -> batched extraction -> link ->
spectral-group batched relax -> camera-parameter relax -> final relax) on
a synthetic survey written to disk, and reports:

  * images/sec end-to-end (the BASELINE.md operational metric)
  * LM iterations/sec inside relax (bundle adjustment)
  * per-state wall-time breakdown

Usage: python bench_e2e.py [n_images ...]     (default: 100 1000)

bench.py remains the driver's one-line contract; this script documents
the at-scale numbers recorded in BASELINE.md / BENCH_NOTES.md.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

import numpy as np


def run_config(n_images: int, batch_size: int = 64,
               stop_after: str | None = None) -> dict:
    return _run_config_impl(n_images, batch_size, stop_after)


# mid-IP checkpoint cadence (iterates); at batch_size=256 this is ~2k
# images (~800 s of 10k-scale work) between saves
_IP_CKPT_EVERY = int(os.environ.get("BENCH_E2E_IP_CKPT_EVERY", "8"))


def _paths_of(p, ids) -> list:
    out = []
    for nid in ids:
        node = p.graph.get_node(nid)
        if node is not None:
            out.append(node.payload.path)
    return out


def _save_ip_sidecar(p, ckpt: str) -> None:
    """Record the harness-side state the Pipeline checkpoint can't:
    the unconsumed add-queue, the just-loaded (not yet linked) batch, and
    the just-linked (not yet relax-anchored) batch.

    The sidecar is stamped with a graph fingerprint (node/edge counts) so
    a kill between save_checkpoint and this write — which leaves a newer
    graph.json paired with a stale sidecar — is detected on resume and
    the stale sidecar ignored (mid-IP batches grow the node count
    monotonically, so a stale pairing always mismatches)."""
    import json as _json
    import os

    tmp = os.path.join(ckpt, "ip_sidecar.json.tmp")
    with open(tmp, "w") as f:
        _json.dump(
            dict(
                remaining=list(p._add_queue),
                pending=_paths_of(p, p._prev_loaded_ids),
                linked=_paths_of(p, p._prev_linked_ids),
                graph_nodes=p.graph.size_nodes(),
                graph_edges=p.graph.size_edges(),
                state=p.get_state(),
            ),
            f,
        )
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(ckpt, "ip_sidecar.json"))


def _resume_mid_ip(p, ckpt: str) -> None:
    """Apply the sidecar: prune the in-flight batches' nodes — both the
    loaded-but-unlinked batch (its link/relax never ran) AND the
    linked-but-unrelaxed batch (its incremental anchoring relax never
    ran, stages.py depth-2-halo path) — and re-queue their paths ahead of
    the unconsumed queue, so the resumed run is equivalent to rolling
    back to the last fully-processed batch."""
    import json as _json
    import os

    side_path = os.path.join(ckpt, "ip_sidecar.json")
    if not os.path.exists(side_path):
        return
    try:
        with open(side_path) as f:
            side = _json.load(f)
    except (OSError, json.JSONDecodeError):
        # partially written sidecar (hard kill mid-write): resume from the
        # checkpoint alone rather than crashing every subsequent attempt
        print("  sidecar unreadable; resuming without it", file=sys.stderr)
        return
    if (
        side.get("graph_nodes") is not None
        and (
            side["graph_nodes"] != p.graph.size_nodes()
            or side.get("graph_edges") != p.graph.size_edges()
            or side.get("state") not in (None, p.get_state())
        )
    ):
        print(
            "  sidecar fingerprint mismatch (stale pairing); ignoring it",
            file=sys.stderr,
        )
        return
    requeue = set(side.get("pending", [])) | set(side.get("linked", []))
    if requeue:
        drop = [
            nid for nid, node in list(p.graph.nodes())
            if node.payload.path in requeue
        ]
        for nid in drop:
            p.graph.remove_node(nid)
            p.gps_positions.pop(nid, None)
    in_graph = {node.payload.path for _, node in p.graph.nodes()}
    readd = [
        path
        for path in sorted(requeue) + list(side.get("remaining", []))
        if path not in in_graph
    ]
    if readd:
        p.add(readd)
        print(
            f"  re-queued {len(requeue)} in-flight + "
            f"{len(side.get('remaining', []))} unconsumed images",
            file=sys.stderr, flush=True,
        )


def _run_config_impl(n_images: int, batch_size: int,
                     stop_after: str | None) -> dict:
    """stop_after: optionally end the run once the named state completes
    (e.g. 'MESH_REFINEMENT') — used for partial at-scale probes (10k)
    where the point is per-state attribution, not a full survey."""
    from opencalibration_tpu.pipeline.pipeline import Pipeline
    from opencalibration_tpu.utils.performance import (
        enable_performance_counters,
        get_event_count,
        get_timer_total,
        reset_performance_counters,
        total_performance_summary,
        track_compiles,
    )
    from tests.synthetic_survey import write_survey

    rows = max(2, int(np.sqrt(n_images / 1.5)))
    cols = max(2, (n_images + rows - 1) // rows)
    # surveys are deterministic (seeded) — cache them on disk so repeat
    # bench runs measure the pipeline, not synthetic JPEG rendering
    import json as _json
    import os

    cache_root = os.path.join(os.path.dirname(__file__), ".bench_surveys")
    tmpdir = os.path.join(cache_root, f"{rows}x{cols}")
    meta_path = os.path.join(tmpdir, "survey_meta.json")
    t0 = time.perf_counter()
    if os.path.exists(meta_path):
        meta = _json.load(open(meta_path))
        paths = [os.path.join(tmpdir, p) for p in meta["files"]]
        positions = np.asarray(meta["positions"])
        quats = np.asarray(meta["quats"])
    else:
        os.makedirs(tmpdir, exist_ok=True)
        paths, positions, quats = write_survey(tmpdir, rows=rows, cols=cols)
        _json.dump(
            dict(
                files=[os.path.basename(p) for p in paths],
                positions=np.asarray(positions).tolist(),
                quats=np.asarray(quats).tolist(),
            ),
            open(meta_path, "w"),
        )
    gen_s = time.perf_counter() - t0
    n = len(paths)

    enable_performance_counters(True)
    reset_performance_counters()
    track_compiles()
    p = Pipeline(batch_size=batch_size, parallelism=16)
    p.generate_thumbnails = False
    p.skip_dense_mesh = True
    # BENCH_E2E_ORTHO=dir: run BASELINE config 4's full scope — after the
    # calibration states, drive GENERATE_LAYERS -> COLOR_BALANCE ->
    # BLEND_LAYERS and write the orthomosaic + DSM GeoTIFFs there
    # (reference src/ortho/ortho.cpp two-pass rasterize/blend)
    ortho_dir = os.environ.get("BENCH_E2E_ORTHO") or None
    if ortho_dir:
        os.makedirs(ortho_dir, exist_ok=True)
        p.ortho_path = os.path.join(ortho_dir, "ortho.tif")
        p.dsm_path = os.path.join(ortho_dir, "dsm.tif")
        p.camera_id_path = os.path.join(ortho_dir, "camera_ids.tif")
        p.ortho_max_megapixels = float(
            os.environ.get("BENCH_E2E_ORTHO_MP", "64")
        )
    # BENCH_E2E_CHECKPOINT=dir: save on every state transition and resume
    # from the last completed state on relaunch — at-scale (10k) runs
    # outlive tunnel failures and wall-clock caps this way. Wall/LM-rate
    # numbers from a resumed run cover the resumed states only; note the
    # resume in any recorded row.
    ckpt = os.environ.get("BENCH_E2E_CHECKPOINT") or None
    resumed = False
    if ckpt and os.path.exists(os.path.join(ckpt, "metadata.json")):
        resumed = p.load_checkpoint(ckpt)
        print(f"resumed from {ckpt} at {p.get_state()}", file=sys.stderr)
    if resumed:
        _resume_mid_ip(p, ckpt)
        # the OrthoJob (layer store + correspondences) is in-memory only:
        # a resume landing inside the ortho tail must rewind to
        # GENERATE_LAYERS so pass 1 re-renders (rewind-only guard allows it)
        if ortho_dir and p.get_state() in ("COLOR_BALANCE", "BLEND_LAYERS"):
            p.resume_from_state("GENERATE_LAYERS")
            print("  ortho job not persisted: rewound to GENERATE_LAYERS",
                  file=sys.stderr)
    else:
        p.add(paths)

    t0 = time.perf_counter()
    # run the full state machine to COMPLETE (the ortho states no-op
    # unless BENCH_E2E_ORTHO requested outputs)
    prev = None
    from opencalibration_tpu.utils import performance as _perf

    def _n_compiles() -> int:
        with _perf._lock:
            return sum(
                c for k, c in _perf._counts.items()
                if k.startswith("xla compiles @")
            )

    for it in range(100000):
        cur = p.get_state()
        rc = p.state_run_count()
        t1 = time.perf_counter()
        nc0 = _n_compiles()
        state = p.iterate_once()
        if cur != prev or (it and it % 3 == 0):
            # cumulative counter table at every state boundary AND every
            # 10 iterates so a crashed/killed at-scale run (10k) still
            # leaves per-measure attribution data
            if prev is not None:
                print(total_performance_summary(), file=sys.stderr, flush=True)
            prev = cur
        dc = _n_compiles() - nc0
        print(
            f"  [{time.perf_counter() - t0:7.1f}s] {cur} rc={rc}"
            f" ({time.perf_counter() - t1:.1f}s"
            + (f", {dc} compiles" if dc else "") + ")",
            file=sys.stderr, flush=True,
        )
        if ckpt and state != cur:
            # save on the state transition itself (reference saves on
            # transition too, pipeline_runner.cpp:317-325)
            p.save_checkpoint(ckpt)
            _save_ip_sidecar(p, ckpt)
        elif (
            ckpt
            and cur == "INITIAL_PROCESSING"
            and it % _IP_CKPT_EVERY == _IP_CKPT_EVERY - 1
        ):
            # INITIAL_PROCESSING is one long state (~4.4 ks at 10k, far
            # past any wall-clock cap) with no transitions to save on —
            # checkpoint mid-state every few batches. The reference never
            # needs this (its runs fit under one wall), so the in-flight
            # batch bookkeeping lives here in the harness, not in the
            # Pipeline: a sidecar records the unconsumed add-queue plus
            # the just-loaded batch (loaded but not yet linked), and
            # resume prunes that batch's nodes and re-queues their paths
            # so link/relax re-run for them cleanly.
            t_ck = time.perf_counter()
            p.save_checkpoint(ckpt)
            _save_ip_sidecar(p, ckpt)
            print(
                f"  [mid-IP checkpoint {time.perf_counter() - t_ck:.1f}s]",
                file=sys.stderr, flush=True,
            )
        if state == "COMPLETE":
            break
        if stop_after is not None and cur == stop_after and state != cur:
            break
    wall = time.perf_counter() - t0

    lm_iters = get_event_count("lm iterations")
    relax_wall = sum(
        get_timer_total(f"state {s}")
        for s in (
            "INITIAL_PROCESSING", "INITIAL_GLOBAL_RELAX",
            "CAMERA_PARAMETER_RELAX", "FINAL_GLOBAL_RELAX",
        )
    )
    by_path = {
        node.payload.path: np.asarray(node.payload.position)
        for _, node in p.graph.nodes()
    }
    rec = np.stack([by_path[path] for path in paths if path in by_path])
    gt = np.stack(
        [positions[i] for i, path in enumerate(paths) if path in by_path]
    )
    # remove the constant origin-gauge offset (pipeline local frame is
    # centred on its first GPS fix, ground truth on the survey origin)
    errs = np.linalg.norm(
        (rec - rec.mean(0)) - (gt - gt.mean(0)), axis=1
    ).tolist()
    print(total_performance_summary(), file=sys.stderr)
    result = dict(
        n_images=n,
        survey_gen_s=round(gen_s, 2),
        wall_s=round(wall, 2),
        images_per_sec_e2e=round(n / wall, 3),
        lm_iterations=int(lm_iters),
        lm_iters_per_sec=round(lm_iters / max(relax_wall, 1e-9), 2),
        relax_wall_s=round(relax_wall, 2),
        n_edges=p.graph.size_edges(),
        median_pose_err_m=round(float(np.median(errs)), 3) if errs else None,
        final_state=p.get_state(),
    )
    result.update(_intrinsics_errors(p))
    if ortho_dir:
        result["ortho_artifacts"] = {
            os.path.basename(f): os.path.getsize(os.path.join(ortho_dir, f))
            for f in sorted(os.listdir(ortho_dir))
        }
    return result


def _intrinsics_errors(p) -> dict:
    """Recovered-intrinsics error vs the synthetic render truth
    (BASELINE intrinsics-parity contract; the reference copies optimized
    models back per src/relax/relax_problem.cpp:1416-1419). The synthetic
    renderer is a distortion-free pinhole at FOCAL px with the principal
    point at the image centre, so truth is (FOCAL, centre, zeros)."""
    from tests.synthetic_survey import FOCAL, IMG_H, IMG_W

    fe, pe, re_ = [], [], []
    for m in p.model_store.values():
        fe.append(abs(float(np.asarray(m.focal_length_pixels)) - FOCAL))
        pp = np.asarray(m.principal_point, float).reshape(-1)[:2]
        pe.append(float(np.linalg.norm(pp - [IMG_W / 2, IMG_H / 2])))
        re_.append(float(np.linalg.norm(np.asarray(m.radial_distortion))))
    if not fe:
        return {}
    return dict(
        focal_err_px=round(float(np.median(fe)), 3),
        principal_err_px=round(float(np.median(pe)), 3),
        radial_err_norm=round(float(np.median(re_)), 5),
    )


def main():
    import os

    stop_after = os.environ.get("BENCH_E2E_STOP_AFTER") or None
    batch_size = int(os.environ.get("BENCH_E2E_BATCH", "64"))
    sizes = [int(a) for a in sys.argv[1:]] or [100, 1000]
    for n in sizes:
        result = run_config(n, batch_size=batch_size, stop_after=stop_after)
        print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
