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


def _save_ip_sidecar(p, ckpt: str) -> None:
    """Record the harness-side state the Pipeline checkpoint can't:
    the unconsumed add-queue and the just-loaded (not yet linked) batch."""
    import json as _json
    import os

    pending = []
    for nid in p._prev_loaded_ids:
        node = p.graph.get_node(nid)
        if node is not None:
            pending.append(node.payload.path)
    tmp = os.path.join(ckpt, "ip_sidecar.json.tmp")
    _json.dump(
        dict(remaining=list(p._add_queue), pending=pending), open(tmp, "w")
    )
    os.replace(tmp, os.path.join(ckpt, "ip_sidecar.json"))


def _resume_mid_ip(p, ckpt: str) -> None:
    """Apply the sidecar: prune the loaded-but-unlinked batch's nodes
    (their link/relax never ran) and re-queue their paths with the rest
    of the unconsumed queue."""
    import json as _json
    import os

    side_path = os.path.join(ckpt, "ip_sidecar.json")
    if not os.path.exists(side_path):
        return
    side = _json.load(open(side_path))
    pending = set(side.get("pending", []))
    if pending:
        drop = [
            nid for nid, node in list(p.graph.nodes())
            if node.payload.path in pending
        ]
        for nid in drop:
            p.graph.remove_node(nid)
            p.gps_positions.pop(nid, None)
    readd = sorted(pending) + list(side.get("remaining", []))
    if readd:
        p.add(readd)
        print(
            f"  re-queued {len(pending)} in-flight + "
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
    p = Pipeline(batch_size=batch_size, parallelism=16)
    p.generate_thumbnails = False
    p.skip_dense_mesh = True
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
    else:
        p.add(paths)

    t0 = time.perf_counter()
    # run through FINAL_GLOBAL_RELAX; stop before the (disabled) ortho tail
    prev = None
    for it in range(100000):
        cur = p.get_state()
        rc = p.state_run_count()
        t1 = time.perf_counter()
        state = p.iterate_once()
        if cur != prev or (it and it % 10 == 0):
            # cumulative counter table at every state boundary AND every
            # 10 iterates so a crashed/killed at-scale run (10k) still
            # leaves per-measure attribution data
            if prev is not None:
                print(total_performance_summary(), file=sys.stderr, flush=True)
            prev = cur
        print(
            f"  [{time.perf_counter() - t0:7.1f}s] {cur} rc={rc}"
            f" ({time.perf_counter() - t1:.1f}s)",
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
        if state in ("GENERATE_THUMBNAIL", "COMPLETE"):
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
    return dict(
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
