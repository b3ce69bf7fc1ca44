"""Benchmark driver: end-to-end calibration compute throughput on the
default (TPU) platform.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: images/sec through the full calibration compute path (batched
feature extraction -> pairwise Hamming matching -> RANSAC homography +
pose decomposition -> relative-orientation bundle adjustment) on a
synthetic aerial survey, steady-state (post-compile).

vs_baseline: the same workload timed on host CPU (single process) — the
reference implementation is a single-CPU-node C++ pipeline, so TPU/CPU
ratio on identical work is the honest proxy until the C++ reference is
built and measured on this machine (BASELINE.md: reference publishes no
absolute numbers).
"""

import os
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

N_IMAGES = 24
ROWS = 4
NEIGHBOURS = 3


def build_workload():
    from tests.synthetic_survey import camera_grid, make_texture, render_views

    cols = N_IMAGES // ROWS
    tex = make_texture(0)
    positions, quats = camera_grid(ROWS, cols, spacing=12.0)
    views = render_views(tex, positions, quats)

    pairs = []
    for i in range(N_IMAGES):
        d2 = np.sum((positions[:, :2] - positions[i, :2]) ** 2, axis=1)
        for j in np.argsort(d2)[1 : NEIGHBOURS + 1]:
            a, b = min(i, int(j)), max(i, int(j))
            if (a, b) not in pairs:
                pairs.append((a, b))
    pairs = sorted(pairs)
    pa = np.asarray([p[0] for p in pairs], np.int32)
    pb = np.asarray([p[1] for p in pairs], np.int32)
    return np.stack(views), positions, pa, pb


def _model():
    from tests.synthetic_survey import FOCAL, IMG_H, IMG_W
    from opencalibration_tpu.types.camera import CameraModel

    return CameraModel.create(
        FOCAL, (IMG_W / 2, IMG_H / 2), pixels_cols=IMG_W, pixels_rows=IMG_H,
        dtype=jnp.float32,
    )


@jax.jit
def _link_all(desc, xy, valid, pa, pb):
    from opencalibration_tpu.ops import distort as D
    from opencalibration_tpu.ops import hamming as H
    from opencalibration_tpu.ops import ransac as R

    model = _model()

    def one(a, b):
        idx2, dist, matched = H.match_descriptors(desc[a], desc[b], valid[a], valid[b])
        r1, r2 = D.distort_keypoints(xy[a], xy[b][idx2], model, model)
        res, quats, ts, scores = R.ransac_homography_with_poses(
            r1, r2, dist.astype(jnp.float32), matched, num_hypotheses=2048
        )
        return quats, ts, scores

    return jax.vmap(one)(pa, pb)


@jax.jit
def _relax_all(positions, pa, pb, rel_quats, rel_ts, rel_scores):
    from opencalibration_tpu.relax import blocks as B
    from opencalibration_tpu.relax import lm
    from opencalibration_tpu.relax.tangent import RelaxParams, TangentLayout

    B_imgs = positions.shape[0]
    layout = TangentLayout(B_imgs, 0, 0, 1)
    DOWN = jnp.asarray([0.0, 1.0, 0.0, 0.0], jnp.float32)
    params = RelaxParams.create(
        jnp.tile(DOWN, (B_imgs, 1)), positions.astype(jnp.float32), dtype=jnp.float32
    )
    valid4 = rel_scores > 0.25 * rel_scores[:, :1]
    blk = B.decomposed_rotation_block(
        layout, pa, pb, rel_quats, rel_ts, rel_scores, valid4,
        jnp.ones(pa.shape[0], jnp.float32),
    )
    down = B.downwards_prior_block(
        layout, jnp.arange(B_imgs, dtype=jnp.int32), jnp.ones(B_imgs, jnp.float32)
    )
    free = layout.build_free_mask()
    solved, info = lm.solve(
        params, (blk, down), layout, free, init_lambda=0.1, max_iterations=50
    )
    return solved.quats


@jax.jit
def calibration_step(images, positions, pa, pb):
    """ONE fused jit for the whole step: extract -> link -> relax.

    A single XLA module means one device dispatch per pass (the remote
    tunnel charges ~0.2 s per awaited dispatch) and lets XLA fuse across
    stage boundaries instead of round-tripping three separate programs."""
    from opencalibration_tpu.ops import features as F

    feats = F.extract_features(images, max_features=1024)
    rel_quats, rel_ts, rel_scores = _link_all(
        feats["descriptors"], feats["xy"], feats["valid"], pa, pb
    )
    return _relax_all(positions, pa, pb, rel_quats, rel_ts, rel_scores)


def time_platform(images, positions, pa, pb, repeats=3, rounds=1):
    """Median-of-rounds timing: the shared v5e shows ~40% load variance
    between minutes, so a single timed window can under-report by a third.
    Each round averages `repeats` passes; the median round is reported.

    Inputs are staged on the device ONCE before timing: the metric is
    calibration compute, and re-uploading 5.5 MB of pixels through the
    tunneled link every pass would time the relay, not the TPU."""
    images = jax.device_put(jnp.asarray(images, jnp.float32))
    positions = jax.device_put(jnp.asarray(positions, jnp.float32))
    pa = jax.device_put(jnp.asarray(pa, jnp.int32))
    pb = jax.device_put(jnp.asarray(pb, jnp.int32))
    out = calibration_step(images, positions, pa, pb)
    jax.block_until_ready(out)  # warmup/compile
    times = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        for _ in range(repeats):
            out = calibration_step(images, positions, pa, pb)
        jax.block_until_ready(out)
        times.append((time.perf_counter() - t0) / repeats)
    times.sort()
    return times[len(times) // 2]


def _device_data_plane_ok(timeout_s: float = 90.0) -> bool:
    """Probe the default device's DATA PLANE from a subprocess. A failing
    remote-device relay can keep answering sub-KB control RPCs while bulk
    transfers hang forever (observed: 64 KB device_put never returning);
    a bench that trusts `jax.devices()` then hangs without recording
    anything. The probe moves 1 MB with a hard timeout."""
    import subprocess

    code = (
        "import numpy, jax;"
        "jax.device_put(numpy.ones((262144,), numpy.float32))"
        ".block_until_ready();print('ok')"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code], timeout=timeout_s,
            capture_output=True,
        )
        return r.returncode == 0 and b"ok" in r.stdout
    except Exception:
        return False


_E2E_KEYS = (
    "n_images", "wall_s", "images_per_sec_e2e", "lm_iterations",
    "median_pose_err_m", "final_state", "focal_err_px",
)


def _e2e_leg():
    """One pass of the 24-image survey through the REAL Pipeline end-to-
    end (decode -> extract -> link -> spectral-group relax -> mesh
    refinement -> camera-parameter relax -> final relax -> orthomosaic
    rasterize + color balance + blend) — BASELINE config 4's full scope
    at bench scale."""
    import tempfile

    from bench_e2e import run_config

    with tempfile.TemporaryDirectory() as td:
        os.environ["BENCH_E2E_ORTHO"] = td
        try:
            e2e = run_config(N_IMAGES, batch_size=N_IMAGES)
        finally:
            os.environ.pop("BENCH_E2E_ORTHO", None)
    return {k: e2e[k] for k in _E2E_KEYS if k in e2e}


def _cpu_node_e2e(timeout_s: float = 1500.0):
    """The single-CPU-node proxy baseline, measured: the identical e2e
    workload on the host CPU (this machine exposes exactly ONE core —
    nproc=1 — so the 1-core run IS the full-node run here; the C++
    reference saturates a node via OMP, pipeline.cpp:42-49, which cannot
    be emulated beyond the cores this host has)."""
    import subprocess

    import tempfile

    code = (
        "import os, sys, json; sys.path.insert(0, '.');"
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "os.environ['OC_TPU_COMPILE_CACHE'] = '0';"
        "from bench_e2e import run_config;"
        f"e2e = run_config({N_IMAGES}, batch_size={N_IMAGES});"
        "print('CPUE2E ' + json.dumps(e2e))"
    )
    try:
        with tempfile.TemporaryDirectory() as td:
            # identical work to the TPU legs (orthomosaic included)
            env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_E2E_ORTHO=td)
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                capture_output=True, text=True, env=env,
            )
            for line in r.stdout.splitlines():
                if line.startswith("CPUE2E "):
                    e2e = json.loads(line[len("CPUE2E "):])
                    return {k: e2e[k] for k in _E2E_KEYS if k in e2e}
    except Exception:
        pass
    return None


def main():
    platform_note = None
    if not _device_data_plane_ok():
        # record an honest CPU number instead of hanging the driver
        jax.config.update("jax_platforms", "cpu")
        # XLA:CPU persistent-cache entries are machine-feature-stamped AOT
        # artifacts (SIGILL risk on reload) — keep the cache TPU-only
        os.environ["OC_TPU_COMPILE_CACHE"] = "0"
        platform_note = "cpu fallback: device data plane unavailable"

    images, positions, pa, pb = build_workload()

    tpu_time = time_platform(images, positions, pa, pb, rounds=5)
    tpu_ips = N_IMAGES / tpu_time

    cpu_ips = None
    try:
        cpu = jax.devices("cpu")
        with jax.default_device(cpu[0]):
            cpu_time = time_platform(images, positions, pa, pb, repeats=1)
        cpu_ips = N_IMAGES / cpu_time
    except Exception:
        pass

    # THE HEADLINE is the operational metric (BASELINE.md: images/sec
    # end-to-end through the real pipeline, orthomosaic included), as a
    # cold/warm pair: cold pays every trace+compile inside the window,
    # warm is the steady state an operator sees on any run after the
    # first. vs_baseline = warm TPU e2e over the measured single-CPU-node
    # e2e (this host's node = 1 core; see _cpu_node_e2e).
    e2e_cold = e2e_warm = cpu_e2e = None
    try:
        e2e_cold = _e2e_leg()
        e2e_warm = _e2e_leg()
    except Exception as exc:  # never lose the output to the e2e leg
        e2e_cold = e2e_cold or {"error": f"{type(exc).__name__}: {exc}"[:200]}
    if os.environ.get("BENCH_SKIP_CPU_E2E", "") != "1":
        cpu_e2e = _cpu_node_e2e()

    warm_ips = (e2e_warm or {}).get("images_per_sec_e2e")
    cpu_node_ips = (cpu_e2e or {}).get("images_per_sec_e2e")
    result = {
        "metric": (
            "images/sec end-to-end (24-image survey incl. orthomosaic, warm)"
            if warm_ips else
            "images/sec calibration compute (fused jit; e2e leg failed)"
        ),
        "value": warm_ips if warm_ips else round(tpu_ips, 3),
        "unit": "images/sec",
        "vs_baseline": (
            round(warm_ips / cpu_node_ips, 2)
            if warm_ips and cpu_node_ips else None
        ),
        "e2e": {"cold": e2e_cold, "warm": e2e_warm, "cpu_node_1core": cpu_e2e},
        "compute_kernel": {
            "metric": "images/sec calibration compute (fused extract+match+ransac+relax jit)",
            "tpu_ips": round(tpu_ips, 3),
            "vs_cpu": round(tpu_ips / cpu_ips, 2) if cpu_ips else None,
        },
    }
    if platform_note:
        result["platform"] = platform_note
    print(json.dumps(result))


if __name__ == "__main__":
    main()
