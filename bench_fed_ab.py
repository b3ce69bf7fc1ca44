"""FED (AKAZE nonlinear diffusion) vs Gaussian scale-space A/B.

The reference's detector is AKAZE's nonlinear diffusion
(/root/reference/src/extract/extract_features.cpp:35); this repo defaults
to a decimated Gaussian octave pyramid with FED opt-in
(opencalibration_tpu/ops/features.py). This script settles the default
with data, on the bench survey:

  for each diffusion mode:
    * extraction wall time (steady-state, batched)
    * repeatability under the survey's real viewpoint changes: fraction
      of keypoints in image A whose ground-truth reprojection into
      neighbour B lands within 3px of a detected keypoint in B
    * matching yield: RANSAC inlier count per adjacent pair through the
      production Hamming+ratio+RANSAC path
    * end-to-end pose error after the relative-orientation relax

Usage: python bench_fed_ab.py          (prints one JSON line per mode)
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from bench import N_IMAGES, _model, build_workload
from tests.synthetic_survey import ALTITUDE, FOCAL, IMG_H, IMG_W


def _extract(images, diffusion):
    from opencalibration_tpu.ops import features as F

    return F.extract_features(
        jnp.asarray(images, jnp.float32), max_features=1024,
        diffusion=diffusion,
    )


def _reproject(xy, pos_a, quat_a, pos_b, quat_b):
    """Ground-truth reprojection through the survey's exact poses (nadir
    + random yaw, two flight levels): pixel -> ray -> z=0 ground point
    under camera a -> projected pixel under camera b."""
    from opencalibration_tpu.ops.quaternion import (
        quat_rotate,
        quat_rotate_inverse,
    )

    d_cam = np.stack(
        [
            (xy[..., 0] - IMG_W / 2) / FOCAL,
            (xy[..., 1] - IMG_H / 2) / FOCAL,
            np.ones_like(xy[..., 0]),
        ],
        axis=-1,
    )
    qa = jnp.broadcast_to(jnp.asarray(quat_a), d_cam.shape[:-1] + (4,))
    d_world = np.asarray(quat_rotate(qa, jnp.asarray(d_cam)))
    t = -pos_a[2] / np.where(np.abs(d_world[..., 2]) < 1e-9, 1e-9, d_world[..., 2])
    g = pos_a + t[..., None] * d_world
    rel = g - pos_b
    qb = jnp.broadcast_to(jnp.asarray(quat_b), rel.shape[:-1] + (4,))
    v_cam = np.asarray(quat_rotate_inverse(qb, jnp.asarray(rel)))
    z = np.where(np.abs(v_cam[..., 2]) < 1e-9, 1e-9, v_cam[..., 2])
    u = FOCAL * v_cam[..., 0] / z + IMG_W / 2
    v = FOCAL * v_cam[..., 1] / z + IMG_H / 2
    return np.stack([u, v], axis=-1)


def run_mode(diffusion, images, positions, quats_gt, pa, pb):
    from bench import _link_all, _relax_all
    from opencalibration_tpu.ops.quaternion import quat_rotate

    print(f"[{diffusion}] compiling extraction...", file=sys.stderr, flush=True)
    feats = _extract(images, diffusion)
    jax.block_until_ready(feats["xy"])
    print(f"[{diffusion}] extraction compiled", file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    feats = _extract(images, diffusion)
    jax.block_until_ready(feats["xy"])
    extract_s = time.perf_counter() - t0

    xy = np.asarray(feats["xy"])
    valid = np.asarray(feats["valid"])

    # repeatability: nadir ground-truth reprojection into each neighbour
    rep_hits, rep_total = 0, 0
    for a, b in zip(np.asarray(pa), np.asarray(pb)):
        pr = _reproject(
            xy[a], positions[a], quats_gt[a], positions[b], quats_gt[b]
        )
        inb = (
            valid[a]
            & (pr[:, 0] >= 0) & (pr[:, 0] < IMG_W)
            & (pr[:, 1] >= 0) & (pr[:, 1] < IMG_H)
        )
        if not inb.any():
            continue
        d = np.linalg.norm(
            pr[inb][:, None, :] - xy[b][None, valid[b]], axis=-1
        )
        rep_hits += int((d.min(axis=1) < 3.0).sum())
        rep_total += int(inb.sum())

    print(f"[{diffusion}] repeatability done, linking...", file=sys.stderr,
          flush=True)
    # production match+RANSAC path -> pose decomposition scores
    rel_quats, rel_ts, rel_scores = _link_all(
        feats["descriptors"], feats["xy"], feats["valid"],
        jnp.asarray(pa), jnp.asarray(pb),
    )
    quats = _relax_all(
        jnp.asarray(positions, jnp.float32), jnp.asarray(pa),
        jnp.asarray(pb), rel_quats, rel_ts, rel_scores,
    )
    # pose error: all ground-truth orientations are nadir with small yaw;
    # compare the relaxed optical axes to straight-down
    axes = np.asarray(
        quat_rotate(jnp.asarray(quats), jnp.asarray([0.0, 0.0, 1.0]))
    )
    tilt_deg = np.degrees(np.arccos(np.clip(-axes[:, 2], -1, 1)))
    scores = np.asarray(rel_scores)
    return dict(
        diffusion=diffusion,
        extract_s=round(extract_s, 3),
        images_per_sec_extract=round(N_IMAGES / extract_s, 2),
        repeatability_3px=round(rep_hits / max(rep_total, 1), 4),
        mean_best_pose_score=round(float(scores.max(axis=1).mean()), 2),
        pairs_with_pose=int((scores.max(axis=1) > 0).sum()),
        n_pairs=int(len(np.asarray(pa))),
        median_tilt_err_deg=round(float(np.median(tilt_deg)), 4),
    )


def main():
    from tests.synthetic_survey import camera_grid

    images, positions, pa, pb = build_workload()
    # same deterministic grid build_workload used (bench.py: ROWS x cols)
    from bench import ROWS

    _, quats_gt = camera_grid(ROWS, N_IMAGES // ROWS, spacing=12.0)
    modes = sys.argv[1:] or ["gaussian", "fed"]
    for diffusion in modes:
        print(
            json.dumps(
                run_mode(diffusion, images, positions, quats_gt, pa, pb)
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
