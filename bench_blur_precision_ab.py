"""Blur-matmul precision A/B: bf16 operands (one native MXU pass,
float32 accumulation) vs float32 HIGHEST (multi-pass emulation).

The scale-space blurs are the dominant cost of detect(); HIGHEST costs
~6 bf16 MXU passes per matmul. The bf16 route keeps f32 ACCUMULATION
(the constraint the features.py numerics note identifies) and only
truncates operand STORAGE — and since the batched-Toeplitz rewrite each
level is 1-2 matmuls from the octave base, truncation error no longer
compounds across a 16-step chain.

Measures, per mode, on the bench survey (same harness as the FED A/B):
extraction wall, 3px repeatability under real viewpoint change, RANSAC
pose scores through the production match path, and relaxed tilt error.

Usage: python bench_blur_precision_ab.py [bf16 f32]
"""

import json
import sys

sys.path.insert(0, ".")

import numpy as np

from bench import N_IMAGES, ROWS, build_workload  # noqa: F401
from bench_fed_ab import run_mode


def main():
    from tests.synthetic_survey import camera_grid

    from opencalibration_tpu.ops import features as F

    images, positions, pa, pb = build_workload()
    _, quats_gt = camera_grid(ROWS, N_IMAGES // ROWS, spacing=12.0)
    modes = sys.argv[1:] or ["bf16", "f32"]
    for mode in modes:
        F.set_blur_precision(mode)
        row = run_mode("gaussian", images, positions, quats_gt, pa, pb)
        row["blur_precision"] = mode
        del row["diffusion"]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
