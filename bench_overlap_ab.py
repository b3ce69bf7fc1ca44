"""Three-stage overlap A/B (reference interleave, pipeline.cpp:548-556).

Measures the INITIAL_PROCESSING wall-clock with and without the
heterogeneous host/device overlap (`Pipeline.overlap_io`): batch N
decodes on host threads while batch N-2's group relax runs on-device and
batch N-1's link does host match prep. The overlap is a pure scheduling
change (tests/test_pipeline.py::test_overlap_matches_serial_order pins
identical poses/edges), so the only question is the wall delta on a real
device — on one CPU core host and "device" share a hardware thread and
the delta is zero by construction.

Usage: python bench_overlap_ab.py [n_images] [legs...]
  legs default: warmup overlap serial overlap   (warmup pays compiles)
Prints one JSON line per timed leg.
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def run_leg(n_images: int, overlap: bool, label: str) -> dict:
    from bench_e2e import run_config  # reuse the survey cache + harness
    from opencalibration_tpu.pipeline import pipeline as P

    # patch the default via a tiny subclass hook: run_config constructs
    # Pipeline itself, so wrap __init__
    orig = P.Pipeline.__init__

    def patched(self, *a, **k):
        orig(self, *a, **k)
        self.overlap_io = overlap

    P.Pipeline.__init__ = patched
    try:
        t0 = time.perf_counter()
        rec = run_config(n_images)
        rec["leg"] = label
        rec["overlap_io"] = overlap
        return rec
    finally:
        P.Pipeline.__init__ = orig


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 104
    legs = sys.argv[2:] or ["warmup", "overlap", "serial", "overlap"]
    for i, leg in enumerate(legs):
        overlap = leg != "serial"
        rec = run_leg(n, overlap, leg)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
