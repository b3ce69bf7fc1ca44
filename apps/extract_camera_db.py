#!/usr/bin/env python
"""Extract optimized camera intrinsics from a checkpoint into the camera
database (reference app/extract_camera_db.cpp:12)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-c", "--checkpoint", required=True, help="Checkpoint directory")
    ap.add_argument("-o", "--output", required=True, help="Camera database JSON to update")
    ap.add_argument("--notes", default="extracted from checkpoint")
    args = ap.parse_args(argv)

    from opencalibration_tpu.extract.camera_database import (
        CameraDatabase,
        CameraDBEntry,
    )
    from opencalibration_tpu.pipeline.pipeline import Pipeline

    p = Pipeline()
    if not p.load_checkpoint(args.checkpoint):
        print(f"error: cannot load checkpoint {args.checkpoint}", file=sys.stderr)
        return 1

    db = CameraDatabase()
    db.load(args.output)
    count = 0
    seen = set()
    for nid, node in p.graph.nodes():
        md = node.payload.metadata
        model = p.model_store.get(node.payload.model_id)
        if model is None or node.payload.model_id in seen:
            continue
        seen.add(node.payload.model_id)
        center = np.array([md.width_px / 2.0, md.height_px / 2.0])
        db.add_or_update(
            CameraDBEntry(
                make=md.camera_make, model=md.camera_model,
                lens_model=md.lens_model,
                sensor_width_px=md.width_px, sensor_height_px=md.height_px,
                radial_distortion=np.asarray(model.radial_distortion),
                tangential_distortion=np.asarray(model.tangential_distortion),
                principal_point_offset=np.asarray(model.principal_point) - center,
                focal_length_pixels=float(model.focal_length_pixels),
                notes=args.notes,
            )
        )
        count += 1
    if not db.save(args.output):
        print(f"error: cannot write {args.output}", file=sys.stderr)
        return 1
    print(f"updated {count} camera entries in {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
