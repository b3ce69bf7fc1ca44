#!/usr/bin/env python
"""Pipeline runner CLI.

Mirrors the reference's pipeline_runner flag surface
(reference app/pipeline_runner.cpp:62-101) on the TPU-native pipeline:
input directory of geotagged JPEGs in, calibrated graph + point cloud +
mesh + (as output stages land) orthomosaic artifacts out, with
checkpointing on every state transition.
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-i", "--input", required=False, help="Input directory of images")
    p.add_argument("-d", "--debug", type=int, default=3,
                   help="Log verbosity: 0=off .. 5=debug")
    p.add_argument("--log-file", default=None, help="Append log output to file")
    p.add_argument("--batch-size", type=int, default=10)

    p.add_argument("-g", "--geojson-file", default=None, help="Output GeoJSON camera graph")
    p.add_argument("--graph-file", default=None, help="Output serialized camera graph JSON")
    p.add_argument("-p", "--pointcloud-file", default=None, help="Output pointcloud XYZ")
    p.add_argument("-m", "--mesh-file", default=None, help="Output mesh PLY")
    p.add_argument("-o", "--geotiff-file", default=None, help="Output orthomosaic GeoTIFF")
    p.add_argument("--dsm-file", default=None, help="Output DSM GeoTIFF")
    p.add_argument("--camera-id-file", default=None,
                   help="Output camera-id sidecar GeoTIFF (one uint64 band of node ids)")
    p.add_argument("-x", "--textured-mesh-file", default=None, help="Output textured OBJ")
    p.add_argument("-t", "--thumbnail-file", default=None, help="Output thumbnail image")

    p.add_argument("--mesh-refinement", type=int, default=1)
    p.add_argument("--initial-relax", type=int, default=0)
    p.add_argument("--camera-param-relax", type=int, default=1)
    p.add_argument("--final-relax", type=int, default=1)
    p.add_argument("--dense-mesh", type=int, default=0)

    p.add_argument("-c", "--checkpoint-save", default=None,
                   help="Save checkpoint dir on state transitions")
    p.add_argument("-r", "--checkpoint-restore", default=None,
                   help="Restore from checkpoint dir")
    p.add_argument("--resume-from", default=None, help="Rewind to a pipeline state")
    p.add_argument("--update-camera-db", default=None,
                   help="Write optimized intrinsics back to this camera DB json")
    p.add_argument("--perf", action="store_true", help="Print performance counter summary")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    levels = [logging.CRITICAL + 1, logging.CRITICAL, logging.ERROR,
              logging.WARNING, logging.INFO, logging.DEBUG]
    logging.basicConfig(
        level=levels[min(args.debug, 5)],
        format="[%(asctime)s] [%(levelname)s] %(message)s",
        filename=args.log_file,
    )
    log = logging.getLogger("pipeline_runner")

    import jax

    # f64 precision for the BA solves when the backend supports it (CPU);
    # TPU stays f32 (no native f64) and the builders downcast cleanly
    try:
        if jax.default_backend() == "cpu":
            jax.config.update("jax_enable_x64", True)
    except Exception:
        pass

    from opencalibration_tpu.pipeline.pipeline import Pipeline, PipelineState
    from opencalibration_tpu.utils.performance import (
        enable_performance_counters,
        total_performance_summary,
    )

    if args.perf:
        enable_performance_counters(True)

    pipeline = Pipeline(batch_size=args.batch_size)
    pipeline.ortho_path = args.geotiff_file
    pipeline.dsm_path = args.dsm_file
    pipeline.camera_id_path = args.camera_id_file
    pipeline.thumbnail_path = args.thumbnail_file
    if args.textured_mesh_file:
        pipeline.textured_obj_prefix = args.textured_mesh_file.removesuffix(".obj")
    pipeline.skip_mesh_refinement = not args.mesh_refinement
    pipeline.skip_initial_global_relax = not args.initial_relax
    pipeline.skip_camera_param_relax = not args.camera_param_relax
    pipeline.skip_final_global_relax = not args.final_relax
    pipeline.skip_dense_mesh = not args.dense_mesh

    if args.checkpoint_restore:
        if not pipeline.load_checkpoint(args.checkpoint_restore):
            log.error("failed to load checkpoint %s", args.checkpoint_restore)
            return 1
        log.info("restored checkpoint at state %s", pipeline.get_state())
    if args.resume_from:
        if not pipeline.resume_from_state(args.resume_from):
            log.error("cannot resume forward to %s", args.resume_from)
            return 1

    if args.input:
        exts = ("*.jpg", "*.JPG", "*.jpeg", "*.JPEG", "*.png", "*.tif", "*.tiff")
        paths = sorted(
            p for ext in exts for p in glob.glob(os.path.join(args.input, ext))
        )
        if not paths and not args.checkpoint_restore:
            log.error("no images found in %s", args.input)
            return 1
        pipeline.add(paths)
        log.info("queued %d images", len(paths))

    def on_step(info):
        log.info(
            "[%5.1f%%] %s it=%d loaded=%d linked=%d relaxed=%d queue=%d",
            100 * info.global_progress, info.state, info.state_iteration,
            len(info.loaded_ids), len(info.linked_ids), len(info.relaxed_ids),
            info.queue_size_remaining,
        )

    pipeline.step_callback = on_step

    t0 = time.time()
    prev_state = pipeline.get_state()
    while pipeline.get_state() != PipelineState.COMPLETE:
        pipeline.iterate_once()
        if pipeline.get_state() != prev_state:
            prev_state = pipeline.get_state()
            if args.checkpoint_save:
                pipeline.save_checkpoint(args.checkpoint_save)
                log.info("checkpoint saved at %s", prev_state)
    log.info("pipeline complete in %.1fs", time.time() - t0)

    # --- outputs ---
    if args.checkpoint_save:
        pipeline.save_checkpoint(args.checkpoint_save)
    if args.graph_file:
        from opencalibration_tpu.io.serialize import serialize_graph

        with open(args.graph_file, "w") as f:
            f.write(serialize_graph(pipeline.graph, pipeline.model_store))
    if args.geojson_file:
        from opencalibration_tpu.io.serialize import to_visualized_geojson

        with open(args.geojson_file, "w") as f:
            f.write(to_visualized_geojson(pipeline.graph, pipeline.geocoord))
    if args.pointcloud_file:
        from opencalibration_tpu.io.mesh_io import save_xyz

        clouds = [c for s in pipeline.surfaces for c in s.cloud]
        pts = np.concatenate(clouds) if clouds else np.zeros((0, 3))
        save_xyz(args.pointcloud_file, pts, filter_stddev=3.0)
    if args.mesh_file:
        from opencalibration_tpu.io.mesh_io import save_ply

        for s in pipeline.surfaces:
            if s.mesh is not None:
                save_ply(args.mesh_file, s.mesh)
                break
    if args.update_camera_db:
        from opencalibration_tpu.extract.camera_database import (
            CameraDatabase,
            CameraDBEntry,
        )

        db = CameraDatabase()
        db.load(args.update_camera_db)
        for nid, node in pipeline.graph.nodes():
            md = node.payload.metadata
            m = pipeline.model_store.get(node.payload.model_id)
            if m is None:
                continue
            center = np.array([md.width_px / 2.0, md.height_px / 2.0])
            db.add_or_update(
                CameraDBEntry(
                    make=md.camera_make, model=md.camera_model,
                    lens_model=md.lens_model,
                    sensor_width_px=md.width_px, sensor_height_px=md.height_px,
                    radial_distortion=np.asarray(m.radial_distortion),
                    tangential_distortion=np.asarray(m.tangential_distortion),
                    principal_point_offset=np.asarray(m.principal_point) - center,
                    focal_length_pixels=float(m.focal_length_pixels),
                    notes="opencalibration_tpu optimized",
                )
            )
        db.save(args.update_camera_db)

    if args.perf:
        print(total_performance_summary())
    return 0


if __name__ == "__main__":
    sys.exit(main())
