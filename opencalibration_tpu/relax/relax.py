"""relax() dispatcher — chooses the problem type from the option set
(reference src/relax/relax.cpp:122-136)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from opencalibration_tpu.relax.problem_builder import (
    BuiltProblem,
    RelaxOptions,
    build_decomposition_problem,
    build_mesh_problem,
    build_points_problem,
    solve_problem,
)
from opencalibration_tpu.types.camera import CameraModel
from opencalibration_tpu.types.graph import MeasurementGraph, NodePose, SurfaceModel


def relax(
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    cam_models: Dict[int, CameraModel],
    edge_ids: Sequence[int],
    options: RelaxOptions,
    previous_surfaces: Sequence[SurfaceModel] = (),
    grid_fraction: float = 0.15,
) -> SurfaceModel:
    """Relax a working set of nodes in place. NaN orientations are seeded
    nadir (the reference's incremental one-at-a-time bootstrap,
    relax.cpp:44-79, collapses to fill-then-solve here: GPS-pinned
    positions + the downwards prior give the same basin)."""
    if options.ground_mesh or options.ground_plane:
        built = build_mesh_problem(
            graph, node_poses, cam_models, edge_ids, options,
            previous_surfaces, grid_fraction,
        )
        if built is None:
            return SurfaceModel()
        return solve_problem(
            built, node_poses, cam_models, pre_solve_surface=True
        )
    if options.points_3d:
        built = build_points_problem(
            graph, node_poses, cam_models, edge_ids, options
        )
        if built is None:
            return SurfaceModel()
        return solve_problem(
            built, node_poses, cam_models, pre_solve_surface=True
        )
    built = build_decomposition_problem(graph, node_poses, edge_ids)
    if built is None:
        return SurfaceModel()
    return solve_problem(built, node_poses)
