"""relax() dispatcher — chooses the problem type from the option set
(reference src/relax/relax.cpp:122-136)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

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


def build_problem(
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    cam_models: Dict[int, CameraModel],
    edge_ids: Sequence[int],
    options: RelaxOptions,
    previous_surfaces: Sequence[SurfaceModel] = (),
    grid_fraction: Optional[float] = None,
) -> Tuple[Optional[BuiltProblem], bool]:
    """Build the relax problem for one working set without solving it.
    Returns (BuiltProblem or None, pre_solve_surface flag) — the batched
    group solver builds every group first, then solves them all in one
    device dispatch (reference runs one Ceres solve per RelaxGroup,
    relax_stage.cpp:100-111)."""
    if grid_fraction is None:
        grid_fraction = options.grid_fraction
    if options.ground_mesh or options.ground_plane:
        built = build_mesh_problem(
            graph, node_poses, cam_models, edge_ids, options,
            previous_surfaces, grid_fraction,
        )
        return built, True
    if options.points_3d:
        built = build_points_problem(
            graph, node_poses, cam_models, edge_ids, options
        )
        return built, True
    built = build_decomposition_problem(graph, node_poses, edge_ids)
    return built, False


def relax(
    graph: MeasurementGraph,
    node_poses: Sequence[NodePose],
    cam_models: Dict[int, CameraModel],
    edge_ids: Sequence[int],
    options: RelaxOptions,
    previous_surfaces: Sequence[SurfaceModel] = (),
    grid_fraction: Optional[float] = None,
) -> SurfaceModel:
    """Relax a working set of nodes in place. NaN orientations are seeded
    nadir (the reference's incremental one-at-a-time bootstrap,
    relax.cpp:44-79, collapses to fill-then-solve here: GPS-pinned
    positions + the downwards prior give the same basin)."""
    built, pre_solve = build_problem(
        graph, node_poses, cam_models, edge_ids, options,
        previous_surfaces, grid_fraction,
    )
    if built is None:
        return SurfaceModel()
    if pre_solve:
        return solve_problem(
            built, node_poses, cam_models, pre_solve_surface=True
        )
    return solve_problem(built, node_poses)
