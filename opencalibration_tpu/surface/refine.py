"""Mesh refinement by point density.

Round-1 implementation of the contract of reference src/surface/
refine_mesh.cpp (refineByPointDensity :827, countPointsPerTriangle :713):
triangles containing many / high-variance surface points are subdivided so
the mesh can follow terrain. Where the reference bisects longest edges of
a half-edge graph, this build re-grids: count points per triangle with a
batched point-in-triangle test, and rebuild the grid mesh at a finer
spacing wherever density demands, seeding z from the point cloud.
Full longest-edge bisection refinement is planned for the densify rounds.
"""

from __future__ import annotations

from typing import List

import numpy as np

from opencalibration_tpu.surface.mesh import TriMesh, build_grid_mesh
from opencalibration_tpu.types.graph import SurfaceModel

MAX_POINTS_PER_TRIANGLE = 20  # reference pipeline.cpp mesh_refinement


def count_points_per_triangle(mesh: TriMesh, points: np.ndarray) -> np.ndarray:
    """Batched equivalent of countPointsPerTriangle (refine_mesh.cpp:713)."""
    if len(points) == 0:
        return np.zeros(mesh.num_triangles, np.int64)
    ti = mesh.find_triangles(points[:, :2])
    counts = np.zeros(mesh.num_triangles, np.int64)
    np.add.at(counts, ti[ti >= 0], 1)
    return counts


def refine_surfaces(surfaces: List[SurfaceModel]) -> List[SurfaceModel]:
    """Refine each surface's mesh where the point cloud is dense."""
    out = []
    for s in surfaces:
        if s.mesh is None or not s.cloud:
            out.append(s)
            continue
        pts = np.concatenate(s.cloud)
        counts = count_points_per_triangle(s.mesh, pts)
        if counts.max(initial=0) <= MAX_POINTS_PER_TRIANGLE:
            out.append(s)
            continue
        # rebuild at finer spacing so dense triangles get subdivided
        v = s.mesh.vertices
        extent = (v[:, :2].max(0) - v[:, :2].min(0)).max()
        current_spacing = extent / max(
            1, int(np.sqrt(max(s.mesh.num_triangles, 1) / 2))
        )
        target = max(current_spacing / 2.0, 1e-3)
        fake_cams = np.concatenate(
            [v[:, :2], np.full((len(v), 1), v[:, 2].mean() + 10)], axis=1
        )
        # bound vertex growth: the dense-LM tangent carries every mesh z,
        # so cap the refined grid well below the reference's file-size cap
        refined = build_grid_mesh(
            fake_cams, prior_z_points=pts, grid_distance=target, max_cells=64
        )
        s2 = SurfaceModel(cloud=s.cloud, mesh=refined if refined is not None else s.mesh)
        out.append(s2)
    return out
