"""Mesh refinement by point density.

Implements the contract of reference src/surface/refine_mesh.cpp
(refineByPointDensity :827, bisectEdge :195, countPointsPerTriangle :713):
triangles containing many / high-z-variance surface points are subdivided
by longest-edge bisection — the shared edge's midpoint becomes a new
vertex and both adjacent triangles split, keeping the mesh conforming —
iterating until density bounds hold or the minimum edge length / iteration
cap is reached. Counting is the batched bin-indexed point-in-triangle
test; the graph surgery itself is host-side (pointer-chasing, not TPU
work — SURVEY section 7 step 5).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from opencalibration_tpu.surface.mesh import TriMesh, build_grid_mesh
from opencalibration_tpu.types.graph import SurfaceModel

MAX_POINTS_PER_TRIANGLE = 20  # reference pipeline.cpp mesh_refinement
MESH_REFINEMENT_MAX_ITERATIONS = 20  # reference pipeline.cpp:38


def count_points_per_triangle(mesh: TriMesh, points: np.ndarray) -> np.ndarray:
    """Batched equivalent of countPointsPerTriangle (refine_mesh.cpp:713)."""
    if len(points) == 0:
        return np.zeros(mesh.num_triangles, np.int64)
    ti = mesh.find_triangles(points[:, :2])
    counts = np.zeros(mesh.num_triangles, np.int64)
    np.add.at(counts, ti[ti >= 0], 1)
    return counts


def _edge_key(a: int, b: int) -> Tuple[int, int]:
    return (a, b) if a < b else (b, a)


def refine_by_point_density(
    mesh: TriMesh,
    points: np.ndarray,
    max_points_per_triangle: int = MAX_POINTS_PER_TRIANGLE,
    variance_z: Optional[float] = None,
    max_iterations: int = MESH_REFINEMENT_MAX_ITERATIONS,
    min_edge_length: Optional[float] = None,
) -> TriMesh:
    """Longest-edge bisection refinement (refineByPointDensity contract).

    A triangle is flagged when it contains more than
    max_points_per_triangle cloud points, or when the z-variance of its
    points exceeds variance_z. Each iteration splits every flagged
    triangle's longest edge at its midpoint; neighbours sharing a split
    edge are split too (conforming mesh, no T-junctions). New vertex z
    comes from the median of nearby cloud points when available, else the
    edge midpoint.
    """
    points = np.asarray(points, np.float64).reshape(-1, 3)
    if len(points) == 0 or mesh.num_triangles == 0:
        return mesh
    if min_edge_length is None:
        # guard against runaway subdivision: ~1/50 of the footprint
        extent = (mesh.vertices[:, :2].max(0) - mesh.vertices[:, :2].min(0)).max()
        min_edge_length = extent / 50.0

    vertices = [v for v in mesh.vertices]
    triangles = list(map(tuple, mesh.triangles.tolist()))

    for _ in range(max_iterations):
        cur = TriMesh(np.asarray(vertices), np.asarray(triangles, np.int32))
        ti = cur.find_triangles(points[:, :2])
        counts = np.zeros(cur.num_triangles, np.int64)
        np.add.at(counts, ti[ti >= 0], 1)
        flagged = counts > max_points_per_triangle
        if variance_z is not None:
            for t in range(cur.num_triangles):
                sel = ti == t
                if sel.sum() >= 2 and np.var(points[sel, 2]) > variance_z:
                    flagged[t] = True
        if not flagged.any():
            break

        # choose the longest edge of each flagged (and large-enough) triangle
        V = np.asarray(vertices)
        split_edges = set()
        for t in np.where(flagged)[0]:
            tri = triangles[t]
            lens = [
                (np.linalg.norm(V[tri[(k + 1) % 3], :2] - V[tri[k], :2]), k)
                for k in range(3)
            ]
            ln, k = max(lens)
            if ln < 2.0 * min_edge_length:
                continue
            split_edges.add(_edge_key(tri[k], tri[(k + 1) % 3]))
        if not split_edges:
            break

        # midpoints (z from local cloud median when close points exist)
        midpoint_of: Dict[Tuple[int, int], int] = {}
        for a, b in sorted(split_edges):
            mid = 0.5 * (np.asarray(vertices[a]) + np.asarray(vertices[b]))
            r = 0.5 * np.linalg.norm(np.asarray(vertices[a])[:2] - np.asarray(vertices[b])[:2])
            d2 = np.sum((points[:, :2] - mid[:2]) ** 2, axis=1)
            near = d2 <= r * r
            if near.sum() >= 3:
                mid[2] = np.median(points[near, 2])
            midpoint_of[(a, b)] = len(vertices)
            vertices.append(mid)

        # conforming split: every triangle adjacent to a split edge splits
        # at that edge (one edge per triangle per iteration; remaining
        # flags re-trigger next iteration)
        new_triangles = []
        for tri in triangles:
            hit = None
            for k in range(3):
                key = _edge_key(tri[k], tri[(k + 1) % 3])
                if key in midpoint_of:
                    hit = (k, midpoint_of[key])
                    break
            if hit is None:
                new_triangles.append(tri)
            else:
                k, m = hit
                a, b, c = tri[k], tri[(k + 1) % 3], tri[(k + 2) % 3]
                new_triangles.append((a, m, c))
                new_triangles.append((m, b, c))
        triangles = new_triangles

    return TriMesh(np.asarray(vertices), np.asarray(triangles, np.int32))


def refine_surfaces(surfaces: List[SurfaceModel]) -> List[SurfaceModel]:
    """Refine each surface's mesh where the point cloud is dense."""
    out = []
    for s in surfaces:
        if s.mesh is None or not s.cloud:
            out.append(s)
            continue
        pts = np.concatenate(s.cloud)
        refined = refine_by_point_density(s.mesh, pts)
        out.append(SurfaceModel(cloud=s.cloud, mesh=refined))
    return out
