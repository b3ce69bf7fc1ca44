"""Longest-edge bisection refinement tests (the pattern of reference
test/test_refine_mesh.cpp)."""

import numpy as np
import pytest

from opencalibration_tpu.surface.mesh import TriMesh, build_minimal_mesh
from opencalibration_tpu.surface.refine import (
    count_points_per_triangle,
    refine_by_point_density,
)


def conforming(mesh: TriMesh) -> bool:
    """Every edge is shared by at most 2 triangles and no T-junction:
    a vertex lying strictly inside another triangle's edge is forbidden."""
    edge_count = {}
    for tri in mesh.triangles:
        for k in range(3):
            a, b = int(tri[k]), int(tri[(k + 1) % 3])
            key = (min(a, b), max(a, b))
            edge_count[key] = edge_count.get(key, 0) + 1
    if max(edge_count.values()) > 2:
        return False
    # T-junction check: for every edge, no OTHER vertex lies strictly
    # inside the 2d segment
    v = mesh.vertices[:, :2]
    for (a, b), _ in edge_count.items():
        pa, pb = v[a], v[b]
        d = pb - pa
        L2 = d @ d
        if L2 < 1e-18:
            continue
        t = ((v - pa) @ d) / L2
        on = (t > 1e-9) & (t < 1 - 1e-9)
        perp = v - (pa + t[:, None] * d)
        dist2 = np.sum(perp * perp, axis=1)
        bad = on & (dist2 < 1e-18)
        bad[a] = bad[b] = False
        if bad.any():
            return False
    return True


def base_mesh():
    return TriMesh(
        np.array([[0.0, 0, 0], [100.0, 0, 0], [100.0, 100, 0], [0.0, 100, 0]]),
        np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )


def test_refine_subdivides_dense_regions_only():
    rng = np.random.default_rng(0)
    # dense cluster in one corner only
    pts = np.concatenate(
        [
            rng.uniform([5, 5, -1], [25, 25, 1], size=(300, 3)),
            rng.uniform([60, 60, -1], [95, 95, 1], size=(5, 3)),
        ]
    )
    mesh = base_mesh()
    refined = refine_by_point_density(mesh, pts, max_points_per_triangle=20)
    assert refined.num_triangles > mesh.num_triangles
    assert conforming(refined)
    counts = count_points_per_triangle(refined, pts)
    # density bound enforced (up to the min-edge guard)
    v = refined.vertices
    for t in np.where(counts > 20)[0]:
        tri = refined.triangles[t]
        lens = [
            np.linalg.norm(v[tri[(k + 1) % 3], :2] - v[tri[k], :2])
            for k in range(3)
        ]
        assert max(lens) < 2.0 * (100.0 / 50.0) + 1e-6  # hit the size guard
    # the sparse corner stays coarse: triangle containing (80, 80) is large
    ti = refined.find_triangles(np.array([[80.0, 80.0]]))[0]
    tri = refined.triangles[ti]
    area = 0.5 * abs(
        np.cross(v[tri[1], :2] - v[tri[0], :2], v[tri[2], :2] - v[tri[0], :2])
    )
    assert area > 400.0


def test_refine_z_follows_cloud():
    rng = np.random.default_rng(1)
    # terrain step: z=10 on the left half, z=0 on the right
    xy = rng.uniform(0, 100, size=(600, 2))
    z = np.where(xy[:, 0] < 50, 10.0, 0.0)
    pts = np.concatenate([xy, z[:, None]], axis=1)
    refined = refine_by_point_density(base_mesh(), pts, max_points_per_triangle=20)
    # interpolated z near the two plateaus approaches the cloud values
    zl = refined.interpolate_z(np.array([[20.0, 50.0]]))[0]
    zr = refined.interpolate_z(np.array([[80.0, 50.0]]))[0]
    assert zl > 6.0, zl
    assert zr < 4.0, zr


def test_refine_no_points_is_identity():
    mesh = base_mesh()
    refined = refine_by_point_density(mesh, np.zeros((0, 3)))
    assert refined.num_triangles == mesh.num_triangles


def test_refine_respects_min_edge():
    rng = np.random.default_rng(2)
    pts = rng.uniform([0, 0, 0], [100, 100, 0], size=(5000, 3))
    refined = refine_by_point_density(
        base_mesh(), pts, max_points_per_triangle=1, min_edge_length=25.0
    )
    v = refined.vertices
    for tri in refined.triangles:
        for k in range(3):
            ln = np.linalg.norm(v[tri[(k + 1) % 3], :2] - v[tri[k], :2])
            assert ln >= 25.0 - 1e-6 or ln >= 12.5  # halves of guard edges
    assert conforming(refined)


def test_variance_gate_skips_planar_regions():
    """reference refineByPointDensity gates on point-to-plane distance
    variance (refine_mesh.cpp:840): dense but PLANAR points don't refine
    when the pipeline's variance threshold is set."""
    from opencalibration_tpu.surface.refine import triangle_point_stats

    rng = np.random.default_rng(3)
    xy = rng.uniform(0, 100, size=(2000, 2))
    flat = np.concatenate([xy, np.zeros((2000, 1))], axis=1)
    mesh = base_mesh()
    refined = refine_by_point_density(
        mesh, flat, max_points_per_triangle=20, min_distance_variance=0.01
    )
    assert refined.num_triangles == mesh.num_triangles  # planar -> untouched

    # rough terrain in one half only: refinement follows the variance
    z = np.where(xy[:, 0] < 50, rng.normal(0, 2.0, 2000), 0.0)
    rough = np.concatenate([xy, z[:, None]], axis=1)
    refined = refine_by_point_density(
        mesh, rough, max_points_per_triangle=20, min_distance_variance=0.01
    )
    assert refined.num_triangles > mesh.num_triangles
    counts, variance = triangle_point_stats(refined, rough)
    assert conforming(refined)


def test_newest_vertex_bisection_conforms_with_propagation():
    """A skewed mesh where the shared edge is NOT the neighbour's longest
    edge forces the recursive propagation (reference refineTriangle,
    refine_mesh.hpp:102-133) — the result must still be conforming."""
    from opencalibration_tpu.surface.refine import refine_at_point

    v = np.array(
        [[0.0, 0, 0], [10.0, 0, 0], [10.0, 4, 0], [0.0, 4, 0], [30.0, 2, 0]]
    )
    t = np.array([[0, 1, 2], [0, 2, 3], [1, 4, 2]], np.int32)
    mesh = TriMesh(v, t)
    refined = refine_at_point(mesh, 5.0, 2.0, levels=3)
    assert refined.num_triangles > mesh.num_triangles
    assert conforming(refined)


def test_refine_where_predicate():
    from opencalibration_tpu.surface.refine import refine_where

    mesh = base_mesh()
    refined = refine_where(
        mesh, lambda x, y, z: x < 50.0, max_iterations=2
    )
    assert refined.num_triangles > mesh.num_triangles
    assert conforming(refined)


def test_merge_surface_models_weighted():
    """reference mergeSurfaceModels (refine_mesh.hpp:196-207): same
    topology, vertex z weighted by each group's point count in adjacent
    triangles."""
    from opencalibration_tpu.surface.refine import merge_surface_models
    from opencalibration_tpu.types.graph import SurfaceModel

    t = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    v1 = np.array([[0.0, 0, 10], [100.0, 0, 10], [100.0, 100, 10], [0.0, 100, 10]])
    v2 = np.array([[0.0, 0, 30], [100.0, 0, 30], [100.0, 100, 30], [0.0, 100, 30]])
    rng = np.random.default_rng(4)
    # group 1 has 3x the points of group 2 -> merged z nearer 10
    c1 = rng.uniform([0, 0, 9], [100, 100, 11], size=(300, 3))
    c2 = rng.uniform([0, 0, 29], [100, 100, 31], size=(100, 3))
    s1 = SurfaceModel(cloud=[c1], mesh=TriMesh(v1, t))
    s2 = SurfaceModel(cloud=[c2], mesh=TriMesh(v2, t))
    merged = merge_surface_models([s1, s2])
    assert merged is not None
    z = merged.mesh.vertices[:, 2]
    np.testing.assert_allclose(z, 15.0, atol=1.0)  # 0.75*10 + 0.25*30
    assert len(merged.cloud) == 2

    # different topology -> None (caller keeps the list)
    s3 = SurfaceModel(cloud=[], mesh=TriMesh(v1[:3], np.array([[0, 1, 2]], np.int32)))
    assert merge_surface_models([s1, s3]) is None
