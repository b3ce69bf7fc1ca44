"""Ortho layer tests: GeoTIFF roundtrip, tile ordering, image cache,
blending kernels, color balance, thumbnail + full-res orthomosaic on the
synthetic survey (the pattern of reference test_ortho_functional.cpp)."""

import numpy as np
import pytest

import jax.numpy as jnp


def test_geotiff_roundtrip_uint8(tmp_path):
    from opencalibration_tpu.io.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (37, 53, 4), dtype=np.uint8)
    path = str(tmp_path / "a.tif")
    write_geotiff(path, img, (1000.0, 2000.0), (0.25, 0.25), wkt='PROJCS["x"]')
    back, origin, px, wkt = read_geotiff(path)
    np.testing.assert_array_equal(back, img)
    assert origin == (1000.0, 2000.0)
    assert px == (0.25, 0.25)
    assert wkt == 'PROJCS["x"]'


def test_geotiff_roundtrip_float32(tmp_path):
    from opencalibration_tpu.io.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(1)
    dsm = rng.normal(size=(64, 48)).astype(np.float32)
    path = str(tmp_path / "dsm.tif")
    write_geotiff(path, dsm, (0.0, 100.0), (1.0, 1.0), nodata=-32767.0)
    back, origin, px, _ = read_geotiff(path)
    np.testing.assert_allclose(back[:, :, 0], dsm, atol=1e-7)


def test_geotiff_readable_by_opencv(tmp_path):
    """Cross-check our TIFF against an independent reader."""
    import cv2

    from opencalibration_tpu.io.geotiff import write_geotiff

    img = np.arange(40 * 30 * 3, dtype=np.uint8).reshape(40, 30, 3) % 255
    path = str(tmp_path / "c.tif")
    write_geotiff(path, img, (0, 0), (1, 1), compress=False)
    back = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    assert back is not None, "OpenCV could not read our TIFF"
    # cv2 returns TIFF RGB data in BGR channel order
    np.testing.assert_array_equal(back[..., ::-1], img)


def test_hilbert_order_is_permutation_and_local():
    from opencalibration_tpu.ortho.tile_ordering import hilbert_tile_order

    order = hilbert_tile_order(8, 8)
    assert sorted(order) == [(x, y) for y in range(8) for x in range(8)][0:64] or len(set(order)) == 64
    # consecutive tiles are adjacent on a hilbert curve
    dists = [abs(a[0] - b[0]) + abs(a[1] - b[1]) for a, b in zip(order, order[1:])]
    assert max(dists) == 1


def test_cache_aware_order_beats_row_order():
    from opencalibration_tpu.ortho.tile_ordering import (
        compute_cache_aware_tile_order,
        simulate_cache_misses,
    )

    # cameras arranged in column bands: row-major order thrashes a small cache
    nx = ny = 8
    tile_cams = {}
    for ty in range(ny):
        for tx in range(nx):
            tile_cams[ty * nx + tx] = {tx // 2, 100 + tx // 2}
    row_order = [(x, y) for y in range(ny) for x in range(nx)]
    chosen = compute_cache_aware_tile_order(tile_cams, nx, ny, cache_size=3)
    assert sorted(chosen) == sorted(row_order)
    assert simulate_cache_misses(chosen, tile_cams, nx, 3) <= simulate_cache_misses(
        row_order, tile_cams, nx, 3
    )


def test_image_cache_lru_and_dedup():
    from opencalibration_tpu.ortho.image_cache import FullResolutionImageCache

    loads = []

    def loader(path):
        loads.append(path)
        return np.zeros((2, 2, 3), np.uint8)

    cache = FullResolutionImageCache(max_images=2, loader=loader)
    cache.get("a")
    cache.get("a")
    assert loads == ["a"]
    cache.get("b")
    cache.get("c")  # evicts a
    cache.get("a")
    assert loads == ["a", "b", "c", "a"]
    assert cache.hits == 1


def test_blend_weight_properties():
    from opencalibration_tpu.ortho.blending import compute_blend_weight

    w_center = float(compute_blend_weight(50.0, 50.0, 100, 100, 0.0))
    w_edge = float(compute_blend_weight(1.0, 50.0, 100, 100, 0.0))
    w_far = float(compute_blend_weight(50.0, 50.0, 100, 100, 3.0))
    assert w_center > w_edge
    assert w_center > w_far
    assert w_edge > 0


def test_pull_push_fill_fills_holes():
    from opencalibration_tpu.ortho.blending import pull_push_fill

    color = np.zeros((1, 32, 32, 3), np.float32)
    weight = np.zeros((1, 32, 32, 1), np.float32)
    color[0, :, :16] = 100.0
    weight[0, :, :16] = 1.0
    filled = np.asarray(pull_push_fill(jnp.asarray(color), jnp.asarray(weight)))
    # hole region extrapolated towards the valid color
    assert abs(filled[0, 16, 24, 0] - 100.0) < 25.0


def test_laplacian_blend_smooth_transition():
    from opencalibration_tpu.ortho.blending import laplacian_blend

    h = w = 64
    c0 = np.full((h, w, 3), 50.0, np.float32)
    c1 = np.full((h, w, 3), 150.0, np.float32)
    w0 = np.zeros((h, w, 1), np.float32)
    w1 = np.zeros((h, w, 1), np.float32)
    w0[:, : w // 2] = 1.0
    w1[:, w // 2 :] = 1.0
    out = np.asarray(
        laplacian_blend(
            jnp.asarray(np.stack([c0, c1])), jnp.asarray(np.stack([w0, w1])), levels=4
        )
    )
    assert abs(out[32, 4, 0] - 50.0) < 8
    assert abs(out[32, 60, 0] - 150.0) < 8
    # the seam is smooth: no jump bigger than ~30 between adjacent columns
    jumps = np.abs(np.diff(out[32, :, 0]))
    assert jumps.max() < 30


def test_color_balance_recovers_offsets():
    from opencalibration_tpu.ortho.color_balance import (
        ColorCorrespondence,
        solve_color_balance,
    )

    # camera 1 is +10 L brighter than camera 0; correspondences observe it
    rng = np.random.default_rng(0)
    corrs = []
    for _ in range(60):
        base = rng.uniform(80, 120, 3)
        corrs.append(
            ColorCorrespondence(
                camera_id_a=0, camera_id_b=1, model_id_a=0, model_id_b=0,
                lab_a=base, lab_b=base + np.array([10.0, 0, 0]),
                normalized_radius_a=0.3, normalized_radius_b=0.3,
                view_angle_a=0.1, view_angle_b=0.1,
                normalized_x_a=0.0, normalized_y_a=0.0,
                normalized_x_b=0.0, normalized_y_b=0.0,
            )
        )
    res = solve_color_balance(corrs, {0: np.array([0.0, 0]), 1: np.array([10.0, 0])})
    assert res.success
    diff = (
        res.per_image_params[1].lab_offset[0]
        - res.per_image_params[0].lab_offset[0]
    )
    assert abs(diff - 10.0) < 1.0  # relative offset recovered
    # detrended: offsets are mean/plane-free, not absolute
    mean_L = (
        res.per_image_params[0].lab_offset[0] + res.per_image_params[1].lab_offset[0]
    )
    assert abs(mean_L) < 2.0


@pytest.fixture(scope="module")
def calibrated_pipeline(calibrated_pipeline_session):
    return calibrated_pipeline_session


def test_thumbnail_orthomosaic(calibrated_pipeline):
    from opencalibration_tpu.ortho.ortho import generate_orthomosaic

    p = calibrated_pipeline
    mosaic = generate_orthomosaic(p.surfaces, p.graph, p.model_store)
    assert mosaic is not None
    h, w = mosaic.rgba.shape[:2]
    assert h > 10 and w > 10
    covered = mosaic.rgba[:, :, 3] == 255
    assert covered.mean() > 0.15  # survey footprint covered (mesh bounds include borders)
    # DSM near ground level (z ~ 0) where covered
    dsm_vals = mosaic.dsm[covered & np.isfinite(mosaic.dsm)]
    assert len(dsm_vals) > 0 and abs(np.median(dsm_vals)) < 5.0
    assert (mosaic.camera_index[covered] >= 0).all()
    assert mosaic.overlap[covered].max() >= 2  # overlapping survey


def test_dsm_and_ortho_geotiff(calibrated_pipeline, tmp_path):
    from opencalibration_tpu.io.geotiff import read_geotiff
    from opencalibration_tpu.ortho.ortho import (
        generate_dsm_geotiff,
        generate_ortho_geotiff,
    )

    p = calibrated_pipeline
    dsm_path = str(tmp_path / "dsm.tif")
    assert generate_dsm_geotiff(dsm_path, p.surfaces, p.graph, p.model_store, p.geocoord)
    dsm, origin, px, wkt = read_geotiff(dsm_path)
    assert wkt and "Transverse_Mercator" in wkt
    valid = dsm[:, :, 0] > -30000
    assert valid.any() and abs(np.median(dsm[:, :, 0][valid])) < 5.0

    ortho_path = str(tmp_path / "ortho.tif")
    assert generate_ortho_geotiff(
        ortho_path, p.surfaces, p.graph, p.model_store, p.geocoord,
        max_megapixels=1.0,
    )
    img, origin, px, wkt = read_geotiff(ortho_path)
    assert img.shape[2] == 4
    assert (img[:, :, 3] == 255).mean() > 0.15


def test_textured_obj(calibrated_pipeline, tmp_path):
    from opencalibration_tpu.ortho.ortho import (
        generate_orthomosaic,
        generate_textured_obj,
    )

    p = calibrated_pipeline
    mosaic = generate_orthomosaic(p.surfaces, p.graph, p.model_store)
    prefix = str(tmp_path / "mesh")
    assert generate_textured_obj(
        prefix, p.surfaces, mosaic.rgba, mosaic.origin_xy, mosaic.gsd
    )
    obj = open(prefix + ".obj").read()
    assert obj.count("\nv ") + obj.startswith("v ") >= 3
    assert "vt " in obj and "f " in obj
    import os

    assert os.path.getsize(prefix + ".jpg") > 0
    assert os.path.getsize(prefix + ".mtl") > 0


def test_blend_tile_updates(calibrated_pipeline, tmp_path):
    """TileUpdate progress payloads stream during the blend pass
    (reference progress.hpp:15-34)."""
    from opencalibration_tpu.ortho.ortho import OrthoJob

    p = calibrated_pipeline
    job = OrthoJob(
        p.surfaces, p.graph, p.model_store, p.geocoord, max_megapixels=0.25
    )
    assert job.ok
    updates = []
    job.tile_callback = updates.append
    job.pass_layers()
    job.solve_balance()
    assert job.pass_blend(str(tmp_path / "o.tif"))
    assert updates
    assert updates[-1]["fraction_done"] == 1.0
    assert updates[0]["png_base64"]


def test_geotiff_overviews(tmp_path):
    """Internal AVERAGE overviews as chained reduced-resolution IFDs
    (the reference requests GDAL AVERAGE overviews on its rasters)."""
    import cv2

    from opencalibration_tpu.io.geotiff import (
        read_geotiff,
        read_geotiff_overviews,
        write_geotiff,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (128, 96, 3), dtype=np.uint8)
    path = str(tmp_path / "ov.tif")
    write_geotiff(path, img, (10.0, 20.0), (0.5, 0.5), overviews=2)

    shapes = read_geotiff_overviews(path)
    assert shapes == [(128, 96), (64, 48), (32, 24)]
    # base image + georeferencing still read back exactly
    back, origin, px, _ = read_geotiff(path)
    np.testing.assert_array_equal(back, img)
    assert origin == (10.0, 20.0)
    # an independent reader still opens it
    assert cv2.imread(path, cv2.IMREAD_UNCHANGED) is not None
