"""Ortho layer tests: GeoTIFF roundtrip, tile ordering, image cache,
blending kernels, color balance, thumbnail + full-res orthomosaic on the
synthetic survey (the pattern of reference test_ortho_functional.cpp)."""


import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-pipeline / device-heavy module

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


def test_geotiff_tile_writer_streaming(tmp_path):
    """Tiles written incrementally in arbitrary order round-trip exactly,
    including overviews, and OpenCV can open the file."""
    import cv2

    from opencalibration_tpu.io.geotiff import (
        GeoTiffTileWriter,
        read_geotiff,
        read_geotiff_overviews,
    )

    rng = np.random.default_rng(7)
    H, W, ts = 300, 420, 128
    img = rng.integers(0, 255, (H, W, 4), dtype=np.uint8)
    path = str(tmp_path / "tiled.tif")
    w = GeoTiffTileWriter(
        path, W, H, 4, np.uint8, (5.0, 9.0), (0.5, 0.5),
        tile_size=ts, wkt='PROJCS["t"]', overviews=2,
    )
    tiles = [(tx, ty) for ty in range(w.tiles_y) for tx in range(w.tiles_x)]
    rng.shuffle(tiles)  # cache-aware orders are not raster order
    for tx, ty in tiles:
        x0, y0 = tx * ts, ty * ts
        w.write_tile(tx, ty, img[y0 : y0 + ts, x0 : x0 + ts])
    w.close()

    back, origin, px, wkt = read_geotiff(path)
    np.testing.assert_array_equal(back, img)
    assert origin == (5.0, 9.0) and px == (0.5, 0.5) and wkt == 'PROJCS["t"]'
    shapes = read_geotiff_overviews(path)
    assert shapes == [(H, W), (H // 2, W // 2), (H // 4, W // 4)]
    assert cv2.imread(path, cv2.IMREAD_UNCHANGED) is not None


def test_geotiff_tile_writer_uint64_camera_ids(tmp_path):
    """Camera-id sidecar: ONE uint64 band round-trips whole 64-bit ids
    (the reference round-trips uint64 camera ids through GeoTIFF sidecars,
    test_ortho_functional.cpp)."""
    from opencalibration_tpu.io.geotiff import GeoTiffTileWriter, read_geotiff

    ids = np.array([[2**40 + 17, 0], [123456789012345, 2**63 - 1]], np.uint64)
    path = str(tmp_path / "camids.tif")
    w = GeoTiffTileWriter(path, 2, 2, 1, np.uint64, (0, 0), (1, 1), tile_size=16)
    w.write_tile(0, 0, ids[..., None])
    w.close()
    back, *_ = read_geotiff(path)
    np.testing.assert_array_equal(back[:, :, 0], ids)


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


def _nadir_sample(points, cam_pos, model, image, taps, gsd):
    """Single nadir camera helper around _sample_cameras_kernel."""
    from opencalibration_tpu.ortho.ortho import _sample_cameras_kernel
    from opencalibration_tpu.types.camera import stack_cameras

    DOWN = np.array([0.0, 1.0, 0.0, 0.0], np.float32)
    colors, weights, geom = _sample_cameras_kernel(
        jnp.asarray(points, jnp.float32),
        jnp.asarray(DOWN[None]),
        jnp.asarray(np.asarray(cam_pos, np.float32)[None]),
        stack_cameras([model]),
        jnp.asarray(image[None].astype(np.float32)),
        jnp.asarray(np.asarray([image.shape[:2]], np.int32)),
        jnp.asarray(np.ones(1, np.float32)),
        jnp.ones(1, bool),
        jnp.asarray(50.0, jnp.float32),
        jnp.asarray(gsd, jnp.float32),
        taps=taps,
    )
    return np.asarray(colors)[0], np.asarray(weights)[0], np.asarray(geom)[0]


def test_anisotropic_sampling_antialiases_checkerboard():
    """Jacobian-footprint supersampling (reference PatchSampler,
    ortho.cpp:69-222): when one output pixel spans many source pixels, the
    taps>1 render must approach the brute-force supersampled mean where a
    single bilinear tap aliases."""
    from opencalibration_tpu.types.camera import CameraModel

    W, H, F = 320, 240, 400.0
    model = CameraModel.create(F, (W / 2, H / 2), pixels_cols=W, pixels_rows=H)
    # 2px checkerboard: mean = 127.5, single taps land near 0 or 255
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    checker = (((xx // 2) + (yy // 2)) % 2 * 255).astype(np.float32)
    image = np.repeat(checker[:, :, None], 3, axis=2)

    cam_pos = np.array([0.0, 0.0, 50.0])
    # source px footprint on ground = z/f = 0.125 m; gsd = 1 m -> 8x8 px
    gsd = 1.0
    n = 24
    gx, gy = np.meshgrid(
        (np.arange(n) - n / 2) * gsd, (np.arange(n) - n / 2) * gsd
    )
    points = np.stack([gx.ravel(), gy.ravel(), np.zeros(n * n)], axis=1)

    c1, w1, _ = _nadir_sample(points, cam_pos, model, image, 1, gsd)
    c5, w5, _ = _nadir_sample(points, cam_pos, model, image, 5, gsd)

    # brute-force supersampling reference: 16x16 world-space sub-samples
    s = 16
    off = (np.arange(s) + 0.5) / s - 0.5
    ou, ov = np.meshgrid(off * gsd, off * gsd)
    subs = []
    for du, dv in zip(ou.ravel(), ov.ravel()):
        sub = points.copy()
        sub[:, 0] += du
        sub[:, 1] += dv
        cs, _, _ = _nadir_sample(sub, cam_pos, model, image, 1, gsd)
        subs.append(cs)
    truth = np.mean(subs, axis=0)

    got = w1 > 0
    assert got.sum() > 100
    err1 = np.abs(c1[got, 0] - truth[got, 0]).mean()
    err5 = np.abs(c5[got, 0] - truth[got, 0]).mean()
    assert err5 < 12.0, f"anisotropic render should match supersampling, err={err5}"
    assert err5 < err1 / 4, f"taps=5 ({err5}) must beat taps=1 ({err1}) by >4x"


def _vignetted_survey(tmp_path):
    """Tiny nadir survey over flat ground with radial vignetting baked
    into otherwise-uniform images; returns (surfaces, graph, model_store,
    vig_l_drop) ready for OrthoJob."""
    import cv2

    from opencalibration_tpu.surface.mesh import build_minimal_mesh
    from opencalibration_tpu.types.camera import CameraModel
    from opencalibration_tpu.types.graph import (
        ImageNode,
        MeasurementGraph,
        SurfaceModel,
    )

    W, H, F, ALT = 320, 240, 200.0, 40.0
    VIG = 25.0  # L drop at normalized radius 1
    model = CameraModel.create(F, (W / 2, H / 2), pixels_cols=W, pixels_rows=H)
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    r2 = ((xx - W / 2) ** 2 + (yy - H / 2) ** 2) / (0.25 * (W**2 + H**2))
    lab = np.zeros((H, W, 3), np.uint8)
    lab[..., 0] = np.clip(150.0 - VIG * r2, 0, 255).astype(np.uint8)
    lab[..., 1] = 128
    lab[..., 2] = 128
    bgr = cv2.cvtColor(lab, cv2.COLOR_Lab2BGR)

    DOWN = np.array([0.0, 1.0, 0.0, 0.0])
    graph = MeasurementGraph()
    positions = []
    for r in range(2):
        for c in range(3):
            pos = np.array([c * 18.0, r * 18.0, ALT])
            positions.append(pos)
            path = str(tmp_path / f"img_{r}_{c}.png")
            cv2.imwrite(path, bgr)
            graph.add_node(
                ImageNode(
                    path=path, model_id=0, position=pos, orientation=DOWN.copy()
                )
            )
    mesh = build_minimal_mesh(
        np.asarray(positions), prior_z_points=np.zeros((4, 3))
    )
    surfaces = [SurfaceModel(cloud=[], mesh=mesh)]
    return surfaces, graph, {0: model}, VIG


def test_color_balance_recovers_injected_vignetting(tmp_path):
    """End-to-end radiometric geometry: pass_layers records real
    per-sample radius/angle/xy (reference ortho.cpp:1324-1418), so the
    color-balance solve can explain an injected radial L falloff — the
    correction must flatten correspondence mismatches and reproduce the
    injected polynomial's magnitude."""
    from opencalibration_tpu.ortho.ortho import OrthoJob

    surfaces, graph, model_store, vig_true = _vignetted_survey(tmp_path)
    job = OrthoJob(
        surfaces, graph, model_store, max_megapixels=1.0, taps=1
    )
    assert job.ok
    assert job.pass_layers()
    corrs = job.correspondences
    assert len(corrs) > 50
    # the correspondences must carry non-degenerate geometry
    radii = np.asarray([c.normalized_radius_a for c in corrs])
    assert radii.std() > 0.05 and radii.max() > 0.4
    assert job.solve_balance()
    bal = job.balance
    assert bal.success

    # residual mismatch between paired observations collapses after correction
    def mismatch(c, corrected):
        la, lb = float(c.lab_a[0]), float(c.lab_b[0])
        if corrected:
            pa = bal.per_image_params[c.camera_id_a]
            pb = bal.per_image_params[c.camera_id_b]
            va = bal.per_model_vignetting[c.model_id_a]
            vb = bal.per_model_vignetting[c.model_id_b]
            r2a, r2b = c.normalized_radius_a**2, c.normalized_radius_b**2
            la -= (
                pa.lab_offset[0]
                + va[0] * r2a + va[1] * r2a**2 + va[2] * r2a**3
                + pa.brdf_coeff * c.view_angle_a**2
                + pa.slope[0] * c.normalized_x_a + pa.slope[1] * c.normalized_y_a
            )
            lb -= (
                pb.lab_offset[0]
                + vb[0] * r2b + vb[1] * r2b**2 + vb[2] * r2b**3
                + pb.brdf_coeff * c.view_angle_b**2
                + pb.slope[0] * c.normalized_x_b + pb.slope[1] * c.normalized_y_b
            )
        return abs(la - lb)

    before = np.mean([mismatch(c, False) for c in corrs])
    after = np.mean([mismatch(c, True) for c in corrs])
    assert before > 2.0  # vignetting creates real mismatch
    assert after < 0.35 * before, f"correction must flatten L: {before} -> {after}"

    # combined radial correction (vignetting polynomial + BRDF term, which
    # are collinear for a nadir survey) reproduces the injected falloff
    vig = bal.per_model_vignetting[0]
    brdf = np.mean([p.brdf_coeff for p in bal.per_image_params.values()])
    W, H, F = 320.0, 240.0, 200.0
    half_diag = 0.5 * np.hypot(W, H)
    for r in (0.5, 0.8):
        theta = np.arctan2(r * half_diag, F)
        pred = (
            vig[0] * r**2 + vig[1] * r**4 + vig[2] * r**6 + brdf * theta**2
        )
        injected = -vig_true * r**2
        assert abs(pred - injected) < 0.5 * abs(injected), (
            f"r={r}: predicted {pred}, injected {injected}"
        )


def test_ortho_streaming_blend_and_camera_ids(tmp_path):
    """Blend pass re-renders tiles on device (no layer store — pass 2
    recomputes pass 1's stacks) and streams them plus the camera-id
    sidecar raster (reference ortho.cpp:1465-1640)."""
    from opencalibration_tpu.io.geotiff import read_geotiff
    from opencalibration_tpu.ortho.ortho import OrthoJob

    surfaces, graph, model_store, _ = _vignetted_survey(tmp_path)
    job = OrthoJob(surfaces, graph, model_store, max_megapixels=1.0, taps=1)
    assert job.ok
    assert job.pass_layers()
    assert job.correspondences, "pass 1 must collect balance samples"
    assert job.solve_balance()
    out = str(tmp_path / "o.tif")
    camids = str(tmp_path / "o_camids.tif")
    assert job.pass_blend(out, camera_id_path=camids)

    img, origin, px, _ = read_geotiff(out)
    assert img.shape[2] == 4 and (img[:, :, 3] == 255).mean() > 0.1
    ids, *_ = read_geotiff(camids)
    assert ids.dtype == np.dtype("<u8") and ids.shape[2] == 1
    covered = img[:, :, 3] == 255
    node_ids = set(int(i) for i in np.unique(ids[:, :, 0][covered]))
    assert node_ids and node_ids.issubset({int(n) for n in graph.node_ids()})


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
    # the mesh bounds carry ~2xAGL border margins that dwarf a tiny test
    # survey, so assert coverage INSIDE the camera footprint, not globally
    _, gt_positions, _ = p._ground_truth
    ox, oy = mosaic.origin_xy
    x0 = int((gt_positions[:, 0].min() - ox) / mosaic.gsd)
    x1 = int((gt_positions[:, 0].max() - ox) / mosaic.gsd)
    y0 = int((oy - gt_positions[:, 1].max()) / mosaic.gsd)
    y1 = int((oy - gt_positions[:, 1].min()) / mosaic.gsd)
    window = covered[max(y0, 0) : max(y1, 1), max(x0, 0) : max(x1, 1)]
    assert window.size > 0 and window.mean() > 0.8, window.mean()
    assert covered.mean() > 0.02
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
    assert (img[:, :, 3] == 255).mean() > 0.02  # footprint << mesh borders


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
