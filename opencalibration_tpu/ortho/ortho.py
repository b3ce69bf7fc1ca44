"""Orthomosaic generation: thumbnail mosaic, DSM, full-resolution
layered rendering, color balance, blending, textured OBJ export.

TPU-native re-design of reference src/ortho/ortho.cpp:

* the per-pixel triangle-walk ray trace (ortho.cpp:560-580) becomes a
  batched barycentric mesh-z interpolation over whole pixel grids;
* per-pixel 5-NN camera projection + sampling (:1206-1429) becomes a
  [K, tile_h, tile_w] vmapped project/gather kernel per tile, with the
  per-tile candidate camera set chosen on host;
* the two GeoTIFF passes (layers then blend, :1431-2050) keep the
  reference's structure — cache-aware tile order, full-res LRU image
  cache with prefetch, Lab color correspondences at layer overlaps,
  color-balance solve, pull-push fill + Laplacian blending — with the
  pixel math on device and GDAL replaced by io.geotiff.

Coordinate convention: world x = east, y = north; raster row 0 = max_y.
"""

from __future__ import annotations

import dataclasses
import functools
import math
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops.distort import image_from_3d, image_to_3d
from opencalibration_tpu.ops.quaternion import quat_rotate, quat_rotate_inverse
from opencalibration_tpu.ortho.blending import (
    compute_blend_weight,
    laplacian_blend,
    pull_push_fill,
    sigmoid_transition_weight,
)
from opencalibration_tpu.ortho.color_balance import (
    ColorCorrespondence,
    apply_correction,
    solve_color_balance,
)
from opencalibration_tpu.ortho.image_cache import FullResolutionImageCache
from opencalibration_tpu.ortho.tile_ordering import compute_cache_aware_tile_order
from opencalibration_tpu.types.camera import (
    CameraModel,
    stack_cameras,
    take_camera,
)
from opencalibration_tpu.types.graph import MeasurementGraph, SurfaceModel

MAX_CAMERAS_PER_PIXEL = 5  # reference ortho.cpp closest5
DEFAULT_TILE = 256
CORR_STRIDE = 97  # every 97th overlap pixel feeds color balance


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


@dataclasses.dataclass
class OrthoBounds:
    min_x: float
    max_x: float
    min_y: float
    max_y: float
    mean_surface_z: float


@dataclasses.dataclass
class OrthoContext:
    bounds: OrthoBounds
    gsd: float
    involved_nodes: List[int]
    mean_camera_z: float
    average_camera_elevation: float
    mesh: object  # TriMesh


@dataclasses.dataclass
class OrthoMosaic:
    """reference ortho.hpp OrthoMosaic."""

    rgba: np.ndarray  # [H, W, 4] uint8
    dsm: np.ndarray  # [H, W] float32
    overlap: np.ndarray  # [H, W] uint16
    camera_index: np.ndarray  # [H, W] int64 node id or -1
    gsd: float = 0.0
    origin_xy: Tuple[float, float] = (0.0, 0.0)


def calculate_bounds(surfaces: Sequence[SurfaceModel]) -> Optional[OrthoBounds]:
    """reference ortho.cpp:283-342."""
    xs, ys, zs = [], [], []
    for s in surfaces:
        if s.mesh is not None and s.mesh.num_vertices > 0:
            v = s.mesh.vertices
            xs += [v[:, 0].min(), v[:, 0].max()]
            ys += [v[:, 1].min(), v[:, 1].max()]
            zs += list(v[np.isfinite(v[:, 2]), 2])
        elif s.cloud:
            pts = np.concatenate(s.cloud)
            xs += [pts[:, 0].min(), pts[:, 0].max()]
            ys += [pts[:, 1].min(), pts[:, 1].max()]
            zs += list(pts[:, 2])
    if not xs:
        return None
    return OrthoBounds(
        min(xs), max(xs), min(ys), max(ys),
        float(np.mean(zs)) if zs else 0.0,
    )


def calculate_gsd(
    graph: MeasurementGraph,
    model_store: Dict[int, CameraModel],
    involved_nodes: Sequence[int],
    mean_surface_z: float,
    thumbnail: bool,
) -> float:
    """reference ortho.cpp:344-377: angular resolution of the central
    pixel x average height above ground."""
    arc = 0.0
    mean_z = 0.0
    count = 0
    for nid in involved_nodes:
        node = graph.get_node(nid)
        model = model_store[node.payload.model_id]
        h = 1e-3
        p0 = np.asarray(image_from_3d(jnp.asarray([0.0, 0.0, 1.0]), model))
        p1 = np.asarray(image_from_3d(jnp.asarray([h, 0.0, 1.0]), model))
        arc_pixel = h / max(np.linalg.norm(p0 - p1), 1e-12)
        if thumbnail and node.payload.thumbnail is not None:
            tscale = node.payload.thumbnail.shape[0] / max(
                float(model.pixels_rows), 1.0
            )
            arc_pixel /= tscale
        arc = (arc * count + arc_pixel) / (count + 1)
        mean_z = (mean_z * count + node.payload.position[2]) / (count + 1)
        count += 1
    elevation = mean_z - mean_surface_z
    return max(abs(elevation * arc), 0.001)


def prepare_context(
    surfaces, graph, model_store, thumbnail: bool
) -> Optional[OrthoContext]:
    bounds = calculate_bounds(surfaces)
    if bounds is None:
        return None
    involved = [
        nid
        for nid, node in sorted(graph.nodes())
        if np.isfinite(np.asarray(node.payload.orientation)).all()
        and np.isfinite(np.asarray(node.payload.position)).all()
    ]
    if not involved:
        return None
    gsd = calculate_gsd(graph, model_store, involved, bounds.mean_surface_z, thumbnail)
    mean_cam_z = float(
        np.mean([graph.get_node(n).payload.position[2] for n in involved])
    )
    mesh = None
    for s in surfaces:
        if s.mesh is not None and s.mesh.num_vertices > 0:
            mesh = s.mesh
            break
    if mesh is None:
        return None
    return OrthoContext(
        bounds=bounds, gsd=gsd, involved_nodes=involved,
        mean_camera_z=mean_cam_z,
        average_camera_elevation=mean_cam_z - bounds.mean_surface_z,
        mesh=mesh,
    )


def _clamp_resolution(width, height, max_megapixels: float):
    if max_megapixels and max_megapixels > 0:
        mp = width * height / 1e6
        if mp > max_megapixels:
            scale = math.sqrt(max_megapixels / mp)
            return max(1, int(width * scale)), max(1, int(height * scale)), 1.0 / scale
    return width, height, 1.0


def _bilinear(img, ipx):
    """[H, W, C] image, [P, 2] positions -> [P, C] bilinear samples."""
    x0 = jnp.clip(jnp.floor(ipx[:, 0]).astype(jnp.int32), 0, img.shape[1] - 2)
    y0 = jnp.clip(jnp.floor(ipx[:, 1]).astype(jnp.int32), 0, img.shape[0] - 2)
    fx = jnp.clip(ipx[:, 0] - x0, 0.0, 1.0)[:, None]
    fy = jnp.clip(ipx[:, 1] - y0, 0.0, 1.0)[:, None]
    c00 = img[y0, x0]
    c01 = img[y0, x0 + 1]
    c10 = img[y0 + 1, x0]
    c11 = img[y0 + 1, x0 + 1]
    return (
        c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
        + c10 * (1 - fx) * fy + c11 * fx * fy
    )


@functools.partial(jax.jit, static_argnames=("taps",))
def _sample_cameras_kernel(
    points,  # [P, 3] world sample points
    cam_quats,  # [K, 4]
    cam_pos,  # [K, 3]
    models,  # batched CameraModel [K]
    images,  # [K, Hmax, Wmax, C] float32
    img_hw,  # [K, 2] actual sizes
    img_scale,  # [K] image px per model px (thumbnail scale)
    cam_valid,  # [K]
    avg_elevation,
    gsd,  # output ground sample distance (world units per output pixel)
    taps: int = 1,
):
    """Project P points into K cameras; sample colors + weights + geometry.

    With taps > 1, each output pixel's world footprint (gsd x gsd) is
    supersampled with a taps x taps grid mapped through the local
    world->pixel projection Jacobian — the TPU-native, fixed-cost
    equivalent of the reference's adaptive Jacobian-ellipse PatchSampler
    (reference ortho.cpp:69-222, jacobian :81-115): when the footprint
    spans many source pixels the taps spread anisotropically across them,
    when it is subpixel they collapse onto the bilinear neighborhood.

    Returns colors [K, P, C], weights [K, P] (0 where invalid), and
    geom [K, P, 4] = (normalized_radius, view_angle, normalized_x,
    normalized_y) per sample — the radiometric coordinates the
    color-balance model is parameterized in (reference ortho.cpp:1324-1418
    + radiometric_cost.hpp:21-200)."""
    # the image stack arrives uint8 Lab (half the upload/HBM of f16 at
    # identical values — 8-bit Lab is the working convention throughout);
    # sample in f16
    if images.dtype != jnp.float16:
        images = images.astype(jnp.float16)

    def per_cam(q, t, model, img, hw, scale, ok):
        rays = quat_rotate_inverse(q[None], points - t[None])  # [P, 3]
        in_front = rays[:, 2] > 0
        px = jax.vmap(lambda r: image_from_3d(r, model))(rays)  # [P, 2] model px
        ipx = px * scale
        h = hw[0].astype(px.dtype)
        w = hw[1].astype(px.dtype)
        inside = (
            (ipx[:, 0] > 0) & (ipx[:, 0] < w - 1)
            & (ipx[:, 1] > 0) & (ipx[:, 1] < h - 1)
        )
        if taps <= 1:
            color = _bilinear(img, ipx)
        else:
            def proj_at(offset, point):
                p = point.at[:2].add(offset)
                return image_from_3d(quat_rotate_inverse(q, p - t), model)

            J = jax.vmap(
                lambda p: jax.jacfwd(proj_at)(jnp.zeros(2, points.dtype), p)
            )(points)  # [P, 2, 2] d(model px)/d(world xy)
            u = (jnp.arange(taps, dtype=points.dtype) + 0.5) / taps - 0.5
            uu, vv = jnp.meshgrid(u, u)
            offs = jnp.stack([uu.ravel(), vv.ravel()], axis=1) * gsd  # [T, 2]
            tap_px = px[:, None, :] + jnp.einsum("pij,tj->pti", J, offs)
            tap_colors = jax.vmap(
                lambda tp: _bilinear(img, tp), in_axes=1, out_axes=0
            )(tap_px * scale)  # [T, P, C]
            color = jnp.mean(tap_colors, axis=0)
        horiz = jnp.linalg.norm(points[:, :2] - t[None, :2], axis=1)
        wgt = compute_blend_weight(
            ipx[:, 0], ipx[:, 1], w, h, horiz / jnp.maximum(avg_elevation, 1e-6)
        )
        wgt = jnp.where(in_front & inside & ok, wgt, 0.0)
        pr = px - model.principal_point
        half_diag = 0.5 * jnp.sqrt(model.pixels_cols**2 + model.pixels_rows**2)
        radius = jnp.linalg.norm(pr, axis=1) / jnp.maximum(half_diag, 1e-6)
        angle = jnp.arctan2(jnp.linalg.norm(rays[:, :2], axis=1), rays[:, 2])
        nx = pr[:, 0] / jnp.maximum(model.pixels_cols, 1.0)
        ny = pr[:, 1] / jnp.maximum(model.pixels_rows, 1.0)
        geom = jnp.stack([radius, angle, nx, ny], axis=1)
        return color, wgt, geom

    colors, weights, geom = jax.vmap(per_cam)(
        cam_quats, cam_pos, models, images, img_hw, img_scale, cam_valid
    )
    return colors, weights, geom


@functools.partial(jax.jit, static_argnames=("taps", "kmax"))
def _sample_select_kernel(
    points, cam_quats, cam_pos, models, images, img_hw, img_scale,
    cam_valid, avg_elevation, gsd, taps: int = 1, kmax: int = 5,
):
    """Sample + per-pixel top-kmax layer selection fused on device.

    `images` is the [K, Hmax, Wmax, C] float16 stack assembled from the
    device-resident image cache — the pixels never leave the device
    between upload and sampling, and only the selected kmax layers
    (float16) are pulled by the caller, so per-tile host<->device traffic
    is O(kmax * tile_pixels) instead of O(K * image_pixels). The top-k
    itself matches the reference's per-pixel closest-5 selection
    (reference ortho.cpp:1206-1300)."""
    colors, weights, geom = _sample_cameras_kernel(
        points, cam_quats, cam_pos, models, images, img_hw, img_scale,
        cam_valid, avg_elevation, gsd, taps=taps,
    )
    wT, selT = jax.lax.top_k(weights.T, kmax)  # [P, kmax]
    sel = selT.T.astype(jnp.int32)  # [kmax, P]
    lcolors = jnp.take_along_axis(colors, sel[..., None], axis=0)
    lgeom = jnp.take_along_axis(geom, sel[..., None], axis=0)
    return (
        lcolors.astype(jnp.float16),
        wT.T.astype(jnp.float16),
        lgeom.astype(jnp.float16),
        # uint8 quarters the selection map's share of the per-tile
        # device->host pull (guarded: huge-survey tiles can exceed 255
        # candidates)
        sel.astype(jnp.uint8) if weights.shape[0] <= 255 else sel,
    )


@functools.partial(jax.jit, static_argnames=("ts", "levels"))
def _correct_blend_kernel(
    colors, weights, geom, cam, off, brdf, slope, vig, transition, ts, levels
):
    """BLEND_LAYERS device chain fused into ONE program: radiometric
    correction (offsets + vignetting + BRDF + slope, reference
    ortho.cpp:1839-1875) -> sigmoid transition weights -> pull-push hole
    fill -> Laplacian blend. One dispatch + one pull per tile instead of
    three awaited round-trips (the per-tile RTT through a remote device
    link dominated the blend pass)."""
    from opencalibration_tpu.ortho.blending import (
        laplacian_blend,
        pull_push_fill,
    )

    colors = colors.astype(jnp.float32)
    raw = weights.astype(jnp.float32)
    geom = geom.astype(jnp.float32)
    r2 = geom[..., 0] ** 2
    theta = geom[..., 1]
    colors = colors - off[cam]
    v = vig[cam]
    corr = (
        v[..., 0] * r2 + v[..., 1] * r2**2 + v[..., 2] * r2**3
        + brdf[cam] * theta * theta
        + slope[cam][..., 0] * geom[..., 2]
        + slope[cam][..., 1] * geom[..., 3]
    )
    colors = colors.at[..., 0].add(-corr)
    trans = jax.nn.sigmoid(
        (raw - raw[0:1]) / jnp.maximum(transition, 1e-6) * 6.0
    )
    w = raw * trans
    K = colors.shape[0]
    colors = colors.reshape(K, ts, ts, 3)
    w4 = w.reshape(K, ts, ts, 1)
    filled = pull_push_fill(colors, w4)
    blended = laplacian_blend(filled, w4, levels=levels)
    alpha = raw.reshape(K, ts, ts).max(axis=0) > 0
    return jnp.clip(blended, 0, 255).astype(jnp.uint8), alpha


@functools.partial(jax.jit, static_argnames=("stride", "s_max"))
def _corr_sample_kernel(
    lcolors, lweights, lgeom, sel, cam_ids, valid_z, stride: int, s_max: int
):
    """Device-side strided color-correspondence sampling.

    Picks every ``stride``-th pixel where the two strongest layers
    overlap — the exact sample set the host-side collector chose from the
    pulled layer stack (reference ortho.cpp:1324-1418) — and scatters
    each sample's (camera pair, Lab pair, radiometric geometry pair) into
    a fixed ``s_max``-slot output. Pass 1 then pulls ~50 KB per tile
    instead of the full ~5 MB layer stack."""
    w = lweights.astype(jnp.float32) * valid_z[None].astype(jnp.float32)
    both = (w[0] > 0) & (w[1] > 0)  # [P]
    cnt = jnp.cumsum(both.astype(jnp.int32))
    take = both & (((cnt - 1) % stride) == 0)
    # each taken pixel owns a unique slot; everything else targets the
    # dropped overflow slot s_max
    slot = jnp.where(take, jnp.minimum((cnt - 1) // stride, s_max), s_max)
    cam = cam_ids[sel.astype(jnp.int32)]  # [kmax, P] node-list indices

    def gather(x):
        out = jnp.zeros((s_max + 1,) + x.shape[1:], x.dtype)
        return out.at[slot].set(x)[:s_max]

    lab = lcolors.astype(jnp.float32)
    geo = lgeom.astype(jnp.float32)
    return dict(
        cam_a=gather(cam[0]), cam_b=gather(cam[1]),
        lab_a=gather(lab[0]), lab_b=gather(lab[1]),
        geom_a=gather(geo[0]), geom_b=gather(geo[1]),
        valid=gather(take),
    )


@functools.partial(jax.jit, static_argnames=("ts", "levels"))
def _render_blend_kernel(
    lcolors, lweights, lgeom, sel, cam_ids, valid_z,
    off, brdf, slope, vig, transition, ts: int, levels: int,
):
    """Adapter fusing a freshly rendered layer stack (still on device)
    into the correction+transition+fill+blend chain: maps selection slots
    to node-list camera indices and applies the mesh-validity mask, so
    BLEND_LAYERS needs no host-side layer store at all. Also returns the
    strongest layer's camera index per pixel for the camera-id raster."""
    cam = cam_ids[sel.astype(jnp.int32)]
    w = lweights * valid_z[None].astype(lweights.dtype)
    lab8, alpha = _correct_blend_kernel(
        lcolors, w, lgeom, cam, off, brdf, slope, vig, transition,
        ts=ts, levels=levels,
    )
    return lab8, alpha, cam[0]


@jax.jit
def _corner_world_rays(corner_px, quats, models):
    """[N, 4, 2] image-corner pixels -> [N, 4, 3] world ray directions."""

    def per_cam(px4, q, m):
        rays = jax.vmap(lambda p: image_to_3d(p, m))(px4)
        return quat_rotate(jnp.broadcast_to(q, (4, 4)), rays)

    return jax.vmap(per_cam)(corner_px, quats, models)


def camera_ground_footprints(
    quats, poss, models_list, ground_z: float, max_reach_factor: float = 4.0
):
    """Each camera's ground-footprint bounding box [N, 4] =
    (min_x, max_x, min_y, max_y): the image corners projected onto the
    z = ground_z plane, reach clamped to max_reach_factor x elevation for
    grazing rays, camera nadir always included (the geometric version of
    the reference's findTileCameras tile/camera assignment,
    reference ortho.cpp:1104-1160)."""
    N = len(models_list)
    corner_px = np.zeros((N, 4, 2), np.float32)
    for i, m in enumerate(models_list):
        w = float(m.pixels_cols)
        h = float(m.pixels_rows)
        corner_px[i] = [[0, 0], [w, 0], [0, h], [w, h]]
    rays = np.asarray(
        _corner_world_rays(
            jnp.asarray(corner_px),
            jnp.asarray(np.asarray(quats), jnp.float32),
            stack_cameras([m.astype(jnp.float32) for m in models_list]),
        )
    )  # [N, 4, 3]
    out = np.zeros((N, 4))
    for i in range(N):
        t = np.asarray(poss[i], np.float64)
        elev = max(t[2] - ground_z, 1.0)
        reach = max_reach_factor * elev
        pts = [t[:2]]
        for r in rays[i]:
            rz = r[2]
            if not np.isfinite(r).all():
                continue
            if rz < -1e-6:
                s = min((ground_z - t[2]) / rz, reach / max(np.linalg.norm(r), 1e-9))
            else:
                # horizontal/up ray: clamp to max reach along its xy heading
                s = reach / max(np.linalg.norm(r[:2]), 1e-9)
            pts.append(t[:2] + s * r[:2])
        pts = np.stack(pts)
        out[i] = [pts[:, 0].min(), pts[:, 0].max(), pts[:, 1].min(), pts[:, 1].max()]
    return out


@jax.jit
def _sample_knn_kernel(
    points,  # [P, 3] world sample points
    knn,  # [P, K] per-pixel candidate camera indices (into the stacks)
    cam_quats,  # [N, 4]
    cam_pos,  # [N, 3]
    models,  # batched CameraModel [N]
    images,  # [N, Hmax, Wmax, C]
    img_hw,  # [N, 2]
    img_scale,  # [N]
    avg_elevation,
):
    """Gather-then-sample: each pixel projects into ONLY its K candidate
    cameras (per-pixel dynamic gathers of pose/model/texels), so memory
    and compute are O(P*K) — independent of the camera count N. The
    all-cameras variant materialized [N, P, 3] (~48 GB at 1k images x
    4 MP); the reference is per-pixel best-of-5-NN too
    (reference ortho.cpp:474-653). Returns colors [P, K, C], weights
    [P, K] (0 where the candidate does not see the pixel)."""

    def per_pixel(point, cams):
        def per_slot(ci):
            q = cam_quats[ci]
            t = cam_pos[ci]
            model = take_camera(models, ci)
            ray = quat_rotate_inverse(q, point - t)
            px = image_from_3d(ray, model)
            ipx = px * img_scale[ci]
            h = img_hw[ci, 0].astype(px.dtype)
            w = img_hw[ci, 1].astype(px.dtype)
            ok = (
                (ray[2] > 0)
                & jnp.all(jnp.isfinite(ipx))
                & (ipx[0] > 0) & (ipx[0] < w - 1)
                & (ipx[1] > 0) & (ipx[1] < h - 1)
            )
            sx = jnp.where(ok, ipx[0], 0.0)
            sy = jnp.where(ok, ipx[1], 0.0)
            x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, images.shape[2] - 2)
            y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, images.shape[1] - 2)
            fx = jnp.clip(sx - x0, 0.0, 1.0)
            fy = jnp.clip(sy - y0, 0.0, 1.0)
            c00 = images[ci, y0, x0]
            c01 = images[ci, y0, x0 + 1]
            c10 = images[ci, y0 + 1, x0]
            c11 = images[ci, y0 + 1, x0 + 1]
            color = (
                c00 * (1 - fx) * (1 - fy) + c01 * fx * (1 - fy)
                + c10 * (1 - fx) * fy + c11 * fx * fy
            )
            horiz = jnp.linalg.norm(point[:2] - t[:2])
            wgt = compute_blend_weight(
                sx[None], sy[None], w, h,
                (horiz / jnp.maximum(avg_elevation, 1e-6))[None],
            )[0]
            return color, jnp.where(ok, wgt, 0.0)

        return jax.vmap(per_slot)(cams)

    return jax.vmap(per_pixel)(points, knn)


_KNN_PIXEL_CHUNK = 1 << 18  # pixels per device dispatch (bounds memory)


def _sample_knn_chunked(
    points, knn, cam_quats, cam_pos, models, thumbs, thumb_hw, scales,
    avg_elevation,
):
    """Host loop over fixed-size pixel chunks (one compiled shape)."""
    P, K = knn.shape
    colors = np.zeros((P, K, 3), np.float32)
    weights = np.zeros((P, K), np.float32)
    models_d = models
    thumbs_d = jnp.asarray(thumbs)
    for s0 in range(0, P, _KNN_PIXEL_CHUNK):
        s1 = min(s0 + _KNN_PIXEL_CHUNK, P)
        n = s1 - s0
        pad = (_KNN_PIXEL_CHUNK - n) if P > _KNN_PIXEL_CHUNK else 0
        pts = np.concatenate([points[s0:s1], np.zeros((pad, 3), points.dtype)])
        kn = np.concatenate([knn[s0:s1], np.zeros((pad, K), knn.dtype)])
        c, w = _sample_knn_kernel(
            jnp.asarray(pts, jnp.float32), jnp.asarray(kn, jnp.int32),
            jnp.asarray(cam_quats, jnp.float32),
            jnp.asarray(cam_pos, jnp.float32),
            models_d, thumbs_d, jnp.asarray(thumb_hw),
            jnp.asarray(scales, jnp.float32),
            jnp.asarray(avg_elevation, jnp.float32),
        )
        colors[s0:s1] = np.asarray(c)[:n]
        weights[s0:s1] = np.asarray(w)[:n]
    return colors, weights


def _stack_thumbnails(graph, nodes):
    """Pad thumbnails to a common size; Lab uint8 -> float32."""
    thumbs = []
    hw = []
    for nid in nodes:
        t = graph.get_node(nid).payload.thumbnail
        if t is None:
            t = np.zeros((2, 2, 3), np.uint8)
        thumbs.append(t.astype(np.float32))
        hw.append(t.shape[:2])
    H = max(t.shape[0] for t in thumbs)
    W = max(t.shape[1] for t in thumbs)
    out = np.zeros((len(thumbs), H, W, 3), np.float32)
    for i, t in enumerate(thumbs):
        out[i, : t.shape[0], : t.shape[1]] = t
    return out, np.asarray(hw, np.int32)


def generate_orthomosaic(
    surfaces, graph, model_store, max_megapixels: float = 4.0
) -> Optional[OrthoMosaic]:
    """Thumbnail orthomosaic (reference generateOrthomosaic,
    ortho.cpp:474-653): best-weight thumbnail pixel per output pixel,
    plus DSM / overlap / camera-index rasters."""
    ctx = prepare_context(surfaces, graph, model_store, thumbnail=True)
    if ctx is None:
        return None
    b = ctx.bounds
    width = max(int((b.max_x - b.min_x) / ctx.gsd), 1)
    height = max(int((b.max_y - b.min_y) / ctx.gsd), 1)
    if not np.isfinite(width) or width < 1:
        width = 100
    if not np.isfinite(height) or height < 1:
        height = 100
    width, height, gsd_scale = _clamp_resolution(width, height, max_megapixels)
    gsd = ctx.gsd * gsd_scale

    xs = b.min_x + gsd * np.arange(width)
    ys = b.max_y - gsd * np.arange(height)
    gx, gy = np.meshgrid(xs, ys)  # [H, W]
    flat_xy = np.stack([gx.ravel(), gy.ravel()], axis=1)
    z = ctx.mesh.interpolate_z(flat_xy)  # [P]
    valid_z = np.isfinite(z)
    points = np.concatenate([flat_xy, np.where(valid_z, z, 0.0)[:, None]], axis=1)

    nodes = ctx.involved_nodes
    import scipy.spatial

    cam_xy = np.stack(
        [np.asarray(graph.get_node(n).payload.position[:2]) for n in nodes]
    )
    tree = scipy.spatial.cKDTree(cam_xy)
    K = min(MAX_CAMERAS_PER_PIXEL, len(nodes))
    _, knn = tree.query(flat_xy, k=K)
    knn = np.atleast_2d(knn.T).T.reshape(len(flat_xy), K)

    thumbs, thumb_hw = _stack_thumbnails(graph, nodes)
    scales = np.asarray(
        [
            thumb_hw[i][0] / max(float(model_store[graph.get_node(n).payload.model_id].pixels_rows), 1.0)
            for i, n in enumerate(nodes)
        ],
        np.float32,
    )
    quats = np.stack([np.asarray(graph.get_node(n).payload.orientation) for n in nodes])
    poss = np.stack([np.asarray(graph.get_node(n).payload.position) for n in nodes])
    models = stack_cameras(
        [model_store[graph.get_node(n).payload.model_id].astype(jnp.float32) for n in nodes]
    )

    # per-pixel 5-NN gather-then-sample: cost O(P*K), never O(P*N)
    # (reference per-pixel best-of-5NN, ortho.cpp:474-653)
    colors, knn_w = _sample_knn_chunked(
        points.astype(np.float32), knn.astype(np.int32),
        quats, poss, models, thumbs, thumb_hw, scales,
        ctx.average_camera_elevation,
    )  # [P, K, 3], [P, K]

    P = len(flat_xy)
    overlap = (knn_w > 0).sum(axis=1).astype(np.uint16)
    best_k = np.argmax(knn_w, axis=1)
    best_cam = knn[np.arange(P), best_k]
    best_w = knn_w[np.arange(P), best_k]
    got = (best_w > 0) & valid_z

    rgba = np.zeros((P, 4), np.uint8)
    lab = colors[np.arange(P), best_k]  # [P, 3] Lab
    import cv2

    bgr = cv2.cvtColor(
        np.clip(lab, 0, 255).astype(np.uint8).reshape(1, P, 3), cv2.COLOR_Lab2BGR
    ).reshape(P, 3)
    rgba[:, :3] = bgr
    rgba[:, 3] = np.where(got, 255, 0)
    # background checkerboard (reference ortho.cpp:620-626)
    rows = np.arange(P) // width
    cols = np.arange(P) % width
    grey = np.where((rows + cols) % 2 == 0, 64, 128).astype(np.uint8)
    for c in range(3):
        rgba[:, c] = np.where(got, rgba[:, c], grey)

    cam_ids = np.asarray(nodes)[best_cam]
    camera_index = np.where(got, cam_ids, -1)

    return OrthoMosaic(
        rgba=rgba.reshape(height, width, 4),
        dsm=np.where(valid_z, z, np.nan).reshape(height, width).astype(np.float32),
        overlap=overlap.reshape(height, width),
        camera_index=camera_index.reshape(height, width),
        gsd=gsd,
        origin_xy=(b.min_x, b.max_y),
    )


def generate_dsm_geotiff(
    path: str, surfaces, graph, model_store, geocoord=None,
    max_megapixels: float = 16.0,
) -> bool:
    """Float32 DSM GeoTIFF (reference generateDSMGeoTIFF, ortho.cpp:745-963)."""
    ctx = prepare_context(surfaces, graph, model_store, thumbnail=False)
    if ctx is None:
        return False
    b = ctx.bounds
    width = max(int((b.max_x - b.min_x) / ctx.gsd), 1)
    height = max(int((b.max_y - b.min_y) / ctx.gsd), 1)
    width, height, gsd_scale = _clamp_resolution(width, height, max_megapixels)
    gsd = ctx.gsd * gsd_scale
    xs = b.min_x + gsd * np.arange(width)
    ys = b.max_y - gsd * np.arange(height)
    gx, gy = np.meshgrid(xs, ys)
    z = ctx.mesh.interpolate_z(np.stack([gx.ravel(), gy.ravel()], axis=1))
    dsm = z.reshape(height, width).astype(np.float32)
    nodata = -32767.0
    dsm = np.where(np.isfinite(dsm), dsm, nodata)
    from opencalibration_tpu.io.geotiff import write_geotiff

    wkt = geocoord.get_wkt() if geocoord is not None and geocoord.is_initialized() else None
    write_geotiff(path, dsm, (b.min_x, b.max_y), (gsd, gsd), wkt=wkt, nodata=nodata, overviews=3)
    return True


class OrthoJob:
    """Full-resolution orthomosaic render job, split into the pipeline's
    GENERATE_LAYERS / COLOR_BALANCE / BLEND_LAYERS phases
    (reference generateLayeredGeoTIFF + solveColorBalance +
    blendLayeredGeoTIFF, ortho.cpp:966-2050).

    GENERATE_LAYERS renders each tile: per-pixel top-5 cameras chosen by
    blend weight from the full tile candidate set (reference picks the
    per-pixel closest-5 from the tile candidates, ortho.cpp:1206-1300),
    with anisotropic footprint sampling and real per-sample radiometric
    geometry. Where the reference materializes the layer stacks as a
    layered GeoTIFF on disk (ortho.cpp:966-1460) and re-reads them to
    blend, this build RECOMPUTES them: pass 1 pulls only the strided
    color-balance correspondence samples (~50 KB/tile instead of the
    ~5 MB/tile full stack), and BLEND_LAYERS re-renders each tile on
    device, feeding the layers straight into the fused correction +
    transition + fill + Laplacian-blend kernel — the pixels never cross
    the host link at all. On TPU the second render is cheaper than one
    layer-stack round trip (measured 1,300 s of a 1k-survey GENERATE_LAYERS
    was layer pulls), and no layer store means per-tile memory at ANY
    survey size. The blended tiles stream straight into a tiled GeoTIFF
    (plus an optional uint64 camera-id sidecar raster).

    Usage: job = OrthoJob(...); job.pass_layers(); job.solve_balance();
    job.pass_blend(path) — or generate_ortho_geotiff() for all at once.
    """

    def __init__(
        self,
        surfaces,
        graph,
        model_store,
        geocoord=None,
        max_megapixels: float = 64.0,
        tile_size: int = DEFAULT_TILE,
        cache_images: int = 16,
        blend_levels: int = 4,
        taps: int = 3,
        blend_transition: float = 0.05,
    ):
        self.ok = False
        self.correspondences: List[ColorCorrespondence] = []
        self.balance = None
        # optional per-tile progress hook: called with dict(tile_x, tile_y,
        # num_tiles_x, num_tiles_y, fraction_done, png_base64) during the
        # blend pass (reference TileUpdate, progress.hpp:15-34)
        self.tile_callback = None
        self.taps = taps
        self.blend_transition = blend_transition
        self._setup(surfaces, graph, model_store, geocoord, max_megapixels,
                    tile_size, cache_images, blend_levels)

    def _setup(self, surfaces, graph, model_store, geocoord, max_megapixels,
               tile_size, cache_images, blend_levels):
        self.graph = graph
        self.model_store = model_store
        self.geocoord = geocoord
        self.blend_levels = blend_levels
        self.tile_size = tile_size
        ctx = prepare_context(surfaces, graph, model_store, thumbnail=False)
        if ctx is None:
            return
        self._ctx = ctx
        b = ctx.bounds
        width = max(int((b.max_x - b.min_x) / ctx.gsd), 1)
        height = max(int((b.max_y - b.min_y) / ctx.gsd), 1)
        width, height, gsd_scale = _clamp_resolution(width, height, max_megapixels)
        gsd = ctx.gsd * gsd_scale

        nodes = ctx.involved_nodes
        import scipy.spatial

        cam_xy = np.stack(
            [np.asarray(graph.get_node(n).payload.position[:2]) for n in nodes]
        )
        tree = scipy.spatial.cKDTree(cam_xy)

        tiles_x = (width + tile_size - 1) // tile_size
        tiles_y = (height + tile_size - 1) // tile_size

        # per-tile candidate cameras selected by GEOMETRY: a camera joins a
        # tile when its projected ground footprint intersects the tile
        # rectangle (findTileCameras, reference ortho.cpp:1104-1160) — a
        # center-distance query would drop a camera that only clips a tile
        # corner when tile extent ~ camera spacing. The per-pixel kernel
        # still keeps only the top-MAX_CAMERAS_PER_PIXEL by weight.
        quats_all = np.stack(
            [np.asarray(graph.get_node(n).payload.orientation) for n in nodes]
        )
        poss_all = np.stack(
            [np.asarray(graph.get_node(n).payload.position) for n in nodes]
        )
        fp = camera_ground_footprints(
            quats_all, poss_all,
            [
                model_store[graph.get_node(n).payload.model_id]
                for n in nodes
            ],
            b.mean_surface_z,
        )  # [N, 4] min_x, max_x, min_y, max_y
        k_base = min(MAX_CAMERAS_PER_PIXEL + 3, len(nodes))
        tile_cams: Dict[int, set] = {}
        margin = gsd
        for ty in range(tiles_y):
            ty_max = b.max_y - gsd * ty * tile_size + margin
            ty_min = b.max_y - gsd * (ty + 1) * tile_size - margin
            for tx in range(tiles_x):
                tx_min = b.min_x + gsd * tx * tile_size - margin
                tx_max = b.min_x + gsd * (tx + 1) * tile_size + margin
                hit = np.flatnonzero(
                    (fp[:, 0] <= tx_max) & (fp[:, 1] >= tx_min)
                    & (fp[:, 2] <= ty_max) & (fp[:, 3] >= ty_min)
                )
                sel = {int(i) for i in hit}
                if len(sel) < k_base:
                    # sparse coverage fallback: nearest cameras by center
                    cx = 0.5 * (tx_min + tx_max)
                    cy = 0.5 * (ty_min + ty_max)
                    _, nn = tree.query([cx, cy], k=k_base)
                    sel |= {int(i) for i in np.atleast_1d(nn)}
                tile_cams[ty * tiles_x + tx] = sel

        # fixed kernel width: bucket the largest per-tile candidate count
        # so one compile serves every tile (padded slots carry weight 0)
        kc_needed = max(len(s) for s in tile_cams.values())
        self._kc = min(len(nodes), _next_pow2(max(kc_needed, k_base)))
        # keep each tile's strongest kc candidates (closest footprint
        # centers) when a tile sees more cameras than the kernel width
        if kc_needed > self._kc:
            fp_cx = 0.5 * (fp[:, 0] + fp[:, 1])
            fp_cy = 0.5 * (fp[:, 2] + fp[:, 3])
            for idx, sel in tile_cams.items():
                if len(sel) <= self._kc:
                    continue
                ty, tx = divmod(idx, tiles_x)
                cx = b.min_x + gsd * (tx + 0.5) * tile_size
                cy = b.max_y - gsd * (ty + 0.5) * tile_size
                arr = np.asarray(sorted(sel))
                d = np.hypot(fp_cx[arr] - cx, fp_cy[arr] - cy)
                tile_cams[idx] = {int(i) for i in arr[np.argsort(d)[: self._kc]]}
        self._tile_cams = tile_cams
        self._order = compute_cache_aware_tile_order(
            tile_cams, tiles_x, tiles_y, cache_images
        )
        self._cache = FullResolutionImageCache(max_images=max(cache_images, self._kc))
        # device-resident image cache: each full-res Lab image is uploaded
        # ONCE as float16 (lossless for uint8-sourced Lab) and stacked
        # on-device per tile — without it every tile re-ships its whole
        # candidate stack host->device (measured: the GENERATE_LAYERS wall)
        import collections

        self._dev_cache = collections.OrderedDict()  # cam idx -> (dev, (h, w))
        self._dev_cache_max = max(2 * self._kc, cache_images, 8)
        hm = wm = 0
        for n in nodes:
            m = model_store.get(graph.get_node(n).payload.model_id)
            if m is not None:
                hm = max(hm, int(np.asarray(m.pixels_rows)))
                wm = max(wm, int(np.asarray(m.pixels_cols)))
        self._img_hm, self._img_wm = hm, wm
        self._quats_all = quats_all
        self._poss_all = poss_all
        self._nodes = nodes
        self._bounds = b
        self._gsd = gsd
        self._width = width
        self._height = height
        self._tiles_x = tiles_x
        self._tiles_y = tiles_y
        self.ok = True

    # -- pass 1: project + layer selection --------------------------------

    def _load_lab_u8(self, idx):
        import cv2

        node = self.graph.get_node(self._nodes[idx])
        img = self._cache.get(node.payload.path)
        if img is None:
            return None
        # 8-bit Lab IS the working convention end to end (the float path
        # casts this same uint8 Lab to float), so uint8 on device is
        # value-exact at half the f16 upload/HBM footprint
        return cv2.cvtColor(img, cv2.COLOR_BGR2Lab)

    def _device_image(self, idx):
        """Device-resident uint8 Lab image, padded to the job-global
        (Hmax, Wmax); returns (device_array, (h, w)) or None. LRU-bounded
        by an HBM byte budget (OC_TPU_ORTHO_CACHE_MB, default 1024) —
        dense surveys (10k images) assign dozens of candidate cameras per
        tile, and a 16-entry cache would re-upload nearly every image for
        every tile."""
        ent = self._dev_cache.get(idx)
        if ent is not None:
            self._dev_cache.move_to_end(idx)
            return ent
        lab = self._load_lab_u8(idx)
        if lab is None:
            return None
        h, w = lab.shape[:2]
        if self._img_hm <= 0 or self._img_wm <= 0:
            self._img_hm, self._img_wm = h, w
            budget = float(os.environ.get("OC_TPU_ORTHO_CACHE_MB", "1024"))
            per_img = self._img_hm * self._img_wm * 3
            self._dev_cache_max = max(
                self._dev_cache_max, int(budget * 1e6 // max(per_img, 1))
            )
        hm, wm = self._img_hm, self._img_wm
        buf = np.zeros((hm, wm, 3), np.uint8)
        buf[: min(h, hm), : min(w, wm)] = lab[:hm, :wm]
        ent = (jax.device_put(buf), (min(h, hm), min(w, wm)))
        self._dev_cache[idx] = ent
        while len(self._dev_cache) > self._dev_cache_max:
            self._dev_cache.popitem(last=False)
        return ent

    def _tile_paths(self, idx: int) -> List[str]:
        return [
            self.graph.get_node(self._nodes[ci]).payload.path
            for ci in sorted(self._tile_cams[idx])
        ]

    def _project_tile(self, tx: int, ty: int) -> Optional[dict]:
        disp = self._project_tile_dispatch(tx, ty)
        return self._project_tile_finish(disp)

    def _project_tile_dispatch(self, tx: int, ty: int) -> Optional[dict]:
        """Render one tile's layer stack: per-pixel top-KMAX cameras.

        The world grid always spans a full tile (static shapes, one XLA
        compile); edge tiles are cropped at write time. Dispatch/finish
        are split so the caller can enqueue tile N+1's kernel before
        pulling tile N's results (one-deep pipeline: the device link's
        round-trip hides behind the next tile's compute)."""
        ts = self.tile_size
        b = self._bounds
        gsd = self._gsd
        graph, model_store, nodes = self.graph, self.model_store, self._nodes
        x0, y0 = tx * ts, ty * ts
        xs = b.min_x + gsd * (x0 + np.arange(ts))
        ys = b.max_y - gsd * (y0 + np.arange(ts))
        gx, gy = np.meshgrid(xs, ys)
        flat_xy = np.stack([gx.ravel(), gy.ravel()], axis=1)
        z = self._ctx.mesh.interpolate_z(flat_xy)
        valid_z = np.isfinite(z)
        points = np.concatenate(
            [flat_xy, np.where(valid_z, z, 0.0)[:, None]], axis=1
        )

        cams = sorted(self._tile_cams[ty * self._tiles_x + tx])
        devs, hws, idxs = [], [], []
        for ci in cams:
            ent = self._device_image(ci)
            if ent is None:
                continue
            devs.append(ent[0])
            hws.append(ent[1])
            idxs.append(ci)
        if not devs:
            return None
        # pad the candidate set to the fixed KC so the kernel compiles once
        kc = self._kc
        while len(devs) < kc:
            devs.append(devs[0])
            hws.append((0, 0))
            idxs.append(idxs[0])
        valid_mask = np.asarray([h[0] > 0 for h in hws], bool)
        # device-side stack of the cached images: no pixel re-upload,
        # fixed (Hmax, Wmax) shape so ONE kernel compile serves every tile
        stack = jnp.stack(devs)
        models = stack_cameras(
            [
                model_store[graph.get_node(nodes[i]).payload.model_id].astype(jnp.float32)
                for i in idxs
            ]
        )
        scales = np.asarray(
            [
                hws[i][0]
                / max(float(model_store[graph.get_node(nodes[idxs[i]]).payload.model_id].pixels_rows), 1.0)
                for i in range(kc)
            ],
            np.float32,
        )
        kmax = min(MAX_CAMERAS_PER_PIXEL, kc)
        dev = _sample_select_kernel(
            jnp.asarray(points, jnp.float32),
            jnp.asarray(self._quats_all[idxs], jnp.float32),
            jnp.asarray(self._poss_all[idxs], jnp.float32),
            models,
            stack,
            jnp.asarray(np.asarray(hws, np.int32)),
            jnp.asarray(scales),
            jnp.asarray(valid_mask),
            jnp.asarray(self._ctx.average_camera_elevation, jnp.float32),
            jnp.asarray(gsd, jnp.float32),
            taps=self.taps,
            kmax=kmax,
        )
        return dict(dev=dev, idxs=idxs, valid_z=valid_z, z=z)

    def _project_tile_finish(self, disp: Optional[dict]) -> Optional[dict]:
        if disp is None:
            return None
        lcolors, lweights, lgeom, sel = jax.device_get(disp["dev"])
        valid_z = disp["valid_z"]
        z = disp["z"]
        lweights = lweights * valid_z[None].astype(np.float16)
        # node-list index per sample
        lcam = np.asarray(disp["idxs"], np.int32)[sel]
        return dict(
            colors=lcolors,
            weights=lweights,
            geom=lgeom,
            cam=lcam,
            z=np.where(valid_z, z, np.nan).astype(np.float32),
        )

    def _corr_dispatch(self, disp: Optional[dict]):
        """Enqueue the device-side correspondence sampler on a freshly
        rendered tile; returns a device dict or None."""
        if disp is None:
            return None
        lcolors, lweights, lgeom, sel = disp["dev"]
        if lweights.shape[0] < 2:
            return None
        s_max = self.tile_size * self.tile_size // CORR_STRIDE + 1
        out = _corr_sample_kernel(
            lcolors, lweights, lgeom, sel,
            jnp.asarray(np.asarray(disp["idxs"], np.int32)),
            jnp.asarray(disp["valid_z"]),
            stride=CORR_STRIDE, s_max=s_max,
        )
        return out

    def pass_layers(self):
        """GENERATE_LAYERS: render every tile on device and pull only its
        strided Lab correspondence samples (with real radiometric
        geometry) for the color-balance solve — the layer stacks stay on
        device and are recomputed by the blend pass."""
        if not self.ok:
            return False
        from opencalibration_tpu.utils.performance import PerformanceMeasure

        self.correspondences = []
        import concurrent.futures

        pool = concurrent.futures.ThreadPoolExecutor(max_workers=2)

        def _finish(corr_dev):
            if corr_dev is None:
                return
            with PerformanceMeasure("ortho: correspondences"):
                out = jax.device_get(corr_dev)
                self._append_correspondences(out)

        # one-deep pipeline: tile N+1's kernels are enqueued on the device
        # before tile N's samples are pulled, so the pull's link RTT
        # overlaps the next tile's device compute
        pending = None
        try:
            for i, (tx, ty) in enumerate(self._order):
                if i + 1 < len(self._order):
                    nx_, ny_ = self._order[i + 1]
                    self._cache.prefetch(
                        self._tile_paths(ny_ * self._tiles_x + nx_), pool=pool
                    )
                with PerformanceMeasure("ortho: project tile"):
                    disp = self._project_tile_dispatch(tx, ty)
                    corr_dev = self._corr_dispatch(disp)
                if pending is not None:
                    _finish(pending)
                pending = corr_dev
            if pending is not None:
                _finish(pending)
        finally:
            pool.shutdown(wait=False)
        return True

    def _append_correspondences(self, out: dict):
        """Append one tile's pulled correspondence samples (reference
        ortho.cpp:1324-1418 collects the same every-stride-th overlap
        sample, here chosen and gathered on device)."""
        valid = np.asarray(out["valid"], bool)
        rows = np.flatnonzero(valid)
        if len(rows) == 0:
            return
        graph, nodes = self.graph, self._nodes
        cam_a, cam_b = out["cam_a"], out["cam_b"]
        lab_a, lab_b = out["lab_a"], out["lab_b"]
        geom_a, geom_b = out["geom_a"], out["geom_b"]
        for p in rows:
            ia, ib = int(cam_a[p]), int(cam_b[p])
            ga, gb = geom_a[p], geom_b[p]
            self.correspondences.append(
                ColorCorrespondence(
                    camera_id_a=nodes[ia], camera_id_b=nodes[ib],
                    model_id_a=graph.get_node(nodes[ia]).payload.model_id,
                    model_id_b=graph.get_node(nodes[ib]).payload.model_id,
                    lab_a=lab_a[p], lab_b=lab_b[p],
                    normalized_radius_a=float(ga[0]), normalized_radius_b=float(gb[0]),
                    view_angle_a=float(ga[1]), view_angle_b=float(gb[1]),
                    normalized_x_a=float(ga[2]), normalized_y_a=float(ga[3]),
                    normalized_x_b=float(gb[2]), normalized_y_b=float(gb[3]),
                )
            )

    def solve_balance(self):
        """COLOR_BALANCE: solve radiometric parameters."""
        if not self.ok:
            return False
        from opencalibration_tpu.utils.performance import PerformanceMeasure

        cam_positions = {
            nid: np.asarray(self.graph.get_node(nid).payload.position[:2])
            for nid in self._nodes
        }
        with PerformanceMeasure("ortho: balance solve"):
            self.balance = solve_color_balance(self.correspondences, cam_positions)
        return True

    # -- pass 2: correct + blend + stream-write ---------------------------

    def _correction_tables(self):
        """Per-node-index correction arrays for vectorized application."""
        n = len(self._nodes)
        off = np.zeros((n, 3))
        brdf = np.zeros(n)
        slope = np.zeros((n, 2))
        vig = np.zeros((n, 3))
        if self.balance is not None and self.balance.success:
            for i, nid in enumerate(self._nodes):
                p = self.balance.per_image_params.get(nid)
                if p is not None:
                    off[i] = p.lab_offset
                    brdf[i] = p.brdf_coeff
                    slope[i] = p.slope
                mid = self.graph.get_node(nid).payload.model_id
                v = self.balance.per_model_vignetting.get(mid)
                if v is not None:
                    vig[i] = v
        return off, brdf, slope, vig

    def _blend_tile_dispatch(self, disp: Optional[dict], tables_dev):
        """Enqueue one freshly rendered tile's fused correct + transition
        + fill + blend kernel; returns device handles (lab8, alpha, cam0)
        — the layer stack never leaves the device."""
        if disp is None:
            return None
        off, brdf, slope, vig = tables_dev
        lcolors, lweights, lgeom, sel = disp["dev"]
        return _render_blend_kernel(
            lcolors, lweights, lgeom, sel,
            jnp.asarray(np.asarray(disp["idxs"], np.int32)),
            jnp.asarray(disp["valid_z"]),
            off, brdf, slope, vig,
            jnp.asarray(self.blend_transition, jnp.float32),
            ts=self.tile_size,
            levels=min(
                self.blend_levels, max(1, int(math.log2(self.tile_size)) - 1)
            ),
        )

    def _blend_tile_finish(self, dev, th: int, tw: int, want_cam: bool):
        """Pull + Lab->BGR convert + alpha + crop; returns
        (RGBA [th, tw, 4], cam0 [th, tw] node-list index or None)."""
        import cv2

        lab8, alpha, cam0 = dev
        if want_cam:
            lab8, alpha, cam0 = jax.device_get((lab8, alpha, cam0))
        else:
            lab8, alpha = jax.device_get((lab8, alpha))
            cam0 = None
        bgr = cv2.cvtColor(lab8, cv2.COLOR_Lab2BGR)
        rgba = np.concatenate(
            [bgr, np.where(alpha, 255, 0).astype(np.uint8)[..., None]], axis=2
        )
        ts = self.tile_size
        if cam0 is not None:
            cam0 = np.asarray(cam0).reshape(ts, ts)[:th, :tw]
        return rgba[:th, :tw], cam0

    def _device_tables(self):
        off, brdf, slope, vig = self._correction_tables()
        return (
            jax.device_put(jnp.asarray(off, jnp.float32)),
            jax.device_put(jnp.asarray(brdf, jnp.float32)),
            jax.device_put(jnp.asarray(slope, jnp.float32)),
            jax.device_put(jnp.asarray(vig, jnp.float32)),
        )

    def pass_blend(self, path: str, camera_id_path: Optional[str] = None) -> bool:
        """BLEND_LAYERS: re-render each tile on device, correct + blend it
        in the same fused program, stream finished tiles into a tiled
        GeoTIFF (+ optional camera-id sidecar). Peak memory is one tile +
        overview accumulators — never the full mosaic (reference streams
        tiles through GDAL, ortho.cpp:1665-2050)."""
        if not self.ok:
            return False
        from opencalibration_tpu.io.geotiff import GeoTiffTileWriter

        b = self._bounds
        wkt = (
            self.geocoord.get_wkt()
            if self.geocoord is not None and self.geocoord.is_initialized()
            else None
        )
        tables = self._device_tables()
        writer = GeoTiffTileWriter(
            path, self._width, self._height, 4, np.uint8,
            (b.min_x, b.max_y), (self._gsd, self._gsd),
            tile_size=self.tile_size, wkt=wkt, overviews=3,
        )
        cam_writer = None
        if camera_id_path:
            # single uint64 band: the reference round-trips whole uint64
            # camera ids through this raster (test_ortho_functional.cpp)
            cam_writer = GeoTiffTileWriter(
                camera_id_path, self._width, self._height, 1, np.uint64,
                (b.min_x, b.max_y), (self._gsd, self._gsd),
                tile_size=self.tile_size, wkt=wkt,
            )
        from opencalibration_tpu.utils.performance import PerformanceMeasure

        ts = self.tile_size

        def _finish(pending):
            k, tx, ty, dev, th, tw = pending
            cam0 = None
            if dev is None:
                rgba = np.zeros((th, tw, 4), np.uint8)
            else:
                with PerformanceMeasure("ortho: blend finish"):
                    rgba, cam0 = self._blend_tile_finish(
                        dev, th, tw, want_cam=cam_writer is not None
                    )
            if cam_writer is not None:
                if cam0 is None:
                    ids = np.zeros((th, tw), np.uint64)
                else:
                    covered = rgba[:, :, 3] == 255
                    ids = np.where(
                        covered,
                        np.asarray(self._nodes, np.uint64)[cam0],
                        np.uint64(0),
                    )
                cam_writer.write_tile(tx, ty, ids[..., None])
            with PerformanceMeasure("ortho: write tiles"):
                writer.write_tile(tx, ty, rgba)
            if self.tile_callback is not None:
                import base64

                import cv2

                small = cv2.resize(rgba, (64, 64), interpolation=cv2.INTER_AREA)
                ok_png, buf = cv2.imencode(".png", small)
                self.tile_callback(
                    dict(
                        tile_x=tx, tile_y=ty,
                        num_tiles_x=self._tiles_x,
                        num_tiles_y=self._tiles_y,
                        fraction_done=(k + 1) / max(len(self._order), 1),
                        png_base64=base64.b64encode(buf.tobytes()).decode("ascii")
                        if ok_png else None,
                    )
                )

        # same one-deep pipeline as pass_layers: tile N+1's render+blend
        # kernels are enqueued before tile N's pixels are pulled
        import concurrent.futures

        pool = concurrent.futures.ThreadPoolExecutor(max_workers=2)
        pending = None
        try:
            for k, (tx, ty) in enumerate(self._order):
                if k + 1 < len(self._order):
                    nx_, ny_ = self._order[k + 1]
                    self._cache.prefetch(
                        self._tile_paths(ny_ * self._tiles_x + nx_), pool=pool
                    )
                tw = min(ts, self._width - tx * ts)
                th = min(ts, self._height - ty * ts)
                with PerformanceMeasure("ortho: blend dispatch"):
                    disp = self._project_tile_dispatch(tx, ty)
                    dev = self._blend_tile_dispatch(disp, tables)
                if pending is not None:
                    _finish(pending)
                pending = (k, tx, ty, dev, th, tw)
            if pending is not None:
                _finish(pending)
        finally:
            pool.shutdown(wait=False)
            writer.close()
            if cam_writer is not None:
                cam_writer.close()
        return True


def generate_ortho_geotiff(
    path: str, surfaces, graph, model_store, geocoord=None,
    max_megapixels: float = 64.0, tile_size: int = DEFAULT_TILE,
    cache_images: int = 16, blend_levels: int = 4,
    camera_id_path: Optional[str] = None,
) -> bool:
    job = OrthoJob(
        surfaces, graph, model_store, geocoord, max_megapixels,
        tile_size, cache_images, blend_levels,
    )
    if not job.ok:
        return False
    job.pass_layers()
    job.solve_balance()
    return job.pass_blend(path, camera_id_path=camera_id_path)


def generate_textured_obj(
    path_prefix: str, surfaces, ortho_rgba: np.ndarray,
    origin_xy: Tuple[float, float], gsd: float,
) -> bool:
    """OBJ + MTL + JPG textured mesh export
    (reference generateTexturedOBJ, ortho.cpp:2052-2260): UVs from the
    orthomosaic georeference."""
    mesh = None
    for s in surfaces:
        if s.mesh is not None and s.mesh.num_vertices > 0:
            mesh = s.mesh
            break
    if mesh is None:
        return False
    import cv2

    h, w = ortho_rgba.shape[:2]
    cv2.imwrite(path_prefix + ".jpg", ortho_rgba[..., :3])
    name = path_prefix.split("/")[-1]
    with open(path_prefix + ".mtl", "w") as f:
        f.write(f"newmtl ortho\nKa 1 1 1\nKd 1 1 1\nmap_Kd {name}.jpg\n")
    with open(path_prefix + ".obj", "w") as f:
        f.write(f"mtllib {name}.mtl\nusemtl ortho\n")
        for v in mesh.vertices:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for v in mesh.vertices:
            u = (v[0] - origin_xy[0]) / (gsd * w)
            vv = 1.0 - (origin_xy[1] - v[1]) / (gsd * h)
            f.write(f"vt {u:.6f} {vv:.6f}\n")
        for t in mesh.triangles:
            a, bb, c = t[0] + 1, t[1] + 1, t[2] + 1
            f.write(f"f {a}/{a} {bb}/{bb} {c}/{c}\n")
    return True
