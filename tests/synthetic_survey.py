"""Synthetic aerial-survey fixture: renders JPEGs of a textured ground
plane from a nadir camera grid, with sidecar-JSON geotags.

This is the Python analogue of the reference's test_data submodule (which
is not checked out here): real pipeline inputs with exact ground truth.
"""

from __future__ import annotations

import json
import os

import numpy as np

from opencalibration_tpu.geo.geo_coord import GeoCoord

ORIGIN_LAT, ORIGIN_LON = 47.4, 8.5
IMG_W, IMG_H = 320, 240
FOCAL = 400.0
ALTITUDE = 60.0


def make_texture(seed=0, size=512):
    from scipy.ndimage import gaussian_filter

    rng = np.random.default_rng(seed)
    tex = gaussian_filter(np.kron(rng.normal(size=(size // 8, size // 8)), np.ones((8, 8))), 2.0)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    # add some sharp structure so features are strong
    tex += 0.15 * (rng.random(tex.shape) > 0.995)
    return np.clip(tex, 0, 1).astype(np.float32)


def camera_grid(rows, cols, spacing=15.0, seed=1, alt_pattern="row"):
    """Ground-truth poses: nadir + random small yaw; positions on a grid.

    Altitude alternates between two flight levels ('row': per row,
    'checker': per image): over flat terrain a single-altitude nadir
    survey leaves focal/depth as an exact null direction (similar
    triangles), so intrinsics calibration needs either terrain relief or
    altitude variation to be observable. Prefer 'row': 'checker' gives
    every ADJACENT image pair a ~45% scale jump, which degrades matching
    enough to drive the calibration schedule up the focal/radial valley
    even single-group (measured: focal 400->561). To mix altitudes inside
    small intrinsics groups, instead make rows shorter than the group
    size so every spectral group must span >=2 rows.
    """
    import jax.numpy as jnp

    from opencalibration_tpu.ops.quaternion import (
        quat_from_axis_angle,
        quat_multiply,
    )

    rng = np.random.default_rng(seed)
    DOWN = np.array([0.0, 1.0, 0.0, 0.0])
    positions, quats = [], []
    for r in range(rows):
        for c in range(cols):
            alt_bit = (r + c) % 2 if alt_pattern == "checker" else r % 2
            alt = ALTITUDE + alt_bit * 25.0
            positions.append([30.0 + c * spacing, 30.0 + r * spacing, alt])
            yaw = rng.uniform(-0.15, 0.15)
            q = quat_multiply(
                quat_from_axis_angle(jnp.asarray([0.0, 0, 1]), jnp.asarray(yaw)),
                jnp.asarray(DOWN),
            )
            quats.append(np.asarray(q))
    return np.asarray(positions), np.stack(quats)


def _render_device():
    """Device the synthetic renderer runs on. Default: host CPU.

    The render is test scaffolding (0.08 s/img on one host core), but its
    OUTPUT is bulk pixels: rendering on a tunneled remote device means
    pulling the full survey back through the link's downlink — measured
    1.9 MB/s on 2026-08-20, i.e. ~3 h for the 10k survey's uint8 frames
    vs ~15 min rendered host-side. OC_TPU_SURVEY_RENDER=device restores
    device rendering (sensible on local hardware where the pull is PCIe).
    """
    import os

    import jax

    if os.environ.get("OC_TPU_SURVEY_RENDER", "cpu") == "cpu":
        try:
            return jax.devices("cpu")[0]
        except RuntimeError:
            return None
    return None


def render_views(tex, positions, quats, ground_extent=150.0,
                 relief_amplitude=0.0, relief_wavelength=70.0):
    views = []
    for _, chunk_imgs in iter_render_views(
        tex, positions, quats, ground_extent=ground_extent,
        relief_amplitude=relief_amplitude,
        relief_wavelength=relief_wavelength,
    ):
        views.extend(chunk_imgs[i] for i in range(chunk_imgs.shape[0]))
    return views


def iter_render_views(tex, positions, quats, ground_extent=150.0,
                      relief_amplitude=0.0, relief_wavelength=70.0):
    """Yield (start_index, [chunk, H, W] float32) without holding the whole
    survey in memory (10k surveys are ~77 GB of float32 frames)."""
    import functools

    import jax
    import jax.numpy as jnp

    from opencalibration_tpu.ops import distort as D
    from opencalibration_tpu.ops.features import _bilinear
    from opencalibration_tpu.ops.quaternion import quat_rotate
    from opencalibration_tpu.types.camera import CameraModel

    model = CameraModel.create(
        FOCAL, (IMG_W / 2, IMG_H / 2), pixels_cols=IMG_W, pixels_rows=IMG_H,
        dtype=jnp.float32,
    )

    @jax.jit
    def render_all(texj, quats_a, pos_a):
        size = texj.shape[0]

        def render(q, t):
            ys, xs = jnp.meshgrid(
                jnp.arange(IMG_H, dtype=jnp.float32),
                jnp.arange(IMG_W, dtype=jnp.float32),
                indexing="ij",
            )
            px = jnp.stack([xs.ravel(), ys.ravel()], -1)
            dirs = jax.vmap(lambda p: D.image_to_3d(p, model))(px)
            wd = quat_rotate(q, dirs)
            s = -t[2] / wd[:, 2]
            if relief_amplitude:
                # heightfield terrain z = eta(x, y): fixed-point ray march
                # (converges fast for slopes << 1)
                two_pi = 2.0 * jnp.pi
                def eta(xy):
                    return relief_amplitude * (
                        jnp.sin(two_pi * xy[:, 0] / relief_wavelength)
                        * jnp.cos(two_pi * xy[:, 1] / relief_wavelength)
                    )
                for _ in range(6):
                    xy = t[None, :2] + s[:, None] * wd[:, :2]
                    s = (eta(xy) - t[2]) / wd[:, 2]
            ground = t[None] + s[:, None] * wd
            u = jnp.clip(ground[:, 0] / ground_extent * (size - 1), 0, size - 1)
            v = jnp.clip(ground[:, 1] / ground_extent * (size - 1), 0, size - 1)
            val = jax.vmap(lambda a, b: _bilinear(texj, a, b))(u, v)
            return val.reshape(IMG_H, IMG_W)

        return jax.vmap(render)(quats_a, pos_a)

    # chunk the vmap so 1k-image benchmark surveys don't hold every
    # intermediate ray buffer at once
    chunk = 64
    # upload the texture ONCE (a fresh jnp.asarray per chunk re-ships the
    # 67 MB texture through the device tunnel every iteration) and pull
    # one device_get per CHUNK (per-image np.asarray(out[i]) costs a
    # tunnel round-trip each, ~35 min for the 10k survey)
    import contextlib

    dev = _render_device()
    ctx = jax.default_device(dev) if dev is not None else contextlib.nullcontext()
    # the persistent compilation cache partitions by PROCESS env, not by
    # backend: CPU-backend renders inside a TPU process would write/load
    # XLA:CPU AOT entries in the TPU partition — machine-feature-stamped
    # artifacts whose reload risks SIGILL (observed loader feature-
    # mismatch errors). Suspend the cache for the render's compiles.
    cache_dir = None
    if dev is not None and dev.platform == "cpu":
        try:
            cache_dir = jax.config.jax_compilation_cache_dir
            if cache_dir:
                jax.config.update("jax_compilation_cache_dir", None)
        except AttributeError:
            cache_dir = None
    try:
        with ctx:
            texj = jnp.asarray(tex)
            for c0 in range(0, len(positions), chunk):
                out = np.asarray(render_all(
                    texj,
                    jnp.asarray(quats[c0 : c0 + chunk], jnp.float32),
                    jnp.asarray(positions[c0 : c0 + chunk], jnp.float32),
                ))
                yield c0, out
    finally:
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", cache_dir)


def write_survey(tmpdir, rows=2, cols=3, spacing=15.0, seed=0,
                 focal_px_tag=None, relief_amplitude=0.0,
                 relief_wavelength=70.0, alt_pattern="row"):
    """Write JPEGs + sidecar geotags. Returns (paths, positions, quats).

    focal_px_tag: focal length written to the geotag sidecars (defaults to
    the true render focal); pass a perturbed value to exercise intrinsics
    calibration recovering the truth. relief_amplitude > 0 renders a
    sinusoidal heightfield terrain instead of a flat plane — depth
    variation inside every image makes intrinsics strongly observable."""
    import cv2

    if focal_px_tag is None:
        focal_px_tag = FOCAL
    positions, quats = camera_grid(rows, cols, spacing, seed + 1, alt_pattern)
    # scale the ground texture to the survey footprint so large benchmark
    # surveys still see structured ground everywhere
    extent = max(150.0, float(positions[:, :2].max()) + 60.0)
    tex_size = min(4096, max(512, int(extent / 150.0 * 512)))
    tex = make_texture(seed, size=tex_size)

    geo = GeoCoord()
    geo.set_origin(ORIGIN_LAT, ORIGIN_LON)

    # stream: render a chunk, encode it, drop it — a 10k survey's frames
    # are ~77 GB as float32 and must never be resident at once
    paths = []
    for c0, chunk_imgs in iter_render_views(
        tex, positions, quats, ground_extent=extent,
        relief_amplitude=relief_amplitude,
        relief_wavelength=relief_wavelength,
    ):
        for j in range(chunk_imgs.shape[0]):
            i = c0 + j
            img = chunk_imgs[j]
            path = os.path.join(tmpdir, f"IMG_{i:04d}.jpg")
            cv2.imwrite(path, (img * 255).astype(np.uint8),
                        [cv2.IMWRITE_JPEG_QUALITY, 98])
            wgs = geo.to_wgs84(positions[i])
            with open(os.path.splitext(path)[0] + ".json", "w") as f:
                json.dump(
                    dict(
                        latitude=float(wgs[0]),
                        longitude=float(wgs[1]),
                        altitude=float(positions[i][2]),
                        focal_length_px=float(focal_px_tag),
                        camera_make="Synthetic",
                        camera_model="TestCam",
                    ),
                    f,
                )
            paths.append(path)
    return paths, positions, quats
