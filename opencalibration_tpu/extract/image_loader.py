"""Host-side image loading + batched device feature extraction.

Replaces the reference's per-image load runner (reference src/extract/
extract_image.cpp:27-85: cv::imread -> Lab thumbnail -> AKAZE features ->
EXIF -> camera-DB priming) with a TPU-first split:

* host (this module): JPEG decode (cv2 = native turbo-jpeg path), Lab
  thumbnail, grayscale downscale to <= 1600 px (reference
  extract_features.cpp:14,26-27), EXIF/XMP metadata, camera-DB lookup;
* device: feature detection + description runs **batched** over many
  images at once (ops.features.extract_features), not per-image — the
  load stage collects a batch of decoded grayscale arrays and makes one
  device call.

The NMS radius-8 sparse/dense split of the reference (extract_features
.cpp:57-83) is applied as masked selection on the device outputs.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np

from opencalibration_tpu.extract.camera_database import (
    CameraDatabase,
    apply_database_entry,
)
from opencalibration_tpu.extract.metadata import extract_metadata
from opencalibration_tpu.types.graph import FeatureSet, ImageMetadata, ImageNode

MAX_LENGTH_PIXELS = 1600  # reference extract_features.cpp:14
NMS_PIXEL_RADIUS = 8.0  # reference extract_features.cpp:15
THUMBNAIL_TARGET = 50.0  # reference extract_image.cpp:46 (50/sqrt(area))


@dataclasses.dataclass
class DecodedImage:
    """Host-side decode result, ready for batched device extraction."""

    node: ImageNode
    gray: np.ndarray  # [H, W] uint8, downscaled (device normalizes)
    scale: float  # original px = gray px / scale


def _cv2():
    import cv2

    return cv2


def load_and_decode(path: str) -> Optional[DecodedImage]:
    """Decode, thumbnail, metadata, camera-model priming. Returns None for
    unreadable files (graceful skip, reference extract_image.cpp:37-40)."""
    cv2 = _cv2()
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None or img.size == 0:
        return None

    node = ImageNode(path=path)

    # Lab thumbnail at ~50px wide (reference extract_image.cpp:42-52)
    lab = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)
    tscale = THUMBNAIL_TARGET / math.sqrt(img.shape[0] * img.shape[1])
    tw = max(1, int(round(img.shape[1] * tscale)))
    th = max(1, int(round(img.shape[0] * tscale)))
    node.thumbnail = cv2.resize(lab, (tw, th), interpolation=cv2.INTER_AREA)

    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
    scale = min(1.0, MAX_LENGTH_PIXELS / max(gray.shape[0], gray.shape[1]))
    if scale < 1.0:
        gray = cv2.resize(
            gray, (int(gray.shape[1] * scale), int(gray.shape[0] * scale)),
            interpolation=cv2.INTER_AREA,
        )
    # stays uint8: the device upload ships 1 byte/px (4x less tunnel/PCIe
    # traffic than f32); ops.features.extract_features normalizes on-device
    node.metadata = extract_metadata(path)
    if node.metadata.width_px == 0:
        node.metadata.width_px = img.shape[1]
        node.metadata.height_px = img.shape[0]

    return DecodedImage(node=node, gray=gray, scale=scale)


def camera_model_kwargs(md: ImageMetadata, database: Optional[CameraDatabase] = None):
    """Initial camera model parameters with DB priors
    (reference extract_image.cpp:60-80)."""
    kw = dict(
        focal_length_pixels=md.focal_length_px,
        principal_point=(md.width_px / 2.0, md.height_px / 2.0),
        radial_distortion=(0.0, 0.0, 0.0),
        tangential_distortion=(0.0, 0.0),
        pixels_cols=float(md.width_px),
        pixels_rows=float(md.height_px),
    )
    db = database or CameraDatabase.instance()
    entry = db.lookup(md)
    if entry is not None:
        kw = apply_database_entry(entry, md, kw)
    return kw


def pad_gray_batch(grays: list, target_hw=None):
    """Stack variable-size grayscale arrays into one padded batch.

    Returns (batch [B, H, W] of the input dtype — uint8 from the decode
    path — and sizes [B, 2]). Padding is edge replication so the detector
    border suppression handles it.
    """
    if target_hw is None:
        H = max(g.shape[0] for g in grays)
        W = max(g.shape[1] for g in grays)
    else:
        H, W = target_hw
    out = np.zeros((len(grays), H, W), grays[0].dtype if grays else np.uint8)
    sizes = np.zeros((len(grays), 2), np.int32)
    for i, g in enumerate(grays):
        h, w = g.shape
        out[i, :h, :w] = g
        # edge-replicate padding
        if h < H:
            out[i, h:, :w] = g[-1:, :]
        if w < W:
            out[i, :, w:] = out[i, :, w - 1 : w]
        sizes[i] = (h, w)
    return out, sizes


def batch_sparse_masks(out, sizes_hw):
    """Radius-NMS sparse masks for a whole extraction batch in ONE device
    dispatch per distinct image size (and ONE device_get) — the per-image
    variant cost a device round-trip per image, which through a remote-TPU
    tunnel dominated the whole load stage. Returns (out_np, masks [N, K])."""
    import jax
    import jax.numpy as jnp

    from opencalibration_tpu.ops.spatial import nms_radius
    from opencalibration_tpu.utils.performance import PerformanceMeasure

    with PerformanceMeasure("load: device_get outputs"):
        out_np = jax.device_get(dict(out))
    N = len(sizes_hw)
    masks = np.zeros(out_np["valid"].shape, bool)
    by_cells: Dict[tuple, list] = {}
    for i, (h, w) in enumerate(sizes_hw):
        ncx = max(2, int(math.ceil(w / NMS_PIXEL_RADIUS)))
        ncy = max(2, int(math.ceil(h / NMS_PIXEL_RADIUS)))
        by_cells.setdefault((ncx, ncy), []).append(i)
    for (ncx, ncy), idxs in by_cells.items():
        sel = np.asarray(idxs)
        xy = out_np["xy"][sel]
        strength = out_np["strength"][sel]
        wv = np.asarray([sizes_hw[i][1] for i in idxs], np.float32)
        hv = np.asarray([sizes_hw[i][0] for i in idxs], np.float32)
        valid = (
            out_np["valid"][sel]
            & (xy[..., 0] < wv[:, None])
            & (xy[..., 1] < hv[:, None])
        )
        m = jax.vmap(
            lambda a, b, c: nms_radius(a, b, c, NMS_PIXEL_RADIUS, ncx, ncy)
        )(jnp.asarray(xy), jnp.asarray(strength), jnp.asarray(valid))
        masks[sel] = np.asarray(m)
    return out_np, masks


def features_from_device(out, index: int, scale: float, size_hw, max_keep: int,
                         sparse_mask=None):
    """Convert one image's slice of the batched device output into a
    FeatureSet in ORIGINAL image pixel coordinates, applying the radius-8
    NMS sparse split of the reference. `out` should be the host copy and
    `sparse_mask` the row from batch_sparse_masks; the per-image device
    fallback remains for single-image callers."""
    xy = np.asarray(out["xy"][index])
    strength = np.asarray(out["strength"][index])
    desc = np.asarray(out["descriptors"][index])
    valid = np.asarray(out["valid"][index])
    h, w = int(size_hw[0]), int(size_hw[1])
    inside = (xy[:, 0] < w) & (xy[:, 1] < h)
    valid = valid & inside

    if sparse_mask is None:
        import jax.numpy as jnp

        from opencalibration_tpu.ops.spatial import nms_radius

        n_cells_x = max(2, int(math.ceil(w / NMS_PIXEL_RADIUS)))
        n_cells_y = max(2, int(math.ceil(h / NMS_PIXEL_RADIUS)))
        sparse_mask = np.asarray(
            nms_radius(
                jnp.asarray(xy), jnp.asarray(strength), jnp.asarray(valid),
                NMS_PIXEL_RADIUS, n_cells_x, n_cells_y,
            )
        )
    sparse_mask = np.asarray(sparse_mask)

    # sparse features first (strongest-first ordering), dense after
    order = np.argsort(-np.where(valid & sparse_mask, strength, -np.inf), kind="stable")
    n_sparse = int((valid & sparse_mask).sum())
    dense_order = np.argsort(
        -np.where(valid & ~sparse_mask, strength, -np.inf), kind="stable"
    )
    n_dense = int((valid & ~sparse_mask).sum())
    keep = np.concatenate([order[:n_sparse], dense_order[:n_dense]])[:max_keep]

    return FeatureSet(
        xy=(xy[keep] / scale).astype(np.float64),
        strength=strength[keep].astype(np.float32),
        descriptors=desc[keep],
        valid=np.ones(len(keep), bool),
        num_sparse=min(n_sparse, max_keep),
    )
