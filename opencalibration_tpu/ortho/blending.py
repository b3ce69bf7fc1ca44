"""Blend weights, pull-push fill and Laplacian pyramid blending.

Device re-design of reference src/ortho/blending.cpp:12-229: instead of
OpenCV pyrDown/pyrUp per layer on CPU threads, the pyramid is separable
5-tap Gaussian convs in XLA over a [L, H, W, C] layer batch — every layer
of every pyramid level is one fused conv.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def compute_blend_weight(pixel_x, pixel_y, image_width, image_height, camera_distance):
    """Edge-feather x center-preference x proximity product
    (reference blending.cpp:12-36). Broadcasts over arrays."""
    half_w = image_width * 0.5
    half_h = image_height * 0.5
    min_edge = jnp.minimum(
        jnp.minimum(pixel_x, image_width - 1.0 - pixel_x),
        jnp.minimum(pixel_y, image_height - 1.0 - pixel_y),
    )
    edge_weight = jnp.maximum(jnp.minimum(min_edge / half_w, 1.0), 0.001)
    cx = (pixel_x - half_w) / half_w
    cy = (pixel_y - half_h) / half_h
    center_dist = jnp.sqrt(cx * cx + cy * cy)
    center_weight = 1.0 - 0.5 * jnp.minimum(center_dist, 1.0)
    proximity = 1.0 / (1.0 + camera_distance * camera_distance)
    return edge_weight * center_weight * proximity


_GAUSS5 = jnp.asarray([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0


def _sep_conv(img, k):
    """[N, H, W, C] separable conv with reflect-ish edge padding."""
    n, h, w, c = img.shape
    x = jnp.transpose(img, (0, 3, 1, 2)).reshape(n * c, 1, h, w)
    kx = k.reshape(1, 1, 1, -1).astype(img.dtype)
    ky = k.reshape(1, 1, -1, 1).astype(img.dtype)
    r = k.shape[0] // 2
    x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (r, r)], mode="edge")
    x = jax.lax.conv_general_dilated(x, kx, (1, 1), "VALID")
    x = jnp.pad(x, [(0, 0), (0, 0), (r, r), (0, 0)], mode="edge")
    x = jax.lax.conv_general_dilated(x, ky, (1, 1), "VALID")
    return jnp.transpose(x.reshape(n, c, h, w), (0, 2, 3, 1))


def pyr_down(img):
    """[N, H, W, C] -> [N, ceil(H/2), ceil(W/2), C]."""
    return _sep_conv(img, _GAUSS5)[:, ::2, ::2, :]


def pyr_up(img, out_hw):
    """[N, h, w, C] -> [N, H, W, C] (zero-stuff + 2x gaussian)."""
    n, h, w, c = img.shape
    H, W = out_hw
    up = jnp.zeros((n, h * 2, w * 2, c), img.dtype)
    up = up.at[:, ::2, ::2, :].set(img)
    up = _sep_conv(up, _GAUSS5 * 2.0)
    return up[:, :H, :W, :]


def _num_levels(h, w, max_levels=None):
    levels = 1
    while min(h, w) >> levels >= 2:
        levels += 1
    if max_levels:
        levels = min(levels, max_levels)
    return levels


@jax.jit
def pull_push_fill(color, weight):
    """Extrapolate valid colors into zero-weight regions
    (reference blending.cpp:38-89): weighted pyramid down, then fill
    invalid pixels from coarser levels on the way up."""
    # color: [N, H, W, C], weight: [N, H, W, 1]
    n, h, w, c = color.shape
    levels = _num_levels(h, w)
    wc = [color * weight]
    ws = [weight]
    for l in range(1, levels):
        wc.append(pyr_down(wc[-1]))
        ws.append(pyr_down(ws[-1]))
    # normalize coarsest
    out = wc[-1] / jnp.maximum(ws[-1], 1e-8)
    for l in range(levels - 2, -1, -1):
        up = pyr_up(out, wc[l].shape[1:3])
        cur = wc[l] / jnp.maximum(ws[l], 1e-8)
        valid = ws[l] > 1e-6
        out = jnp.where(valid, cur, up)
    return out


@functools.partial(jax.jit, static_argnames=("levels",))
def laplacian_blend(colors, weights, levels: int = 5):
    """Weight-renormalized multi-band blend
    (reference blending.cpp:91-229).

    colors: [L, H, W, C] layers (already hole-filled), weights: [L, H, W, 1].
    Returns [H, W, C].
    """
    L, H, W, C = colors.shape
    wsum = jnp.sum(weights, axis=0, keepdims=True)
    wnorm = weights / jnp.maximum(wsum, 1e-8)

    # gaussian pyramid of weights, laplacian pyramid of colors
    gp_w = [wnorm]
    gp_c = [colors]
    for l in range(1, levels):
        gp_w.append(pyr_down(gp_w[-1]))
        gp_c.append(pyr_down(gp_c[-1]))

    blended = None
    # blend from coarsest up
    base = jnp.sum(gp_c[-1] * gp_w[-1], axis=0)
    blended = base
    for l in range(levels - 2, -1, -1):
        lap = gp_c[l] - pyr_up(gp_c[l + 1], gp_c[l].shape[1:3])
        band = jnp.sum(lap * gp_w[l], axis=0)
        blended = pyr_up(blended[None], gp_c[l].shape[1:3])[0] + band
    return blended


def sigmoid_transition_weight(raw_weight, best_weight, transition_radius: float):
    """Sigmoid of weight margin vs the per-pixel best layer
    (the blend_transition_radius sharpening of reference
    ortho.cpp:1839-1875)."""
    margin = (raw_weight - best_weight) / max(transition_radius, 1e-6)
    return jax.nn.sigmoid(margin * 6.0)
