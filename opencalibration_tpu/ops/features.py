"""Batched multi-scale feature detection + MLDB-style binary description.

TPU-native re-design of the reference's per-image AKAZE extraction
(reference src/extract/extract_features.cpp:11-88: AKAZE-MLDB 486-bit
descriptors, KD-tree NMS radius 8px, strongest-first split into sparse and
dense sets).

Architecture notes (not a translation):
* the nonlinear-diffusion scale space of AKAZE is replaced by a Gaussian
  scale space built from separable depthwise convolutions — XLA fuses the
  whole pyramid into a handful of conv kernels on the MXU. A
  conductivity-weighted FED scale space (AKAZE's diffusion,
  extract_features.cpp:35) is available via ``diffusion="fed"``.
  Default justification (bench_fed_ab.py, 24-image bench survey,
  2026-08-19): Gaussian extracts 5.6x faster (6.34 vs 1.13 img/s on one
  CPU core; the FED stencil chain is serial in scale and cannot be
  decimated) with HIGHER 3px repeatability under real viewpoint change
  (0.834 vs 0.785) and ~2x the RANSAC pose-decomposition score through
  the production match path (188 vs 99); FED's only edge was 0.08
  degrees of median tilt error (0.27 vs 0.35, both well under the relax
  noise floor). On this workload the linear pyramid dominates, so it
  stays the default.
* detection is the scale-normalized Hessian determinant with 3x3x3
  (x, y, scale) max-pool NMS — the same response AKAZE thresholds — and a
  top-K selection to fixed shape.
* the descriptor keeps AKAZE-MLDB's *layout*: 3 channels (L, Lx, Ly)
  sampled on 2x2 / 3x3 / 4x4 grids in the keypoint's oriented, scaled
  frame, all intra-grid cell pairs compared per channel:
  3 * (C(4,2) + C(9,2) + C(16,2)) = 3 * 162 = 486 bits — bit-compatible in
  size with reference types/feature_2d.hpp:11 and packed with
  ops.hamming.pack_bits.

Everything is fixed-shape: images enter as a [B, H, W] batch, features
leave as [B, K] padded arrays with validity masks.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np

from opencalibration_tpu.ops.hamming import pack_bits

# scale-space configuration (AKAZE-like: 4 octaves x 4 sublevels)
NUM_OCTAVES = 4
SUBLEVELS = 4
BASE_SIGMA = 1.6
DETECTOR_THRESHOLD = 1e-4  # on normalized Hessian response of [0,1] images
NMS_RADIUS_PIXELS = 8.0  # reference extract_features.cpp NMS radius

# Blur matmul precision. "bf16": operands truncated to bfloat16, ONE
# native MXU pass with float32 accumulation — the fast path. "f32":
# Precision.HIGHEST, the multi-pass float32 emulation (~6 bf16 passes
# per matmul on TPU). The original failure mode that forced HIGHEST was
# the INCREMENTAL 16-step blur chain, where each sublevel truncated the
# previous sublevel's output and the storage error compounded across the
# chain into the sigma^4-normalized detector response; since the
# batched-Toeplitz rewrite every level is blurred directly from its
# octave base (1-2 matmul pairs from the source pixels), so a single
# bf16 input truncation (~2^-9 relative, and spatially smooth after the
# blur so the Hessian's differencing cancels most of it) stays well
# under DETECTOR_THRESHOLD. Fidelity A/B: bench_blur_precision_ab.py.
_BLUR_PRECISION = os.environ.get("OC_TPU_BLUR_PRECISION", "bf16")


def set_blur_precision(mode: str):
    """'bf16' (native MXU pass, f32 accumulation) or 'f32' (HIGHEST)."""
    global _BLUR_PRECISION
    if mode not in ("bf16", "f32"):
        raise ValueError(mode)
    _BLUR_PRECISION = mode
    jax.clear_caches()


def _blur_einsum(spec, a, b):
    """Einsum for the blur Toeplitz matmuls at the configured precision.

    bf16 operands are cast explicitly (identical numerics on every
    backend, including the CPU A/B) and accumulated in float32 via
    preferred_element_type — storage precision drops, accumulation
    precision does not."""
    if _BLUR_PRECISION == "bf16":
        return jnp.einsum(
            spec, a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.einsum(spec, a, b, precision=jax.lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=256)
def _blur_toeplitz(sigma: float, n: int):
    """Banded Toeplitz matrix applying a 1-d Gaussian with edge-clamp
    padding folded into the border rows. Host-built once per (sigma, n);
    becomes a compile-time constant of the jitted graph."""
    radius = max(1, int(math.ceil(3.0 * sigma)))
    x = np.arange(-radius, radius + 1)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    k = k / k.sum()
    M = np.zeros((n, n), np.float64)
    for i in range(n):
        for d in range(-radius, radius + 1):
            j = min(max(i + d, 0), n - 1)
            M[i, j] += k[d + radius]
    return M.astype(np.float32)


def _blur(img, sigma: float):
    """Separable Gaussian blur of [B, H, W] (edge padding) as two banded
    Toeplitz matmuls on the MXU.

    The obvious conv_general_dilated form needs Precision.HIGHEST (TPU
    convs default to bf16 accumulation, whose noise floor — amplified by
    the sigma^4 detector normalization — floods the detector threshold
    and flips near-tie descriptor bits) and then costs 2x this matmul
    form at survey image sizes; the wasted off-band MXU FLOPs are free at
    H, W of a few hundred. Blurs are the dominant cost of detect()."""
    B, H, W = img.shape
    Mh = jnp.asarray(_blur_toeplitz(float(sigma), H))
    Mw = jnp.asarray(_blur_toeplitz(float(sigma), W))
    out = _blur_einsum("ih,bhw->biw", Mh, img)
    return _blur_einsum("bhw,jw->bhj", out, Mw)


def _blur_levels(base, base_sigma: float, rels):
    """All sublevels of one octave blurred DIRECTLY from the octave base
    (Gaussians compose: blur(base, sqrt(rel^2 - base^2)) equals the
    incremental sublevel chain up to kernel-truncation error), so there
    is no cross-sublevel data dependence: [S, B, H, W] out.

    Deliberately one PAIR of 3-d einsums per sublevel rather than a
    single batched [S,H,H]x[B,H,W] 4-d einsum: inside the fused jit the
    dispatch count is identical, and the 4-d form's [S,B,H,W]
    intermediate invites a layout with the small S/B dims minormost —
    observed tiled-padded 16x to 14.65 GB on v5e (compile-time HBM OOM
    at B=8), and the pathological layout propagates into the NMS
    reduce_window downstream."""
    B, H, W = base.shape
    outs = []
    for rel in rels:
        inc = math.sqrt(max(rel * rel - base_sigma * base_sigma, 0.0))
        outs.append(_blur(base, inc) if inc > 0 else base)
    return jnp.stack(outs)


_DX = jnp.asarray([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
_DY = _DX.T


def _conv3(img, kernel):
    img4 = img[:, None, :, :]
    k = kernel.reshape(1, 1, 3, 3).astype(img.dtype)
    out = jax.lax.conv_general_dilated(
        jnp.pad(img4, [(0, 0), (0, 0), (1, 1), (1, 1)], mode="edge"),
        k, (1, 1), "VALID",
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[:, 0]


def _conv3_multi(imgs, kernels, groups: int = 1):
    """[B, Cin, H, W] x [Cout, Cin/groups, 3, 3] -> [B, Cout, H, W] in ONE
    conv call. The derivative chains (gradients, Hessian) were 5
    sequential single-channel convs per level, each a full read+write of
    the [B, H, W] image — multi-output convs keep the math identical and
    cut the HBM passes (measured: the Hessian chain was 179 ms of the
    369 ms detect at 8x1200x1600)."""
    out = jax.lax.conv_general_dilated(
        jnp.pad(imgs, [(0, 0), (0, 0), (1, 1), (1, 1)], mode="edge"),
        kernels.astype(imgs.dtype), (1, 1), "VALID",
        feature_group_count=groups,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out


def _level_sigmas():
    return [
        BASE_SIGMA * (2.0 ** (o + s / SUBLEVELS))
        for o in range(NUM_OCTAVES)
        for s in range(SUBLEVELS)
    ]


def _fed_tau_cycle(total_time: float, tau_max: float = 0.24):
    """Explicit diffusion step sizes covering total_time.

    AKAZE's FED cycles use Chebyshev-like steps exceeding the stability
    limit (stable only as a composition, and only with careful step
    reordering in float32 — without it the intermediate states overflow,
    observed as 1e9 detector responses). We take the conservative route:
    uniform steps at the 2d explicit stability limit. More steps, but each
    is one fused 4-neighbour stencil on the VPU — cheap on TPU.
    """
    n = max(1, math.ceil(total_time / tau_max))
    return [total_time / n] * n


def _diffusion_step(L, c, tau: float):
    """One explicit step of div(c grad L) on the 4-neighbour stencil with
    conductivities averaged onto edges (AKAZE's discretization)."""
    cN = 0.5 * (c + jnp.roll(c, 1, axis=1))
    cS = 0.5 * (c + jnp.roll(c, -1, axis=1))
    cW = 0.5 * (c + jnp.roll(c, 1, axis=2))
    cE = 0.5 * (c + jnp.roll(c, -1, axis=2))
    dN = jnp.roll(L, 1, axis=1) - L
    dS = jnp.roll(L, -1, axis=1) - L
    dW = jnp.roll(L, 1, axis=2) - L
    dE = jnp.roll(L, -1, axis=2) - L
    # zero-flux borders
    B, H, W = L.shape
    dN = dN.at[:, 0, :].set(0.0)
    dS = dS.at[:, H - 1, :].set(0.0)
    dW = dW.at[:, :, 0].set(0.0)
    dE = dE.at[:, :, W - 1].set(0.0)
    return L + tau * (cN * dN + cS * dS + cW * dW + cE * dE)


def scale_space(images, diffusion: str = "gaussian"):
    """[B, H, W] -> (L [S, B, H, W] levels, sigmas [S]).

    diffusion="gaussian": linear scale space (separable convs).
    diffusion="fed": AKAZE-style nonlinear diffusion — Perona-Malik g2
    conductivity c = 1 / (1 + |grad L_1|^2 / k^2) evolved between levels
    with Fast Explicit Diffusion cycles, preserving edges that the
    detector and MLDB comparisons feed on (the reference's AKAZE scale
    space, cv::AKAZE in extract_features.cpp:35).

    Full-resolution pyramid (no decimation): keeps shapes static and lets
    the detector compare neighboring scales directly.
    """
    sigmas = _level_sigmas()
    levels = []
    if diffusion == "gaussian":
        prev = images
        prev_sigma = 0.0
        for sigma in sigmas:
            inc = math.sqrt(max(sigma * sigma - prev_sigma * prev_sigma, 1e-6))
            prev = _blur(prev, inc)
            prev_sigma = sigma
            levels.append(prev)
        return jnp.stack(levels), jnp.asarray(sigmas, images.dtype)

    # nonlinear (FED) scale space
    L = _blur(images, sigmas[0])
    # contrast factor k: 70th percentile of gradient magnitude (AKAZE's
    # KPercentile on the smoothed image)
    g1 = _blur(images, 1.0)
    gx = _conv3(g1, _DX)
    gy = _conv3(g1, _DY)
    gmag = jnp.sqrt(gx * gx + gy * gy)
    k = jnp.percentile(gmag.reshape(gmag.shape[0], -1), 70.0, axis=1)
    k = jnp.maximum(k, 1e-6)[:, None, None]

    levels.append(L)
    prev_t = 0.5 * sigmas[0] ** 2
    for sigma in sigmas[1:]:
        t = 0.5 * sigma**2
        # conductivity from the current level's smoothed gradients
        Ls = _blur(L, 1.0)
        lx = _conv3(Ls, _DX)
        ly = _conv3(Ls, _DY)
        c = 1.0 / (1.0 + (lx * lx + ly * ly) / (k * k))
        taus = _fed_tau_cycle(t - prev_t)
        # rolled loop: unrolling ~hundreds of stencil steps into one flat
        # XLA graph segfaults the TPU compiler
        L = jax.lax.fori_loop(
            0, len(taus), lambda i, Li: _diffusion_step(Li, c, taus[0]), L
        )
        prev_t = t
        levels.append(L)
    return jnp.stack(levels), jnp.asarray(sigmas, images.dtype)


def hessian_response(L, sigmas):
    """Scale-normalized determinant of Hessian per level.

    Two fused multi-channel convs (L -> [Lx, Ly] -> [Lxx, Lxy, Lyy])
    replace five sequential single-channel convs — identical math (same
    kernels, same edge padding), ~2.4x fewer HBM passes over the
    full-resolution level stack.

    The [S, B] leading dims are collapsed to ONE batch dim before the
    convs: a vmap-over-levels [S, B, C, H, W] intermediate lets the TPU
    layout assigner put the small S/B dims minormost and tile-pad them
    (observed (4,128)-tiling a 937 MB hessian buffer 16x to 14.65 GB —
    compile-time HBM OOM on v5e). With [(S*B), C, H, W] only the large
    spatial dims can land in the tiled minor positions."""
    S, B, H, W = L.shape
    k1 = jnp.stack([_DX, _DY])[:, None]  # [2, 1, 3, 3]
    # grouped second stage: from Lx take (ddx, ddy) = (Lxx, Lxy); from Ly
    # take (ddx, ddy) = (Lyx, Lyy); Lxy == Lyx so Lyx is unused
    k2 = jnp.stack([_DX, _DY, _DX, _DY])[:, None]  # [4, 1, 3, 3], groups=2

    flat = L.reshape(S * B, 1, H, W)
    g = _conv3_multi(flat, k1)  # [S*B, 2, H, W]
    h = _conv3_multi(g, k2, groups=2)  # [S*B, 4, H, W]
    Lxx, Lxy, Lyy = h[:, 0], h[:, 1], h[:, 3]
    det = (Lxx * Lyy - Lxy * Lxy).reshape(S, B, H, W)
    return (sigmas.astype(det.dtype)[:, None, None, None] ** 4) * det


# TPU top-k recall: 1.0 keeps the fast PartialReduce algorithm (still much
# faster than the sort-based top_k on large response vectors) while
# returning the EXACT top-k set, preserving the reference's
# reproducibility contract across backends (README.md:7; a 0.95 recall
# would silently drop ~5% of true candidates on TPU only). Lower it via
# set_topk_recall() to trade determinism for a little more speed.
_TOPK_RECALL = 1.0


def set_topk_recall(recall: float):
    global _TOPK_RECALL
    _TOPK_RECALL = float(recall)
    jax.clear_caches()


def _topk_scores(flat, k):
    if jax.default_backend() == "tpu":
        vals, idxs = jax.lax.approx_max_k(flat, k, recall_target=_TOPK_RECALL)
        # approx_max_k's output order is implementation-defined: re-sort by
        # (-value, index) so downstream candidate ordering is deterministic
        order = jnp.lexsort((idxs, -vals), axis=-1)
        return (
            jnp.take_along_axis(vals, order, axis=-1),
            jnp.take_along_axis(idxs, order, axis=-1),
        )
    return jax.lax.top_k(flat, k)


def _candidates_from_levels(Rb, threshold, border, k, step):
    """NMS + top-k + subpixel over one stack of same-resolution levels.

    Rb: [B, S, H, W] normalized responses on (possibly decimated) grid;
    step: grid spacing in original pixels. Returns per-image candidate
    arrays (xy in ORIGINAL pixels, strength, level-in-stack, valid).
    """
    B, S, H, W = Rb.shape
    # 3x3x3 (scale, y, x) max pool, decomposed: 2-d spatial reduce_window
    # on a collapsed [(B*S), H, W] batch (keeps the large spatial dims in
    # the tiled minor layout positions — a 4-d [B, S, H, W] reduce_window
    # lets the layout assigner tile-pad the small B/S dims 16x, which
    # OOMs HBM at compile time on v5e), then the scale-axis max of each
    # level's spatial max via shifted slices. max is associative so the
    # decomposition is exact.
    m2 = jax.lax.reduce_window(
        Rb.reshape(B * S, H, W), -jnp.inf, jax.lax.max,
        (1, 3, 3), (1, 1, 1), "SAME",
    ).reshape(B, S, H, W)
    neg = jnp.full((B, 1, H, W), -jnp.inf, Rb.dtype)
    lo = jnp.concatenate([neg, m2[:, :-1]], axis=1)
    hi = jnp.concatenate([m2[:, 1:], neg], axis=1)
    m = jnp.maximum(m2, jnp.maximum(lo, hi))
    is_peak = (Rb >= m) & (Rb > threshold)
    yy = jnp.arange(H)
    xx = jnp.arange(W)
    interior = (
        (yy[:, None] >= border) & (yy[:, None] < H - border)
        & (xx[None, :] >= border) & (xx[None, :] < W - border)
    )
    score = jnp.where(is_peak & interior[None, None], Rb, -jnp.inf)
    k = min(k, S * H * W)
    vals, idx = _topk_scores(score.reshape(B, S * H * W), k)
    lvl = (idx // (H * W)).astype(jnp.int32)
    rem = idx % (H * W)
    yi = (rem // W).astype(jnp.int32)
    xi = (rem % W).astype(jnp.int32)
    valid = jnp.isfinite(vals) & (vals > threshold)

    # subpixel: 2d quadratic fit on the 3x3 neighborhood (AKAZE-equivalent;
    # integer-grid keypoints cost ~0.3px RMS measurement noise straight in
    # BA pose error)
    yc = jnp.clip(yi, 1, H - 2)
    xc = jnp.clip(xi, 1, W - 2)
    # gather from the flattened [B, S*H*W] view: a 4-d gather operand is
    # another place the layout assigner may tile-pad the small B/S dims
    Rf = Rb.reshape(B, S * H * W)
    base_idx = lvl * (H * W) + yc * W + xc

    def n(dy, dx):
        return jnp.take_along_axis(Rf, base_idx + (dy * W + dx), axis=1)

    dx = 0.5 * (n(0, 1) - n(0, -1))
    dy = 0.5 * (n(1, 0) - n(-1, 0))
    dxx = n(0, 1) + n(0, -1) - 2.0 * n(0, 0)
    dyy = n(1, 0) + n(-1, 0) - 2.0 * n(0, 0)
    dxy = 0.25 * (n(1, 1) - n(1, -1) - n(-1, 1) + n(-1, -1))
    det = dxx * dyy - dxy * dxy
    det_safe = jnp.where(jnp.abs(det) < 1e-18, 1.0, det)
    ox = -(dyy * dx - dxy * dy) / det_safe
    oy = -(dxx * dy - dxy * dx) / det_safe
    ok = (jnp.abs(det) >= 1e-18) & (jnp.abs(ox) <= 0.6) & (jnp.abs(oy) <= 0.6)
    x = (xc.astype(jnp.float32) + jnp.where(ok, ox, 0.0)) * step
    y = (yc.astype(jnp.float32) + jnp.where(ok, oy, 0.0)) * step
    return jnp.stack([x, y], axis=-1), vals, lvl, valid


@functools.partial(jax.jit, static_argnames=("max_features", "diffusion"))
def detect(images, max_features: int = 4096, threshold: float = DETECTOR_THRESHOLD,
           diffusion: str = "gaussian"):
    """Detect up to max_features keypoints per image.

    The default Gaussian path uses a DECIMATED octave pyramid: each octave
    runs at half the previous resolution, so blur kernels stay small
    (sigma_rel in [1.6, 3.2)) and per-octave work shrinks 4x — the same
    economy AKAZE's octave structure buys the reference. Responses are
    normalized with sigma_rel^4 on the decimated grid, which equals the
    absolute sigma^4-normalized response on the original grid, so
    thresholds and strengths are comparable across octaves.

    diffusion="fed" keeps the full-resolution nonlinear scale space.

    Returns dict with xy [B,K,2] (x=col, y=row, original pixels),
    strength [B,K], level [B,K] int32, sigma [B,K], valid [B,K].
    """
    images = images.astype(jnp.float32)
    B, H, W = images.shape

    if diffusion != "gaussian":
        # full-resolution nonlinear path
        L, sigmas = scale_space(images, diffusion)
        R = hessian_response(L, sigmas)
        Rb = jnp.transpose(R, (1, 0, 2, 3))
        xy, vals, lvl, valid = _candidates_from_levels(
            Rb, threshold, 16, max_features, 1.0
        )
        return dict(
            xy=xy, strength=jnp.where(valid, vals, 0.0), level=lvl,
            sigma=sigmas[lvl], valid=valid,
        )

    # ---- decimated octave pyramid ----
    all_xy, all_vals, all_sig, all_valid, all_lvl = [], [], [], [], []
    base = _blur(images, BASE_SIGMA)
    for o in range(NUM_OCTAVES):
        step = float(2**o)
        Ho, Wo = base.shape[1], base.shape[2]
        if min(Ho, Wo) < 8:
            break
        rels = [BASE_SIGMA * (2.0 ** (s / SUBLEVELS)) for s in range(SUBLEVELS)]
        Lo = _blur_levels(base, BASE_SIGMA, rels)  # [S, B, Ho, Wo]
        cur, cur_rel = Lo[-1], rels[-1]
        # normalize with sigma_rel^4 on the decimated grid == absolute
        # sigma^4-normalized response on the original grid
        Ro = hessian_response(Lo, jnp.asarray(rels, jnp.float32))
        Rb = jnp.transpose(Ro, (1, 0, 2, 3))
        border = max(2, int(round(16 / step)))
        k_oct = max(128, max_features // (2**o))
        xy, vals, lvl, valid = _candidates_from_levels(
            Rb, threshold, border, k_oct, step
        )
        sig = jnp.asarray(rels, jnp.float32)[lvl] * step  # absolute sigma
        all_xy.append(xy)
        all_vals.append(vals)
        all_sig.append(sig)
        all_valid.append(valid)
        # global level index o*SUBLEVELS+s (the reference keypoint's
        # class_id/octave, cv::KeyPoint in extract_features.cpp)
        all_lvl.append(lvl + o * SUBLEVELS)
        # next octave base: blur to 2*BASE then decimate
        nxt = _blur(cur, math.sqrt((2 * BASE_SIGMA) ** 2 - cur_rel**2))
        base = nxt[:, ::2, ::2]

    xy = jnp.concatenate(all_xy, axis=1)
    vals = jnp.concatenate(all_vals, axis=1)
    sig = jnp.concatenate(all_sig, axis=1)
    valid = jnp.concatenate(all_valid, axis=1)
    lvl = jnp.concatenate(all_lvl, axis=1)
    score = jnp.where(valid, vals, -jnp.inf)
    top_vals, top_idx = jax.lax.top_k(score, min(max_features, score.shape[1]))
    take = lambda a: jnp.take_along_axis(a, top_idx, axis=1)
    xy = jnp.take_along_axis(xy, top_idx[..., None].repeat(2, -1), axis=1)
    return dict(
        xy=xy,
        strength=jnp.where(jnp.isfinite(top_vals), top_vals, 0.0),
        level=take(lvl),
        sigma=take(sig),
        valid=jnp.isfinite(top_vals) & (top_vals > threshold),
    )


def _bilinear(img, x, y):
    """Sample img [H, W] at float coords (clamped)."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def _mldb_cell_centers():
    """Cell centers for the 2x2 / 3x3 / 4x4 MLDB grids in the unit patch
    frame [-1, 1]^2, plus the pair index lists."""
    centers = []
    pairs = []
    offset = 0
    for g in (2, 3, 4):
        step = 2.0 / g
        for i in range(g):
            for j in range(g):
                centers.append(
                    (-1.0 + (i + 0.5) * step, -1.0 + (j + 0.5) * step)
                )
        n = g * g
        for a in range(n):
            for b in range(a + 1, n):
                pairs.append((offset + a, offset + b))
        offset += n
    return (
        jnp.asarray(centers, jnp.float32),  # [29, 2]
        jnp.asarray(pairs, jnp.int32),  # [162, 2]
    )


_CELL_CENTERS, _CELL_PAIRS = _mldb_cell_centers()
PATCH_RADIUS_SIGMAS = 10.0  # patch half-size in units of keypoint sigma


def describe(images, det, patch_scale: float = PATCH_RADIUS_SIGMAS):
    """Compute oriented MLDB-style 486-bit descriptors.

    images: [B, H, W]; det: output of detect().
    Returns (descriptors [B, K, 16] uint32, angle [B, K]).
    """
    images = images.astype(jnp.float32)
    L1 = _blur(images, 1.0)
    g = _conv3_multi(L1[:, None], jnp.stack([_DX, _DY])[:, None])
    Lx, Ly = g[:, 0], g[:, 1]
    # one stacked field sampled via flat linear-index takes: every tap
    # gathers (raw, Lx, Ly) as one contiguous 3-vector and the whole
    # keypoint batch shares four vectorized takes per sample set — gathers
    # are the cost driver of description on TPU (measured 146 -> 119 ms
    # for 24x1024 keypoints vs per-keypoint nested-vmap bilinear)
    F = jnp.stack([images, Lx, Ly], axis=-1)  # [B, H, W, 3]
    B, H, W, _ = F.shape
    ori_offs = jnp.asarray(
        [[0.0, 0], [1.0, 0], [-1.0, 0], [0.0, 1], [0.0, -1],
         [0.7, 0.7], [-0.7, 0.7], [0.7, -0.7], [-0.7, -0.7]],
        jnp.float32,
    )

    def per_image(fld, xy, sigma):
        flat = fld.reshape(H * W, 3)

        def sample(xs, ys):  # [K, S] coords -> [K, S, 3]
            xs = jnp.clip(xs, 0.0, W - 1.001)
            ys = jnp.clip(ys, 0.0, H - 1.001)
            x0 = jnp.floor(xs).astype(jnp.int32)
            y0 = jnp.floor(ys).astype(jnp.int32)
            fx = (xs - x0)[..., None]
            fy = (ys - y0)[..., None]
            i00 = y0 * W + x0
            v00 = jnp.take(flat, i00, axis=0)
            v01 = jnp.take(flat, i00 + 1, axis=0)
            v10 = jnp.take(flat, i00 + W, axis=0)
            v11 = jnp.take(flat, i00 + W + 1, axis=0)
            return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
                    + v10 * (1 - fx) * fy + v11 * fx * fy)

        # orientation: blurred gradient summed over a small disc
        r = sigma[:, None] * 3.0
        g = sample(xy[:, :1] + ori_offs[None, :, 0] * r,
                   xy[:, 1:2] + ori_offs[None, :, 1] * r)
        angle = jnp.arctan2(g[..., 2].sum(-1), g[..., 1].sum(-1))
        ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]

        half = (sigma * patch_scale * 0.5)[:, None]
        cx = _CELL_CENTERS[None, :, 0] * half
        cy = _CELL_CENTERS[None, :, 1] * half
        rx = xy[:, :1] + ca * cx - sa * cy
        ry = xy[:, 1:2] + sa * cx + ca * cy
        v = sample(rx, ry)  # [K, 29, 3]
        vL, vx, vy = v[..., 0], v[..., 1], v[..., 2]
        # rotate gradients into the keypoint frame
        vxr = ca * vx + sa * vy
        vyr = -sa * vx + ca * vy

        a_idx = _CELL_PAIRS[:, 0]
        b_idx = _CELL_PAIRS[:, 1]
        bits = jnp.concatenate(
            [
                vL[:, a_idx] > vL[:, b_idx],
                vxr[:, a_idx] > vxr[:, b_idx],
                vyr[:, a_idx] > vyr[:, b_idx],
            ],
            axis=1,
        )  # [K, 486]
        return bits, angle

    bits, angle = jax.vmap(per_image)(F, det["xy"], det["sigma"])
    return pack_bits(bits), angle


@functools.partial(jax.jit, static_argnames=("max_features", "diffusion"))
def extract_features(images, max_features: int = 4096, diffusion: str = "gaussian",
                     threshold: float = DETECTOR_THRESHOLD):
    """Full extraction: detect + describe. [B, H, W] float in [0, 1].

    Returns dict(xy, strength, sigma, valid, angle, descriptors[uint32]).
    The sparse/dense split of the reference (extract_features.cpp:62-83) is
    a downstream masked selection via ops.spatial.nms_radius +
    top_k_by_strength; a lower `threshold` + larger `max_features` yields
    the dense sets consumed by densification (dense_stereo.cpp:50-54).
    """
    # accept uint8 batches: the host pipeline ships images to the device
    # as uint8 (4x less host->HBM traffic) and normalizes here, inside
    # the jitted program, where the convert fuses into the first blur
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    det = detect(images, max_features=max_features, diffusion=diffusion,
                 threshold=threshold)
    desc, angle = describe(images, det)
    return dict(
        xy=det["xy"],
        strength=det["strength"],
        sigma=det["sigma"],
        level=det["level"],
        valid=det["valid"],
        angle=angle,
        descriptors=desc,
    )
