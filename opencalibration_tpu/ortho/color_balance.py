"""Radiometric color-balance solve.

Re-implements reference src/ortho/color_balance.cpp:20-227 +
radiometric_cost.hpp:21-200: per-image Lab offsets, BRDF view-angle
coefficient and directional slope, per-camera-model vignetting polynomial,
fitted to Lab correspondences sampled at orthomosaic layer overlaps, with
Huber(5) robustness, count-scaled priors, and SVD plane-fit detrending of
the offsets against camera xy (gauge fix).

The residual model is LINEAR in every parameter, so instead of Ceres the
solve is an IRLS-weighted linear least squares: a handful of dense normal
equation assemblies + Cholesky solves in jnp.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

HUBER_DELTA = 5.0  # reference color_balance.cpp:79
PRIOR_WEIGHT = 0.1  # count-scaled priors, color_balance.cpp:109-143


@dataclasses.dataclass
class ColorCorrespondence:
    """reference ortho/color_balance.hpp ColorCorrespondence."""

    camera_id_a: int
    camera_id_b: int
    model_id_a: int
    model_id_b: int
    lab_a: np.ndarray  # [3]
    lab_b: np.ndarray
    normalized_radius_a: float
    normalized_radius_b: float
    view_angle_a: float
    view_angle_b: float
    normalized_x_a: float
    normalized_y_a: float
    normalized_x_b: float
    normalized_y_b: float


@dataclasses.dataclass
class RadiometricParams:
    lab_offset: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    brdf_coeff: float = 0.0
    slope: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(2))


@dataclasses.dataclass
class ColorBalanceResult:
    per_image_params: Dict[int, RadiometricParams] = dataclasses.field(default_factory=dict)
    per_model_vignetting: Dict[int, np.ndarray] = dataclasses.field(default_factory=dict)
    success: bool = False
    final_cost: float = 0.0


def _l_correction(params_row, vig, r, theta, nx, ny):
    """L-channel correction terms given a camera's 6-param row + vig[3]."""
    r2 = r * r
    return (
        vig[0] * r2 + vig[1] * r2**2 + vig[2] * r2**3
        + params_row[3] * theta * theta
        + params_row[4] * nx + params_row[5] * ny
    )


def solve_color_balance(
    correspondences,
    camera_positions: Optional[Dict[int, np.ndarray]] = None,
    irls_iterations: int = 5,
) -> ColorBalanceResult:
    result = ColorBalanceResult()
    if not correspondences:
        return result

    cam_ids = sorted(
        {c.camera_id_a for c in correspondences} | {c.camera_id_b for c in correspondences}
    )
    model_ids = sorted(
        {c.model_id_a for c in correspondences} | {c.model_id_b for c in correspondences}
    )
    cam_slot = {cid: i for i, cid in enumerate(cam_ids)}
    model_slot = {mid: i for i, mid in enumerate(model_ids)}
    NC, NM = len(cam_ids), len(model_ids)
    # layout: per camera [L_off, a_off, b_off, brdf, slope_x, slope_y] then
    # per model [vig1, vig2, vig3]
    T = 6 * NC + 3 * NM

    n = len(correspondences)
    # Build the (sparse-by-rows) design matrix densely: each correspondence
    # contributes 3 residual rows touching <= 15 columns.
    rows = []
    rhs = []
    cam_count = np.zeros(NC)
    model_count = np.zeros(NM)
    for c in correspondences:
        ia, ib = cam_slot[c.camera_id_a], cam_slot[c.camera_id_b]
        ma, mb = model_slot[c.model_id_a], model_slot[c.model_id_b]
        cam_count[ia] += 1
        cam_count[ib] += 1
        model_count[ma] += 1
        model_count[mb] += 1
        r2a, r2b = c.normalized_radius_a**2, c.normalized_radius_b**2
        for ch in range(3):
            row = np.zeros(T)
            row[6 * ia + ch] = -1.0
            row[6 * ib + ch] = 1.0
            if ch == 0:
                row[6 * ia + 3] = -c.view_angle_a**2
                row[6 * ib + 3] = c.view_angle_b**2
                row[6 * ia + 4] = -c.normalized_x_a
                row[6 * ia + 5] = -c.normalized_y_a
                row[6 * ib + 4] = c.normalized_x_b
                row[6 * ib + 5] = c.normalized_y_b
                row[6 * NC + 3 * ma + 0] += -r2a
                row[6 * NC + 3 * ma + 1] += -(r2a**2)
                row[6 * NC + 3 * ma + 2] += -(r2a**3)
                row[6 * NC + 3 * mb + 0] += r2b
                row[6 * NC + 3 * mb + 1] += r2b**2
                row[6 * NC + 3 * mb + 2] += r2b**3
            rows.append(row)
            # residual = (obs_a - corr_a) - (obs_b - corr_b)
            rhs.append(float(c.lab_b[ch]) - float(c.lab_a[ch]))
    A = np.asarray(rows)
    b = np.asarray(rhs)  # solve A p ~= rhs: off_b - off_a = obs_b - obs_a

    # count-scaled priors pulling every parameter to 0
    prior_rows, prior_rhs = [], []
    for i in range(NC):
        s = PRIOR_WEIGHT * np.sqrt(max(1.0, cam_count[i]))
        for k in range(6):
            row = np.zeros(T)
            row[6 * i + k] = s
            prior_rows.append(row)
            prior_rhs.append(0.0)
    for m in range(NM):
        s = PRIOR_WEIGHT * np.sqrt(max(1.0, model_count[m]))
        for k in range(3):
            row = np.zeros(T)
            row[6 * NC + 3 * m + k] = s
            prior_rows.append(row)
            prior_rhs.append(0.0)
    Ap = np.concatenate([A, np.asarray(prior_rows)])
    bp = np.concatenate([b, np.asarray(prior_rhs)])

    Aj = jnp.asarray(Ap)
    bj = jnp.asarray(bp)
    w = jnp.ones(len(bp))
    p = jnp.zeros(T)
    n_data = len(b)
    for _ in range(irls_iterations):
        Aw = Aj * w[:, None]
        H = Aw.T @ Aj + 1e-9 * jnp.eye(T)
        g = Aw.T @ bj
        p = jnp.linalg.solve(H, g)
        r = Aj @ p - bj
        # Huber IRLS weights on the data rows only
        absr = jnp.abs(r[:n_data])
        w_data = jnp.where(absr <= HUBER_DELTA, 1.0, HUBER_DELTA / jnp.maximum(absr, 1e-9))
        w = w.at[:n_data].set(w_data)

    p = np.asarray(p)
    r = np.asarray(Aj @ jnp.asarray(p) - bj)
    result.final_cost = float(0.5 * np.sum(r**2))
    result.success = True

    for cid, i in cam_slot.items():
        result.per_image_params[cid] = RadiometricParams(
            lab_offset=p[6 * i : 6 * i + 3].copy(),
            brdf_coeff=float(p[6 * i + 3]),
            slope=p[6 * i + 4 : 6 * i + 6].copy(),
        )
    for mid, m in model_slot.items():
        result.per_model_vignetting[mid] = p[6 * NC + 3 * m : 6 * NC + 3 * m + 3].copy()

    # gauge fix: SVD plane-fit detrend of offsets vs camera xy
    # (reference color_balance.cpp:163-216)
    if camera_positions:
        order = [cid for cid in cam_ids if cid in camera_positions]
        if len(order) >= 3:
            Axy = np.stack(
                [
                    [camera_positions[cid][0], camera_positions[cid][1], 1.0]
                    for cid in order
                ]
            )
            for ch in range(3):
                bvec = np.asarray(
                    [result.per_image_params[cid].lab_offset[ch] for cid in order]
                )
                plane, *_ = np.linalg.lstsq(Axy, bvec, rcond=None)
                for cid in order:
                    fitted = (
                        plane[0] * camera_positions[cid][0]
                        + plane[1] * camera_positions[cid][1]
                        + plane[2]
                    )
                    result.per_image_params[cid].lab_offset[ch] -= fitted
    return result


def apply_correction(lab, params: RadiometricParams, vig, r, theta, nx, ny):
    """Apply a solved correction to Lab samples (the blend pass's
    per-sample correction, reference ortho.cpp:1839-1875)."""
    lab = np.asarray(lab, np.float64).copy()
    lab -= params.lab_offset
    r2 = r * r
    lab[..., 0] -= (
        vig[0] * r2 + vig[1] * r2**2 + vig[2] * r2**3
        + params.brdf_coeff * theta * theta
        + params.slope[0] * nx + params.slope[1] * ny
    )
    return lab
