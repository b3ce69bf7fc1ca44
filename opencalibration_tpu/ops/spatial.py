"""Spatial feature selection kernels (masked, fixed-shape).

TPU-native replacements for the reference's sequential KD-tree passes:

* ``spatial_subsample``  — replaces the greedy strength-sorted min-spacing
  selection of reference src/match/match_features.cpp:8-52 (used with
  40px spacing by the link stage, reference src/pipeline/link_stage.cpp:63).
  The mechanism differs (strongest-per-grid-cell instead of a sequential
  KD-tree radius test) but preserves the contract: a deterministic,
  spatially spread subset biased to the strongest features, with minimum
  spacing on the order of ``spacing_pixels``.

* ``nms_radius`` — replaces the KD-tree non-maximum suppression of
  reference src/extract/extract_features.cpp:62-83 (radius 8px): keeps a
  feature iff it is the strongest within its neighborhood, evaluated on a
  grid with a one-cell halo so the radius test is exact up to cell
  quantization.

Both are pure functions of fixed-shape arrays + validity masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _cell_ids(xy, spacing, n_cells_x: int, n_cells_y: int):
    cx = jnp.clip((xy[:, 0] / spacing).astype(jnp.int32), 0, n_cells_x - 1)
    cy = jnp.clip((xy[:, 1] / spacing).astype(jnp.int32), 0, n_cells_y - 1)
    return cy * n_cells_x + cx


@functools.partial(jax.jit, static_argnames=("n_cells_x", "n_cells_y"))
def spatial_subsample(xy, strength, valid, spacing, n_cells_x: int, n_cells_y: int):
    """Keep the strongest valid feature per spacing x spacing grid cell.

    Args:
      xy: [N, 2] pixel locations; strength: [N]; valid: [N] bool.
      spacing: cell size in pixels (traced scalar ok).
      n_cells_x/y: static grid dims (ceil(image_dim / spacing) upper bound).
    Returns:
      keep: [N] bool mask of selected features.
    """
    n = xy.shape[0]
    num_cells = n_cells_x * n_cells_y
    cells = _cell_ids(xy, spacing, n_cells_x, n_cells_y)
    # deterministic tie-break: higher strength wins, then lower index
    idx = jnp.arange(n, dtype=jnp.int32)
    s = jnp.where(valid, strength, -jnp.inf)
    # combined key: strength major, -index minor (strictly monotonic in both)
    key = s.astype(jnp.float64) * jnp.float64(n + 1) - idx.astype(jnp.float64)
    cell_max = jax.ops.segment_max(key, cells, num_segments=num_cells)
    keep = valid & (key == cell_max[cells])
    return keep


@functools.partial(jax.jit, static_argnames=("n_cells_x", "n_cells_y"))
def nms_radius(xy, strength, valid, radius, n_cells_x: int, n_cells_y: int):
    """Radius non-maximum suppression on a grid with 3x3-cell halo.

    A feature survives iff no strictly-better feature lies within `radius`
    pixels. Cell size = radius, so all candidates within the radius live in
    the 3x3 cell neighborhood; exact distance is then checked against the
    per-cell best candidates.
    """
    n = xy.shape[0]
    num_cells = n_cells_x * n_cells_y
    cells = _cell_ids(xy, radius, n_cells_x, n_cells_y)
    idx = jnp.arange(n, dtype=jnp.int32)
    s = jnp.where(valid, strength, -jnp.inf)
    key = s.astype(jnp.float64) * jnp.float64(n + 1) - idx.astype(jnp.float64)

    # best key + location per cell
    cell_best = jax.ops.segment_max(key, cells, num_segments=num_cells)
    # argmax per cell: feature whose key equals the cell max
    is_cell_best = key == cell_best[cells]
    big = jnp.float64(-jnp.inf)
    # per-cell best coordinates via masked segment_max on x and y encoded with key
    bx = jax.ops.segment_max(
        jnp.where(is_cell_best, xy[:, 0], -jnp.inf), cells, num_segments=num_cells
    )
    by = jax.ops.segment_max(
        jnp.where(is_cell_best, xy[:, 1], -jnp.inf), cells, num_segments=num_cells
    )

    cx = cells % n_cells_x
    cy = cells // n_cells_x

    survives = valid
    r2 = radius * radius
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nx = jnp.clip(cx + dx, 0, n_cells_x - 1)
            ny = jnp.clip(cy + dy, 0, n_cells_y - 1)
            ncell = ny * n_cells_x + nx
            nkey = cell_best[ncell]
            dxy = xy - jnp.stack([bx[ncell], by[ncell]], axis=-1)
            within = jnp.sum(dxy * dxy, axis=-1) <= r2
            better = nkey > key
            survives = survives & ~(within & better & jnp.isfinite(nkey))
    return survives


def top_k_by_strength(strength, valid, k: int):
    """Indices of the k strongest valid features (deterministic, padded).

    Returns (indices [k], mask [k]) — mask False where fewer than k valid.
    """
    s = jnp.where(valid, strength, -jnp.inf)
    vals, idx = jax.lax.top_k(s, k)
    return idx.astype(jnp.int32), jnp.isfinite(vals)
