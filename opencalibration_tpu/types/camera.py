"""Camera model pytree.

TPU-native equivalent of the reference's templated camera structs
(reference include/opencalibration/types/camera_model.hpp:22-99).

Instead of a C++ template over scalar type + FORWARD/INVERSE tag, a
``CameraModel`` here is a registered dataclass pytree whose leaves may carry
arbitrary leading batch dimensions, so a *batch of cameras* is one pytree of
stacked arrays — the natural layout for vmapped projection kernels.

The FORWARD/INVERSE distinction (whether the stored Brown coefficients
distort or undistort) is kept as static metadata so jit specializes on it.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FORWARD = "forward"
INVERSE = "inverse"


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraModel:
    """Pinhole (planar projection) camera with Brown radial+tangential distortion.

    Array leaves (may be batched with leading dims):
      focal_length_pixels: [...]
      principal_point:     [..., 2]  (called principle_point in the reference)
      radial_distortion:   [..., 3]  (k1, k2, k3)
      tangential_distortion:[..., 2] (p1, p2)
      pixels_cols / pixels_rows: [...] image dims as float (for priors/grids)

    Static:
      tag: FORWARD (coefficients distort a projected ray) or INVERSE
           (coefficients undistort a normalized pixel), matching
           CameraModelTag in the reference.
    """

    focal_length_pixels: Any
    principal_point: Any
    radial_distortion: Any
    tangential_distortion: Any
    pixels_cols: Any
    pixels_rows: Any
    tag: str = dataclasses.field(default=FORWARD, metadata=dict(static=True))

    @staticmethod
    def create(
        focal_length_pixels: float,
        principal_point=(0.0, 0.0),
        radial_distortion=(0.0, 0.0, 0.0),
        tangential_distortion=(0.0, 0.0),
        pixels_cols: float = 0.0,
        pixels_rows: float = 0.0,
        tag: str = FORWARD,
        dtype=jnp.float32,
    ) -> "CameraModel":
        return CameraModel(
            focal_length_pixels=jnp.asarray(focal_length_pixels, dtype),
            principal_point=jnp.asarray(principal_point, dtype),
            radial_distortion=jnp.asarray(radial_distortion, dtype),
            tangential_distortion=jnp.asarray(tangential_distortion, dtype),
            pixels_cols=jnp.asarray(pixels_cols, dtype),
            pixels_rows=jnp.asarray(pixels_rows, dtype),
            tag=tag,
        )

    @property
    def dtype(self):
        return jnp.asarray(self.focal_length_pixels).dtype

    def astype(self, dtype) -> "CameraModel":
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), self)

    def with_tag(self, tag: str) -> "CameraModel":
        return dataclasses.replace(self, tag=tag)

    def replace(self, **kw) -> "CameraModel":
        return dataclasses.replace(self, **kw)

    def has_distortion(self):
        """Traced predicate: any nonzero distortion coefficient."""
        return jnp.any(self.radial_distortion != 0) | jnp.any(
            self.tangential_distortion != 0
        )


def stack_cameras(models: list[CameraModel]) -> CameraModel:
    """Stack N single cameras into one batched CameraModel pytree.

    Host callers (problem builders, ortho, tracks) pass concrete leaves;
    numpy-stack those — an eager jnp.stack costs an XLA compile per new
    batch size, which at 10k scale recurs every pipeline iterate. Traced
    leaves (inside jit) keep the jnp path."""
    if not models:
        raise ValueError("need at least one camera")
    tag = models[0].tag
    if any(m.tag != tag for m in models):
        raise ValueError("cannot stack FORWARD and INVERSE cameras")
    traced = any(
        isinstance(leaf, jax.core.Tracer)
        for m in models
        for leaf in jax.tree.leaves(m)
    )
    stack = jnp.stack if traced else (lambda xs: np.stack([np.asarray(x) for x in xs]))
    return jax.tree.map(lambda *xs: stack(xs), *models)


def take_camera(models: CameraModel, i) -> CameraModel:
    """Select camera i from a batched CameraModel (gather on every leaf)."""
    return jax.tree.map(lambda x: x[i], models)
