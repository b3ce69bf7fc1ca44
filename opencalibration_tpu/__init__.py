"""opencalibration_tpu: a TPU-native aerial-photogrammetry framework.

A ground-up re-design of the capabilities of ``jkflying/opencalibration``
(staged drone-survey pipeline: feature extraction, pairwise matching,
RANSAC model fitting, sparse bundle adjustment, surface meshing, dense
densification, orthomosaic generation) for TPU hardware:

* numeric kernels are batched, fixed-shape, jit-compiled JAX/XLA/Pallas code
* parallelism is expressed with ``jax.sharding`` over device meshes
* the host keeps IO, graph bookkeeping and the pipeline state machine

The package mirrors the reference's layer map (see SURVEY.md section 1) but
not its architecture: per-item closures become batched kernels, sequential
PROSAC becomes vectorized hypothesis sweeps, Ceres becomes a masked
Levenberg-Marquardt solver with Schur elimination in XLA.
"""

__version__ = "0.1.0"

from opencalibration_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_compilation_cache as _enable_cache,
)

_enable_cache()
del _enable_cache
