"""Test configuration: force an 8-device virtual CPU mesh.

Mirrors the multi-chip testing strategy required for TPU sharding code:
tests validate jax.sharding.Mesh paths on host CPU devices. The driver's
bench/dryrun entry points run on real TPU hardware separately.
"""

import os

# Must be set before jax initializes its backends. Note: the environment may
# pre-register a TPU platform at interpreter startup (sitecustomize), so the
# jax.config update below is the authoritative override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Enable x64 so parity tests can compare against float64 ground truth.
# Library code is dtype-polymorphic; TPU runs stay in float32/bfloat16.
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules — the pipeline-level
    modules each compile large LM/extraction programs and the accumulated
    jit cache can exhaust host memory over a full-suite run."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def calibrated_pipeline_session(tmp_path_factory):
    """One calibrated 2x2 synthetic survey shared by every downstream-stage
    test file (ortho, dense, ...) — running the full pipeline once instead
    of once per module."""
    from opencalibration_tpu.pipeline.pipeline import Pipeline
    from tests.synthetic_survey import write_survey

    tmpdir = str(tmp_path_factory.mktemp("shared_survey"))
    paths, positions, quats = write_survey(tmpdir, rows=2, cols=2)
    p = Pipeline(batch_size=4)
    p.skip_camera_param_relax = True
    p.add(paths)
    p.run_to_completion(max_iterations=60)
    p._ground_truth = (paths, positions, quats)
    return p
