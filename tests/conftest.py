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
