#!/usr/bin/env bash
# Local CI mirror (reference tools/ci_local.sh): bytecode check + fast
# test subset on a virtual 8-device CPU mesh. No network required.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== compileall =="
python -m compileall -q opencalibration_tpu/ apps/ tests/ bench.py

echo "== fast tests (virtual 8-device CPU mesh) =="
# heavy full-pipeline/device modules carry @pytest.mark.slow; the full
# suite (including them) is the CI leg: python -m pytest tests/ -q
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -m pytest tests/ -q -x -m "not slow"

echo "== OK =="
