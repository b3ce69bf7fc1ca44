"""Persistent XLA compilation cache.

The pipeline compiles a bounded-but-large family of LM/extraction/link
modules (shapes are bucketed, so the family repeats across runs). A cold
multi-tier calibration pays several minutes of XLA compilation; with the
persistent cache every later run — and every REPEAT iteration of a state
in the same run — loads the compiled executable from disk instead.

The reference has no equivalent (C++ is ahead-of-time compiled); this is
the XLA-model counterpart of simply shipping compiled code.

Enabled automatically on package import (see opencalibration_tpu.__init__)
unless OC_TPU_COMPILE_CACHE=0. Default directory: $OC_TPU_COMPILE_CACHE_DIR,
else <repo>/.jax_cache next to the package.
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_compilation_cache(path: str | None = None) -> str | None:
    """Point jax at an on-disk compilation cache. Idempotent; returns the
    cache directory, or None when disabled via OC_TPU_COMPILE_CACHE=0."""
    global _enabled
    if os.environ.get("OC_TPU_COMPILE_CACHE", "1") == "0":
        return None
    # XLA:CPU persistent entries are AOT artifacts stamped with compile-time
    # machine features; reloading them trips feature-mismatch errors (and
    # risks SIGILL) even on the same host. The win this cache targets is the
    # TPU tier-compile stall, so only enable it for accelerator platforms.
    plat = os.environ.get("JAX_PLATFORMS", "").strip().lower()
    if not plat:
        # the platform may have been set by jax.config.update rather than
        # the env var (bench.py's device-failure CPU fallback does this)
        try:
            import jax

            plat = (jax.config.jax_platforms or "").strip().lower()
        except Exception:
            plat = ""
    if plat.split(",")[0] == "cpu":
        return None
    if path is None:
        path = os.environ.get("OC_TPU_COMPILE_CACHE_DIR")
    if path is None:
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(__file__)))
        path = os.path.join(pkg_root, ".jax_cache")
    if _enabled:
        return path
    import hashlib

    import jax

    # partition by environment signature: XLA:CPU executables are AOT
    # artifacts whose embedded machine/tuning features follow the process
    # configuration (platform selection, XLA flags) — one shared directory
    # across configurations produces load-time feature mismatches
    sig = hashlib.md5(
        "|".join(
            (
                os.environ.get("JAX_PLATFORMS", ""),
                os.environ.get("XLA_FLAGS", ""),
                os.environ.get("JAX_ENABLE_X64", ""),
                jax.__version__,
            )
        ).encode()
    ).hexdigest()[:10]
    path = os.path.join(path, sig)

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # LM solver modules compile in 1-30s each; cache everything that
        # takes noticeable time, skip trivial op-by-op modules
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _enabled = True
    except (OSError, AttributeError):
        return None
    return path
