"""Test configuration: force a virtual 8-device CPU mesh and 64-bit mode.

PLATFORM-WA(relay-init): the backend re-point + clear_backends below is the
working recipe for a dead relay (docs/PLATFORM.md).

The session environment pins ``JAX_PLATFORMS=axon`` (a remote TPU reached
through a relay) and a sitecustomize module imports jax and initializes that
backend before any test code runs.  Running thousands of tiny test ops over
that relay takes minutes per compile, so tests re-point jax at the local CPU
backend with 8 virtual devices (the sharding tests need a mesh) and clear the
already-initialized backends.  The benchmark (bench.py) is what runs on the
real chip.
"""
import os

# silence the benign per-load AOT-cache machine-feature warnings
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

# PYITD_ONCHIP_TESTS=1 keeps the session's real TPU attachment so the
# opt-in parity gates in test_onchip.py can run on the chip; everything
# else in the suite is skipped in that mode (see test_onchip.py docstring).
_ONCHIP = os.environ.get("PYITD_ONCHIP_TESTS") == "1"

if not _ONCHIP:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if not _ONCHIP:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    try:  # drop any backend sitecustomize already initialized (remote TPU)
        import jax.extend.backend as _jeb

        _jeb.clear_backends()
    except Exception:  # pragma: no cover - best effort
        pass

    assert jax.devices()[0].platform == "cpu", jax.devices()

# Persistent compilation cache: most suite wall-clock is jit compilation of
# the same graphs every run; cache them on disk (keyed by HLO hash, so code
# changes invalidate naturally).  First run populates, repeat runs fly.
_cache = os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - older jax
    pass

import sys

sys.path.insert(0, os.path.dirname(__file__))
