"""ctypes bindings for the native real-time tier (pyitd_tpu/native).

The native library is the C++ equivalent of the reference's real-time layer
(``itd.cpp`` streaming baseline extraction with extrema reuse,
``modpool.c`` thread-pool batch runner).  It is built on first use with the
repo Makefile; if no compiler is available the import still succeeds and
:func:`native_available` reports False.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = [
    "native_available",
    "baseline_extract",
    "baseline_extract_iq",
    "StreamingITD",
    "NativePool",
]

_DIR = Path(__file__).parent / "native"
_LIB_PATH = _DIR / "libpyitd_native.so"
_lib = None
_build_error: str | None = None


def _load():
    global _lib, _build_error
    if _lib is not None or _build_error is not None:
        return _lib
    try:
        if not _LIB_PATH.exists():
            subprocess.run(
                ["make", "-C", str(_DIR)], check=True, capture_output=True
            )
        lib = ctypes.CDLL(str(_LIB_PATH))
    except Exception as e:  # pragma: no cover - no toolchain
        _build_error = str(e)
        return None

    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.pyitd_baseline_extract.argtypes = [dp, dp, ctypes.c_int, ip, ip, ctypes.c_int]
    lib.pyitd_baseline_extract_iq.argtypes = [dp, dp, dp, ctypes.c_int, ip, ip, ctypes.c_int]
    lib.pyitd_stream_new.restype = ctypes.c_void_p
    lib.pyitd_stream_new.argtypes = [ctypes.c_int]
    lib.pyitd_stream_free.argtypes = [ctypes.c_void_p]
    lib.pyitd_stream_push.restype = ctypes.c_int
    lib.pyitd_stream_push.argtypes = [ctypes.c_void_p, dp, dp, dp]
    lib.pyitd_pool_new.restype = ctypes.c_void_p
    lib.pyitd_pool_new.argtypes = [ctypes.c_int]
    lib.pyitd_pool_free.argtypes = [ctypes.c_void_p]
    lib.pyitd_pool_extract_batch.argtypes = [
        ctypes.c_void_p, dp, dp, dp, ctypes.c_int, ctypes.c_int
    ]
    lib.pyitd_pool_bench.restype = ctypes.c_double
    lib.pyitd_pool_bench.argtypes = [ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ipp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int))


def baseline_extract(data, extrema_state=None):
    """One-shot native baseline extraction.

    Returns ``(rotation, baseline, state)``.  Re-pass ``state`` with new
    data of the same length to reuse the cached extrema positions across
    channels/adjustment passes (the reference's ``compute_extrema=false``
    protocol, ``itd.cpp:41-44,58-62``)."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    x = np.ascontiguousarray(data, np.float64)
    n = x.size
    baseline = np.zeros(n)
    if extrema_state is None:
        extrema = np.zeros(n + 2, np.int32)
        count = np.zeros(1, np.int32)
        compute = 1
    else:
        extrema, count = extrema_state
        if extrema.size != n + 2:
            raise ValueError(
                f"extrema_state was built for n={extrema.size - 2}, got n={n}"
            )
        compute = 0
    lib.pyitd_baseline_extract(_dp(x), _dp(baseline), n, _ipp(extrema), _ipp(count), compute)
    return x - baseline, baseline, (extrema, count)


def baseline_extract_iq(re, im, extrema_state=None):
    """IQ (complex) variant: joint extrema, averaged-channel baseline."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native library unavailable: {_build_error}")
    re = np.ascontiguousarray(re, np.float64)
    im = np.ascontiguousarray(im, np.float64)
    if re.size != im.size:
        raise ValueError(f"re/im length mismatch: {re.size} vs {im.size}")
    n = re.size
    baseline = np.zeros(n)
    if extrema_state is None:
        extrema = np.zeros(n + 2, np.int32)
        count = np.zeros(1, np.int32)
        compute = 1
    else:
        extrema, count = extrema_state
        if extrema.size != n + 2:
            raise ValueError(
                f"extrema_state was built for n={extrema.size - 2}, got n={n}"
            )
        compute = 0
    lib.pyitd_baseline_extract_iq(_dp(re), _dp(im), _dp(baseline), n, _ipp(extrema), _ipp(count), compute)
    return baseline, (extrema, count)


class StreamingITD:
    """Hop-in, hop-out native streaming decomposer (3-hop latency)."""

    def __init__(self, hop: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_build_error}")
        self._lib = lib
        self._h = lib.pyitd_stream_new(hop)
        self.hop = hop

    def push(self, hop_samples):
        """Returns ``(rotation, baseline)`` for the inner hop, or ``None``
        while the 3-hop pipeline primes."""
        x = np.ascontiguousarray(hop_samples, np.float64)
        assert x.size == self.hop
        rot = np.zeros(self.hop)
        base = np.zeros(self.hop)
        ready = self._lib.pyitd_stream_push(self._h, _dp(x), _dp(rot), _dp(base))
        return (rot, base) if ready else None

    def close(self):
        if self._h:
            self._lib.pyitd_stream_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass


class NativePool:
    """Thread-pool batch runner (modpool.c capability)."""

    def __init__(self, nthreads: int = os.cpu_count() or 1):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native library unavailable: {_build_error}")
        self._lib = lib
        self._h = lib.pyitd_pool_new(nthreads)

    def extract_batch(self, signals):
        """Parallel baseline extraction over a (batch, n) bank; returns
        (rotations, baselines)."""
        x = np.ascontiguousarray(signals, np.float64)
        b, n = x.shape
        rot = np.zeros_like(x)
        base = np.zeros_like(x)
        self._lib.pyitd_pool_extract_batch(self._h, _dp(x), _dp(rot), _dp(base), b, n)
        return rot, base

    def bench(self, ntasks: int = 100_000, task_us: int = 10) -> float:
        """tasks/sec for ntasks dummy tasks (modpool.c:155-190 harness)."""
        return float(self._lib.pyitd_pool_bench(self._h, ntasks, task_us))

    def close(self):
        if self._h:
            self._lib.pyitd_pool_free(self._h)
            self._h = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
