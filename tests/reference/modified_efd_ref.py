"""Trusted numpy oracle for the modified (flipped-domain) EFD semantics
(written fresh from the behavioral notes; mirrors
/root/reference/modified_efd.py).

Deliberate deltas, matching the port's documented conventions:
* descending sorts use reversed-stable tie order (the reference's
  unstable quicksort tie order is platform-dependent; test signals avoid
  ties);
* the ``n_req == 1`` special branch is omitted (the reference's own
  return statement reads an unassigned name there and would crash).
"""
from __future__ import annotations

import numpy as np


def _maxima(x: np.ndarray) -> np.ndarray:
    """detect_peaks(-x) of the reference == plateau-rightmost maxima of x,
    endpoints excluded."""
    dx = np.diff(x)
    dxf = np.concatenate([dx, [0.0]])
    dxb = np.concatenate([[0.0], dx])
    m = (dxb >= 0) & (dxf < 0)
    m[0] = m[-1] = False
    return np.where(m)[0]


def segm_tec(x: np.ndarray, n_req: int):
    """modified_efd.py:60-105.  Returns (bounds, count, strength_order)."""
    zbounds = np.zeros(n_req + 3, dtype=np.int64)
    ind = _maxima(x)
    if ind.size < 4:
        return zbounds, 0, zbounds
    order = np.argsort(x[ind], kind="stable")[::-1]
    kept = np.sort(ind[order][:n_req])
    m = kept.size

    bounds = np.zeros(m + 3, dtype=np.int64)
    bounds[1] = int(np.argmin(x[: kept[0]]))
    for i in range(m - 1):
        # NO -1 offset (unlike EFD.py's segm_tec)
        bounds[i + 2] = kept[i] + int(np.argmin(x[kept[i] : kept[i + 1]]))
    bounds[-2] = kept[-1] + int(np.argmin(x[kept[-1] :]))
    bounds[-1] = x.size
    sort = np.argsort(x[kept], kind="stable")[::-1]
    return bounds, m, sort


def _band(robust: np.ndarray, lo: int, hi: int) -> np.ndarray:
    """modified_efd.py:119-124 band slice: plain numpy negative-index
    slicing, so lo == 0 gives an EMPTY mirror (z[-hi:-0])."""
    z = np.zeros_like(robust)
    z[lo:hi] = robust[lo:hi]
    z[-hi : -lo if lo else 0] = robust[-hi : -lo if lo else 0]
    return np.fft.rfft(z).real


def efd_real(row: np.ndarray, n_req: int):
    """modified_efd.py:111-128; returns (bands list, count, sort)."""
    robust = np.fft.irfft(row)
    bounds, count, sort = segm_tec(robust[: robust.size // 2], n_req)
    bands = [
        _band(robust, int(bounds[i]), int(bounds[i + 1]))
        for i in range(count + 2)
    ]
    return bands, count, sort


def efd_slice_max(row: np.ndarray, n_req: int):
    """modified_efd.py:144-160; count == 0 returns the row unchanged."""
    robust = np.fft.irfft(row)
    bounds, count, sort = segm_tec(robust[: robust.size // 2], n_req)
    if count == 0:
        return np.asarray(row, np.float64)
    s = int(sort[0])
    return _band(robust, int(bounds[s + 1]), int(bounds[s + 2]))
