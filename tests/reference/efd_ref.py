"""Trusted numpy oracle for the EFD segmentation + band slicing semantics
(written fresh from the behavioral notes; mirrors /root/reference/EFD.py)."""
from __future__ import annotations

import numpy as np


def segments(f: np.ndarray, n_req: int):
    n = f.size
    dx = np.diff(f)
    dxf = np.concatenate([dx, [0.0]])
    dxb = np.concatenate([[0.0], dx])
    peak = (dxf <= 0) & (dxb > 0)
    if peak.sum() < 2:
        # EFD.py:29: a 2-element bounds stub whose size<3 makes EFD
        # return the input unchanged
        return None, None, 0
    locmax = np.where(peak, f, 0.0)
    locmax[0] = 0.0
    locmax[-1] = 0.0

    order = np.argsort(locmax, kind="stable")[::-1]
    for r in range(1, order.size - 1):
        if order[r] - 1 == order[r + 1] or order[r] + 1 == order[r + 1]:
            locmax[order[r]] = 0.0
    kept = [i for i in order if locmax[i] > 0.0][:n_req]
    kept = np.sort(np.asarray(kept, dtype=np.int64))
    m = kept.size

    bounds = np.zeros(m + 3, dtype=np.int64)
    bounds[1] = int(np.argmin(f[0 : kept[0]]))
    for i in range(m - 1):
        bounds[i + 2] = kept[i] + int(np.argmin(f[kept[i] : kept[i + 1]])) - 1
    bounds[-2] = kept[-1] + int(np.argmin(f[kept[-1] :])) - 1
    bounds[-1] = n
    cerf = kept * np.pi / round(n)
    return bounds, cerf, m


def efd(x: np.ndarray, n_req: int):
    x = np.asarray(x, np.float64)
    n = x.size
    ff = np.fft.rfft(x)
    half = round(ff.size / 2)
    bounds, cerf, m = segments(np.abs(ff[:half]), n_req)
    if bounds is None:  # EFD.py:81 'if bounds.size < 3: return x'
        return x[None, :], np.zeros(0), np.zeros(0), None
    bn = bounds * np.pi / round(ff.size / 2)

    l = round(n / 2)
    z = np.pad(x, (l, l), "symmetric")
    ffz = np.fft.rfft(z)
    # exact integer ceil (see efd.py docstring: the reference's float-pi
    # round trip is roundoff-sensitive at integer-exact bounds)
    half1 = round(ff.size / 2)
    half2 = round(ffz.size / 2)
    b2 = (bounds * half2 + (half1 - 1)) // half1

    bands = np.zeros((b2.size - 1, n))
    for k in range(b2.size - 1):
        ft = np.zeros(ffz.size, dtype=np.complex128)
        lo, hi = b2[k], b2[k + 1]
        if lo == 0:
            ft[0:hi] = ffz[0:hi]
            if hi > 0:
                ft[ffz.size - hi :] = ffz[ffz.size - hi :]
        else:
            ft[lo:hi] = ffz[lo:hi]
            if hi > lo:
                ft[ffz.size - hi : ffz.size - lo] = ffz[ffz.size - hi : ffz.size - lo]
        rx = np.fft.irfft(ft, n=z.size)
        bands[k] = rx[l:-l]
    return bands, cerf, bn, m
