"""Trusted numpy oracles for the cubic baseline tiers.

`fast_baseline` follows the reference native tier
(`itd_fourier_decomposition.py:48-122`) operation-for-operation, including
its zero-padded-buffer quirks, with one defined replacement: reads of
positions beyond the signal are clamped (the reference reads out of bounds
there, which is undefined in numba).
"""
from __future__ import annotations

import numpy as np


def sine_template_knots(freq: float, sample_rate: float, duration: float):
    """Zero-crossing knot positions of a sine template: forced 0, interior
    sign flips (i in [1, n-2]), extrapolated tail (C12 semantics,
    itd_fourier_decomposition.py:16-31)."""
    t = np.arange(0, duration, 1 / sample_rate)
    s = np.sin(2 * np.pi * freq * t)
    out = [0]
    for i in range(1, s.size - 1):
        if (s[i] > 0 > s[i + 1]) or (s[i] < 0 < s[i + 1]):
            out.append(i)
    out.append(out[-1] * 2 - out[-2])
    return np.asarray(out, dtype=np.int64), len(out)


def fast_baseline(x: np.ndarray, positions: np.ndarray, count: int) -> np.ndarray:
    n = x.size
    cap = max(count + 2, positions.size + 2)
    e = np.zeros(cap, dtype=np.int64)
    e[: positions.size] = positions
    e[count:] = 0  # zero padding is load-bearing

    def xv(i):  # clamped signal read (defined replacement for ref UB)
        return x[min(max(int(i), 0), n - 1)]

    K = np.zeros(cap)
    for k in range(1, count - 1):
        w = (e[k] - e[k - 1]) / (e[k + 1] - e[k - 1])
        K[k] = 0.5 * (xv(e[k - 1]) + w * (xv(e[k + 1]) - xv(e[k - 1]))) + 0.5 * xv(e[k])
    K[0] = xv(e[0])
    K[count] = xv(e[count])  # e[count] == 0 -> x[0]

    h = np.zeros(cap)
    for i in range(count):
        h[i] = e[i + 1] - e[i]

    u = np.zeros(cap)
    v = np.zeros(cap)
    b = np.zeros(cap)
    for i in range(1, count):
        u[i] = h[i - 1] / (h[i - 1] + h[i])
        v[i] = 1.0 - u[i]
        b[i] = 6.0 * ((K[i + 1] - K[i]) / h[i] - (K[i] - K[i - 1]) / h[i - 1]) / (h[i - 1] + h[i])
    for i in range(1, count):
        d = 2.0 - u[i] * v[i - 1]
        b[i] = (b[i] - u[i] * b[i - 1]) / d
        u[i] = u[i] / d
    for i in range(count - 2, -1, -1):
        b[i] = b[i] - v[i] * b[i + 1]
    b[0] = 0.0
    b[count - 1] = 0.0

    baseline = np.zeros(n)
    j = 0
    for i in range(n):
        while j < count - 1 and e[j + 1] <= i:
            j += 1
        s = (i - e[j]) / h[j]
        lin = (1 - s) * K[j] + s * K[j + 1]
        if j == count - 2:
            baseline[i] = lin
        else:
            baseline[i] = lin + h[j] ** 2 / 6.0 * (
                ((1 - s) ** 3 - 1 + s) * b[j] + (s**3 - s) * b[j + 1]
            )
    return baseline
