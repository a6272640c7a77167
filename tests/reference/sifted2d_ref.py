"""Trusted numpy/scipy oracle for the 2-D ensemble ITD (siftED2D.ipynb
cell 1), written from SURVEY.md's behavioral notes.

The 1-D kernel is the MEITD-tier cubic baseline: plateau-rightmost extrema
knots plus both endpoints, odd-reflect end knot values, Frei-Osorio
interior knot values, an interpolating cubic spline through the knots
(``scipy.interpolate.splrep`` — the notebook's ``custom_splrep`` wraps
exactly this), and the <10-extrema pass-through guard.  ``crossways`` and
the paired-noise ensemble follow the notebook's loops with the noise
array passed IN, so the comparison against the JAX implementation is
same-noise exact (up to spline-solver roundoff).
"""
from __future__ import annotations

import numpy as np
from scipy.interpolate import splev, splrep


def _extrema_indices(x: np.ndarray) -> np.ndarray:
    """Interior extrema, plateau-rightmost (canonical mask semantics)."""
    out = []
    for i in range(1, x.size - 1):
        db = x[i] - x[i - 1]
        df = x[i + 1] - x[i]
        if (db <= 0 < df) or (db >= 0 > df):
            out.append(i)
    return np.asarray(out, dtype=np.int64)


def meitd_tier_baseline(x: np.ndarray) -> np.ndarray:
    """siftED2D cell 1 ``itd_baseline_extract`` (the cubic tier)."""
    x = np.asarray(x, np.float64)
    idx = _extrema_indices(x)
    if idx.size < 10:
        return x.copy()
    e = np.concatenate(([0], idx, [x.size - 1]))
    k = np.zeros(e.size)
    padded = np.pad(x, 1, mode="reflect", reflect_type="odd")
    k[0] = np.mean(padded[:2])
    k[-1] = np.mean(padded[-2:])
    for j in range(1, e.size - 1):
        w = (e[j] - e[j - 1]) / (e[j + 1] - e[j - 1])
        k[j] = 0.5 * (x[e[j - 1]] + w * (x[e[j + 1]] - x[e[j - 1]])) \
            + 0.5 * x[e[j]]
    tck = splrep(e.astype(np.float64), k, k=3, s=0)
    return splev(np.arange(x.size, dtype=np.float64), tck)


def crossways(data: np.ndarray) -> np.ndarray:
    """Row pass, column pass, each re-applied along the other axis,
    averaged (``crossways_itd_baseline_extract``)."""
    data = np.asarray(data, np.float64)
    lengthwise = np.stack([meitd_tier_baseline(r) for r in data])
    crosswise = np.stack(
        [meitd_tier_baseline(c) for c in data.T], axis=1
    )
    crosswise = np.stack([meitd_tier_baseline(r) for r in crosswise])
    lengthwise = np.stack(
        [meitd_tier_baseline(c) for c in lengthwise.T], axis=1
    )
    return 0.5 * (lengthwise + crosswise)


def statistical_component(data: np.ndarray, noise: np.ndarray) -> np.ndarray:
    """Paired-noise ensemble lowpass with the noise realizations passed in
    (``retrieve_statistical_image_component`` with the RNG externalized)."""
    data = np.asarray(data, np.float64)
    runs = []
    for v in np.asarray(noise, np.float64):
        runs.append(0.5 * (crossways(data + v) + crossways(data - v)))
    return np.mean(runs, axis=0)
