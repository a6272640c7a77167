"""Ensemble-selection statistics (``/root/reference/helperfunctions.py``).

The noise-assisted workflows run many realizations and pick the median
outcome: ``fingerprint`` reduces an array to a perceptual scalar (haar
detail -> DCT -> sum / Γ-ppf constant), ``sorted_median_index`` returns the
index of the realization nearest the mean of the sorted fingerprints plus a
"completeness" score (correlation of the sorted distribution against a
logit ramp; believe the median when completeness > 0.95).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["fingerprint", "sorted_median_index"]

_SQ2 = float(np.sqrt(2.0))


def _haar_split(x: jax.Array):
    """Single-level haar DWT along the last axis (pywt convention: symmetric
    odd-length handling via edge duplication)."""
    n = x.shape[-1]
    if n % 2 == 1:
        x = jnp.concatenate([x, x[..., -1:]], axis=-1)
    a = (x[..., 0::2] + x[..., 1::2]) / _SQ2
    d = (x[..., 0::2] - x[..., 1::2]) / _SQ2
    return a, d


def fingerprint(data: jax.Array) -> jax.Array:
    """helperfunctions.py:11-16: haar dwtn -> flatten all subbands -> DCT ->
    sum / 0.6616518484657332."""
    x = jnp.asarray(data, jnp.float64)
    if x.ndim == 1:
        a, d = _haar_split(x)
        coeff = jnp.concatenate([a, d])
    elif x.ndim == 2:
        # pywt.dwtn key order is aa, ad, da, dd with the FIRST letter on
        # axis 0 — splitting axis 1 first means our second split's detail
        # output is pywt's 'da', so the middle bands must be concatenated
        # swapped relative to the local variable order
        a, d = _haar_split(x)          # along axis 1: a=*a, d=*d
        aa, da_ = _haar_split(jnp.moveaxis(a, -1, 0))  # axis 0: aa, da
        ad_, dd = _haar_split(jnp.moveaxis(d, -1, 0))  # axis 0: ad, dd
        coeff = jnp.concatenate(
            [c.ravel() for c in (jnp.moveaxis(aa, 0, -1), jnp.moveaxis(ad_, 0, -1),
                                 jnp.moveaxis(da_, 0, -1), jnp.moveaxis(dd, 0, -1))]
        )
    else:
        raise ValueError("fingerprint supports 1-D and 2-D data")
    if jax.default_backend() == "tpu":
        # TPU has no c128 FFT kernel, so the f64 DCT cannot lower there;
        # compute it in f32 (fingerprints of distinct noise realizations
        # differ at ~1e-2+, so the ~1e-7 relative perturbation cannot
        # flip the median selection) — documented platform delta.
        d = jax.scipy.fft.dct(coeff.astype(jnp.float32), axis=0)
        return jnp.sum(d).astype(coeff.dtype) / 0.6616518484657332
    d = jax.scipy.fft.dct(coeff, axis=0)
    return jnp.sum(d) / 0.6616518484657332


def sorted_median_index(data: jax.Array):
    """helperfunctions.py:18-37: index of the sorted-mean element + the
    logit-fit completeness measure."""
    data = jnp.asarray(data, jnp.float64)
    sort = jnp.argsort(data)
    a = data[sort]
    mean = jnp.mean(a)
    idx = jnp.searchsorted(a, mean, side="left")

    lo, hi = jnp.min(a), jnp.max(a)
    scaled = -6.0 + (a - lo) * 12.0 / jnp.where(hi == lo, 1.0, hi - lo)
    xg = jnp.linspace(0.0, 1.0, data.size)
    y = jax.scipy.special.logit(xg)
    # the reference replaces only the +-inf ENDPOINTS with +-6; finite
    # interior values beyond |6| (data.size >= ~406) are kept
    y = jnp.where(jnp.isinf(y), jnp.sign(y) * 6.0, y)
    sc = scaled - jnp.mean(scaled)
    yc = y - jnp.mean(y)
    completeness = jnp.sum(sc * yc) / jnp.sqrt(jnp.sum(sc**2) * jnp.sum(yc**2))
    return sort[jnp.clip(idx, 0, data.size - 1)], completeness
