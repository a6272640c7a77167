"""Accumulator Fourier Transform exploration (AFT.ipynb).

The notebook investigates evaluating a DFT by *grouping* contributions that
share a twiddle factor: ``X[k] = sum_r W^r * S_k[r]`` with
``S_k[r] = sum_{j : j*k = r (mod n)} x[j]`` — each output bin needs only
``unique_twiddle_count(n)`` multiplies after pure accumulation.  For n=512
there are 257 unique twiddles (the notebook's discovery).

This is capability parity for an exploratory artifact: the grouped
evaluation is expressed as a one-hot accumulation (an MXU-shaped
contraction) and validated against the FFT.  It is not a production FFT
replacement.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["dft_matrix", "unique_twiddle_count", "accumulator_dft"]


def dft_matrix(n: int) -> np.ndarray:
    j = np.arange(n)
    return np.exp(-2j * np.pi * np.outer(j, j) / n)


def unique_twiddle_count(n: int) -> int:
    """Number of distinct cosine coefficients among the n-point DFT
    twiddles (257 for n=512, the notebook's count): cos(2*pi*r/n) is shared
    between r and n-r, which is what makes coefficient-grouped
    accumulation worthwhile."""
    return np.unique(np.round(np.cos(2 * np.pi * np.arange(n) / n), 12)).size


@partial(jax.jit, static_argnames=("n",))
def _acc_dft(x: jax.Array, residues: jax.Array, twiddles: jax.Array, n: int) -> jax.Array:
    onehot = jax.nn.one_hot(residues, n, dtype=x.dtype)  # (n_k, n_j, n_r)
    acc = jnp.einsum("...j,kjr->...kr", x, onehot)       # grouped sums
    return jnp.einsum("...kr,r->...k", acc.astype(twiddles.dtype), twiddles)


def accumulator_dft(x: jax.Array) -> jax.Array:
    """DFT of the last axis via accumulate-then-multiply grouping."""
    n = x.shape[-1]
    j = np.arange(n)
    residues = jnp.asarray((np.outer(j, j) % n).astype(np.int32))
    tw = jnp.asarray(np.exp(-2j * np.pi * np.arange(n) / n))
    return _acc_dft(jnp.asarray(x), residues, tw, n)
