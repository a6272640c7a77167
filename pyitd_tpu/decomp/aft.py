"""Accumulator Fourier Transform exploration (AFT.ipynb).

The notebook investigates evaluating a DFT by *grouping* contributions that
share a twiddle factor: ``X[k] = sum_r W^r * S_k[r]`` with
``S_k[r] = sum_{j : j*k = r (mod n)} x[j]`` — each output bin needs only
``unique_twiddle_count(n)`` multiplies after pure accumulation.  For n=512
there are 257 unique twiddles (the notebook's discovery).

Two tiers, both validated against the FFT:

* :func:`accumulator_dft` — the FLAT grouped form (AFT.ipynb cell 18's
  ``ordered_dft_compute`` shape) as a one-hot MXU contraction.
* The HIERARCHICAL machinery of cells 3-21: :func:`coefficient_census`
  (cells 3-4: rounded [cos; -sin] value census + symbol-index matrix),
  :func:`accumulation_paths` (cell 8: per-fundamental harmonic chains and
  shared-symbol sets), :func:`sub_accumulators` (cells 9-10: group bins by
  shared coefficient tuples, with per-symbol position lists), and
  :func:`hierarchical_dft` (cells 12/21's evaluator, made *exact*): each
  distinct (symbol, position-set) pair becomes ONE shared accumulator
  ``a = sum(x[P])``, reused by every bin row that multiplies that exact
  set by that coefficient — so the evaluation is two matmuls
  (positions->accumulators, accumulators->bins) and equals the DFT
  bit-for-roundoff, unlike the notebook's work-in-process evaluator which
  double-counts contributions shared between accumulator groups.

This is capability parity for an exploratory artifact, not a production
FFT replacement.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "dft_matrix", "unique_twiddle_count", "accumulator_dft",
    "coefficient_census", "accumulation_paths", "sub_accumulators",
    "hierarchical_dft",
]


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


# ---------------------------------------------------------------------------
# hierarchical accumulation paths (AFT.ipynb cells 3-21)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def coefficient_census(n: int, decimals: int = 10):
    """Cells 3-4: stack [cos; -sin] twiddle rows, round, and index every
    entry by its unique coefficient value.

    Returns ``(values, sym)``: ``values[s]`` the s-th unique coefficient,
    ``sym[r, j]`` the symbol index of entry (r, j) of the stacked
    ``(2n, n)`` matrix (rows 0..n-1 real/cos, rows n..2n-1 imag/-sin).
    """
    k = np.arange(n)[:, None]
    j = np.arange(n)[None, :]
    real = np.cos(2 * np.pi * k * j / n)
    imag = -np.sin(2 * np.pi * k * j / n)
    full = np.round(np.vstack([real, imag]), decimals=decimals)
    values, inverse = np.unique(full, return_inverse=True)
    return values, inverse.reshape(2 * n, n).astype(np.int32)


def accumulation_paths(n: int):
    """Cell 8: per fundamental bin i, its harmonic chain
    ``{j > i : j % i == 0}`` and the coefficient symbols shared with each
    harmonic (union of the bin's real+imag rows).

    Returns ``{i: {"symbols": set, "harmonics": [...],
    "shared_symbols": {h: set}}}``.
    """
    _, sym = coefficient_census(n)
    bin_syms = [
        set(sym[i]) | set(sym[i + n]) for i in range(n)
    ]
    paths = {}
    for i in range(n):
        harmonics = list(range(2 * i, n, i)) if i > 0 else []
        paths[i] = {
            "symbols": bin_syms[i],
            "harmonics": harmonics,
            "shared_symbols": {
                h: bin_syms[i] & bin_syms[h] for h in harmonics
            },
        }
    return paths


def sub_accumulators(n: int):
    """Cells 9-10 made exact: the shared accumulators of the hierarchy.

    The notebook groups harmonically-related bins by their shared-symbol
    tuples and tracks, per symbol, every (bin, part, position) it touches.
    The *exact* formulation groups by ``(symbol, position-set)``: whenever
    two bin rows multiply the SAME set of input positions by the SAME
    coefficient, that partial sum is one shared accumulator.  Returns

    * ``acc_members``: list of (symbol index, sorted position tuple), one
      per accumulator;
    * ``row_acc``: ``{row r: [acc ids]}`` — each of the 2n bin rows is an
      exact sum ``sum_a values[sym_a] * acc_a`` over its accumulators.
    """
    _, sym = coefficient_census(n)
    acc_ids: dict = {}
    acc_members = []
    row_acc = {}
    for r in range(2 * n):
        row = sym[r]
        by_symbol: dict = {}
        for pos, s in enumerate(row):
            by_symbol.setdefault(int(s), []).append(pos)
        ids = []
        for s, positions in by_symbol.items():
            key = (s, tuple(positions))
            if key not in acc_ids:
                acc_ids[key] = len(acc_members)
                acc_members.append(key)
            ids.append(acc_ids[key])
        row_acc[r] = ids
    return acc_members, row_acc


@lru_cache(maxsize=4)
def _hierarchical_operators(n: int):
    """Materialize the two sparse stages as dense 0/1 and coefficient
    matrices (MXU-shaped; n is exploration-scale)."""
    values, _ = coefficient_census(n)
    acc_members, row_acc = sub_accumulators(n)
    n_acc = len(acc_members)
    gather = np.zeros((n_acc, n), np.float32)
    for a, (_, positions) in enumerate(acc_members):
        gather[a, list(positions)] = 1.0
    emit = np.zeros((2 * n, n_acc), np.float32)
    for r, ids in row_acc.items():
        for a in ids:
            emit[r, a] = values[acc_members[a][0]]
    return jnp.asarray(gather), jnp.asarray(emit)


@partial(jax.jit, static_argnames=("n",))
def _hier_dft(x, gather, emit, n):
    acc = jnp.einsum("an,...n->...a", gather, x.astype(jnp.float32))
    parts = jnp.einsum("ra,...a->...r", emit, acc)
    return lax_complex(parts[..., :n], parts[..., n:])


def lax_complex(re, im):
    return re + 1j * im


def hierarchical_dft(x: jax.Array) -> jax.Array:
    """Cells 12/21's hierarchical evaluator, exact: positions ->
    shared accumulators (one matmul) -> coefficient-weighted bin sums
    (second matmul).  Matches :func:`accumulator_dft` and the FFT to
    f32 roundoff."""
    n = x.shape[-1]
    gather, emit = _hierarchical_operators(n)
    return _hier_dft(jnp.asarray(x), gather, emit, n)
