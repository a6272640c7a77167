"""Vectorized extrema detection.

Reference semantics (studied, not copied): the reference's rising-edge peak
detector (``/root/reference/ITD.py:33-76`` and the ``dx = -dx`` variant at
``/root/reference/numba_accelerated_itd.py:17-59``) marks, via forward
differences padded on both sides, every interior sample where the signal
stops falling and starts rising (a local minimum, rightmost sample of a flat
valley) — and, applied to ``-x``, every local maximum (rightmost sample of a
flat plateau, per arXiv:1404.3827 p.3).  The union of the two calls is what
every driver actually consumes.

Here that union is a single branch-free mask:

    is_min[i] = (x[i] - x[i-1] <= 0) & (x[i+1] - x[i] > 0)
    is_max[i] = (x[i] - x[i-1] >= 0) & (x[i+1] - x[i] < 0)

for interior ``i``; the two masks are disjoint (they disagree on the sign of
the forward difference), so the merged+deduped sorted index list of the
reference is exactly ``where(is_min | is_max)``.

NaN handling mirrors the reference: differences that involve a NaN are
treated as +inf and any sample within distance 1 of a NaN is disqualified
(``ITD.py:45-68``).

All functions operate on the last axis and broadcast over batch axes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "extrema_masks",
    "extrema_mask",
    "count_extrema",
    "compact_indices",
]


class ExtremaMasks(NamedTuple):
    minima: jax.Array  # bool, same shape as x
    maxima: jax.Array  # bool, same shape as x


def _diffs(x: jax.Array):
    """Backward/forward first differences with NaN->+inf substitution."""
    dx = x[..., 1:] - x[..., :-1]
    dx = jnp.where(jnp.isnan(dx), jnp.inf, dx)
    zero = jnp.zeros_like(x[..., :1])
    dxb = jnp.concatenate([zero, dx], axis=-1)  # x[i] - x[i-1]; 0 at i=0
    dxf = jnp.concatenate([dx, zero], axis=-1)  # x[i+1] - x[i]; 0 at i=N-1
    return dxb, dxf


def extrema_masks(x: jax.Array) -> ExtremaMasks:
    """Boolean masks of local minima and maxima (plateau-rightmost rule)."""
    n = x.shape[-1]
    dxb, dxf = _diffs(x)
    is_min = (dxb <= 0) & (dxf > 0)
    is_max = (dxb >= 0) & (dxf < 0)

    # Endpoints can never be extrema (ITD.py:70-73).  dxf[...,-1]==0 and
    # dxb[...,0]==0 already exclude i=N-1 for minima and i=0 is excluded by
    # the reference explicitly; mask both ends for clarity.
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    interior = (it > 0) & (it < n - 1)
    is_min &= interior
    is_max &= interior

    # NaN quarantine: samples within +-1 of a NaN cannot be extrema.
    isnan = jnp.isnan(x)
    pad = jnp.zeros_like(isnan[..., :1])
    near_nan = (
        isnan
        | jnp.concatenate([pad, isnan[..., :-1]], axis=-1)
        | jnp.concatenate([isnan[..., 1:], pad], axis=-1)
    )
    is_min &= ~near_nan
    is_max &= ~near_nan

    # Signals shorter than 3 samples have no extrema (ITD.py:42-43).
    if n < 3:
        is_min = jnp.zeros_like(is_min)
        is_max = jnp.zeros_like(is_max)
    return ExtremaMasks(minima=is_min, maxima=is_max)


def extrema_mask(x: jax.Array) -> jax.Array:
    """Merged extrema mask (minima | maxima) — what the sift drivers consume."""
    m = extrema_masks(x)
    return m.minima | m.maxima


def count_extrema(x: jax.Array) -> jax.Array:
    """Total number of interior extrema, as an int32 scalar per batch element."""
    m = extrema_masks(x)
    return (
        jnp.sum(m.minima, axis=-1).astype(jnp.int32)
        + jnp.sum(m.maxima, axis=-1).astype(jnp.int32)
    )


def compact_indices(mask: jax.Array, capacity: int) -> tuple[jax.Array, jax.Array]:
    """Pack the sorted indices of marked samples into a fixed-capacity buffer.

    Returns ``(indices[..., capacity], count)``.  Slots past ``count`` hold
    ``n - 1`` (clamping gathers to the last sample keeps padded arithmetic
    finite).  This is the TPU analogue of the reference's dynamically-sized
    ``extrema_indices`` arrays (``ITD.py:95-98``), used by the cubic tier
    where per-knot sequential structure (tridiagonal solves) is unavoidable.
    """
    n = mask.shape[-1]
    it = lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    # Rank of each marked sample among marked samples.
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=-1) - 1
    count = jnp.sum(mask, axis=-1).astype(jnp.int32)
    dest = jnp.where(mask, rank, capacity)  # unmarked -> dropped slot
    out = jnp.full(mask.shape[:-1] + (capacity + 1,), n - 1, dtype=jnp.int32)
    out = _scatter_last_axis(out, dest, it)
    return out[..., :capacity], count


def _scatter_last_axis(buf: jax.Array, dest: jax.Array, vals: jax.Array) -> jax.Array:
    """buf[..., dest[..., i]] = vals[..., i] along the last axis (batched)."""
    # jnp .at[] supports batched scatter via take_along_axis-style indices
    # only for the one-axis case; emulate with explicit dimension numbers.
    def one(buf1, dest1, vals1):
        return buf1.at[dest1].set(vals1, mode="drop")

    for _ in range(buf.ndim - 1):
        one = jax.vmap(one)
    return one(buf, dest, vals)
