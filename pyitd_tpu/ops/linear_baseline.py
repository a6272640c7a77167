"""Canonical ITD baseline extraction — linear-in-value interpolation tier.

Behavioral contract (from ``/root/reference/ITD.py:79-121``, the tier used by
the canonical sift and the PyITD.ipynb demo):

* knot set = {0} ∪ interior extrema ∪ {N-1};
* end knots: ``B_first = mean(x[:2])``, ``B_last = mean(x[-2:])``
  (``ITD.py:100-102``);
* interior knots use the Frei-Osorio formula with α = 0.5
  (``ITD.py:106-110``)::

      B_k = α·(x[τ_{k-1}] + (τ_k − τ_{k-1})/(τ_{k+1} − τ_{k-1})
                 · (x[τ_{k+1}] − x[τ_{k-1}]))  +  α·x[τ_k]

  where neighbor positions τ_{k±1} include the 0 / N-1 end knots;
* between knots the baseline is linear **in the signal's value**, not in
  time (``ITD.py:114-117``)::

      B[t] = B_k + (B_{k+1} − B_k)/(x[τ_{k+1}] − x[τ_k]) · (x[t] − x[τ_k])

  for t ∈ [τ_k, τ_{k+1});
* quirk preserved by default: the reference's segment loop never writes the
  final sample, so ``B[N-1] == 0`` and the rotation ends at ``x[N-1]``
  (``ITD.py:114-117`` — slices exclude the right endpoint).  Pass
  ``endpoint_mode="natural"`` to instead evaluate the last segment's formula
  at N-1.
* deliberate guard (SURVEY.md §7 hard-part b): where adjacent knot values are
  equal the reference divides by zero; we emit a flat segment (slope 0)
  instead.  Generic signals never hit this; tests document the delta.

Everything is expressed as masks + cumulative scans + gathers over the last
axis — no dynamic shapes, so the op jits, vmaps and shards cleanly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .extrema import extrema_mask, count_extrema
from .fill import prev_index, next_index, take_last_axis

__all__ = ["linear_baseline_extract", "LinearBaselineResult"]


class LinearBaselineResult(NamedTuple):
    rotation: jax.Array
    baseline: jax.Array
    num_extrema: jax.Array  # interior extrema count (int32), per batch elem


def _knot_mask(x: jax.Array) -> jax.Array:
    n = x.shape[-1]
    mask = extrema_mask(x)
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return mask | (it == 0) | (it == n - 1)


def linear_baseline_extract(
    x: jax.Array, *, endpoint_mode: str = "reference"
) -> LinearBaselineResult:
    """One level of canonical ITD: returns (rotation, baseline, num_extrema)."""
    if endpoint_mode not in ("reference", "natural"):
        raise ValueError(f"unknown endpoint_mode: {endpoint_mode!r}")
    n = x.shape[-1]
    dtype = x.dtype
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    knots = _knot_mask(x)

    # --- neighbor-knot positions & values, per sample ------------------
    prev_i = prev_index(knots, inclusive=True)            # tau_k   (<= i)
    next_i = next_index(knots, inclusive=True)            # tau_k+1 (>= i); ==i at knots
    prev_excl = prev_index(knots, inclusive=False)        # tau_{k-1} strictly before
    next_excl = next_index(knots, inclusive=False)        # tau_{k+1} strictly after

    x_prev_excl = take_last_axis(x, prev_excl)
    x_next_excl = take_last_axis(x, next_excl)

    # --- knot values ----------------------------------------------------
    # Interior-extremum formula evaluated at every sample (only read where
    # `knots`): alpha=0.5, neighbors are the strictly-adjacent knots.
    pos = it.astype(dtype)
    span = (next_excl - prev_excl).astype(dtype)
    w = (it - prev_excl).astype(dtype) / jnp.where(span == 0, jnp.ones_like(span), span)
    interior_knot = 0.5 * (x_prev_excl + w * (x_next_excl - x_prev_excl)) + 0.5 * x
    del pos

    b_first = 0.5 * (x[..., 0] + x[..., 1])
    b_last = 0.5 * (x[..., n - 2] + x[..., n - 1])
    knot_val = interior_knot
    knot_val = jnp.where(it == 0, b_first[..., None], knot_val)
    knot_val = jnp.where(it == n - 1, b_last[..., None], knot_val)

    # --- per-sample segment interpolation ------------------------------
    # Left knot of the segment containing sample t is prev_i (inclusive): the
    # reference's half-open segments [tau_k, tau_k+1) put t=tau_k in the
    # segment it starts.  Right knot = next knot strictly after t (for
    # non-knots this equals the inclusive next; at knots the interpolation
    # formula collapses to B_k and the right knot is irrelevant).
    seg_l = prev_i
    seg_r = next_excl
    del next_i

    b_l = take_last_axis(knot_val, seg_l)
    b_r = take_last_axis(knot_val, seg_r)
    x_l = take_last_axis(x, seg_l)
    x_r = take_last_axis(x, seg_r)

    den = x_r - x_l
    slope = jnp.where(den == 0, jnp.zeros_like(den), (b_r - b_l) / jnp.where(den == 0, jnp.ones_like(den), den))
    baseline = b_l + slope * (x - x_l)

    if endpoint_mode == "reference":
        baseline = jnp.where(it == n - 1, jnp.zeros_like(baseline), baseline)

    # Degenerate input (<2 interior extrema): the canonical driver never calls
    # this path on such inputs (the sift stops first), but keep it finite.
    nex = count_extrema(x)
    rotation = x - baseline
    return LinearBaselineResult(rotation=rotation, baseline=baseline, num_extrema=nex)
