"""Filter-based trend decomposition (Untitled35.ipynb cells 1-3).

* ``custom_filter_engine``: halves the signal, then applies 8 orders of
  e-folding corrections whose sign flips wherever the running residual's
  gradient changes sign;
* ``extract_trend``: double-filter, find zero crossings of the second
  derivative, natural cubic spline through those inflection knots;
* ``decompose_signal``: subtract-trend iteration (tol 1e-6, max 10).

TPU design: the spline has a data-dependent knot count -> fixed-capacity
masked knot buffers + the batched natural-spline solver.  The time grid may
be any affine grid (natural cubic interpolation is affine-invariant, so
knots are indexed in sample space).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.extrema import compact_indices
from ..ops.tridiag import spline_moments
from ..ops.cubic_baseline import segment_index, eval_moment_spline
from ..ops.fill import take_last_axis

__all__ = ["custom_filter_engine", "extract_trend", "decompose_signal"]

_A = 1.0 - 0.36787944


def _gradient(x):
    return jnp.gradient(x, axis=-1)


@jax.jit
def custom_filter_engine(x: jax.Array) -> jax.Array:
    """Untitled35 cell 1 (offset parameter unused there, omitted here)."""
    out = 0.5 * x
    residual = 0.5 * x
    grad = _gradient(x)
    flip = jnp.concatenate(
        [jnp.zeros_like(grad[..., :1], bool),
         jnp.sign(grad[..., :-1]) != jnp.sign(grad[..., 1:])],
        axis=-1,
    )
    delta = _A * residual
    out = out + jnp.where(flip, delta, -delta)
    residual = residual * 0.36787944

    for _ in range(2, 9):
        grad = _gradient(residual)
        flip = jnp.concatenate(
            [jnp.zeros_like(grad[..., :1], bool),
             jnp.sign(grad[..., :-1]) != jnp.sign(grad[..., 1:])],
            axis=-1,
        )
        delta = _A * residual
        out = out + jnp.where(flip, delta, -delta)
        residual = residual * 0.36787944
    return out


@partial(jax.jit, static_argnames=("capacity",))
def extract_trend(signal: jax.Array, capacity: int | None = None):
    """Natural cubic spline through the inflections of the double-filtered
    signal, evaluated on the full grid.  Returns (trend, knot_mask)."""
    n = signal.shape[-1]
    if capacity is None:
        capacity = n + 2  # inflection count is data-dependent; worst case ~n
    f2 = custom_filter_engine(custom_filter_engine(signal))
    d2 = _gradient(_gradient(f2))
    sign = jnp.sign(d2)
    crossing = jnp.concatenate(
        [sign[..., :-1] != sign[..., 1:], jnp.zeros_like(sign[..., :1], bool)],
        axis=-1,
    )
    it = lax.broadcasted_iota(jnp.int32, signal.shape, signal.ndim - 1)
    knotmask = crossing | (it == 0) | (it == n - 1)
    pos, count = compact_indices(knotmask, capacity)
    vals = take_last_axis(signal, pos)
    k = lax.broadcasted_iota(jnp.int32, pos.shape, pos.ndim - 1)
    vals = jnp.where(k < count[..., None], vals, jnp.zeros_like(vals))

    moments = spline_moments(pos.astype(signal.dtype), vals, count, bc="natural")
    h = (jnp.concatenate([pos[..., 1:], pos[..., -1:]], axis=-1) - pos).astype(signal.dtype)
    h = jnp.where(k < count[..., None] - 1, h, jnp.ones_like(h))
    seg = segment_index(signal, pos, count, cap_to_last_interval=True)
    lin, cub = eval_moment_spline(signal, pos, vals, moments, h, seg)
    return lin + cub, knotmask


def decompose_signal(signal, max_iter: int = 10, tol: float = 1e-6):
    """Untitled35 cell 3: returns (components list, residual)."""
    residual = jnp.asarray(signal)
    components = []
    for _ in range(max_iter):
        trend, _ = extract_trend(residual)
        components.append(trend)
        new_residual = residual - trend
        if float(jnp.linalg.norm(new_residual - residual)) < tol:
            break
        residual = new_residual
    return components, residual
