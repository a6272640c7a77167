"""Masked fill primitives — the workhorse of the TPU-native ITD kernels.

The reference implementations (``/root/reference/ITD.py:106-117``,
``/root/reference/itd.cpp:139-153``) walk knot lists sequentially.  On TPU we
instead keep everything at full signal resolution and use cumulative ops:

* ``prev_index`` / ``next_index`` give, per sample, the position of the most
  recent / soonest marked sample (a "knot"), via ``lax.cummax`` /
  ``lax.cummin`` — O(N) scans that XLA maps well onto the VPU.
* ``forward_fill`` / ``backward_fill`` propagate *values* across unmarked
  samples with a single gather on those index vectors.

All ops operate on the **last axis** and broadcast over leading batch axes,
so they compose with ``vmap``/``pjit`` for free.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "prev_index",
    "next_index",
    "forward_fill",
    "backward_fill",
    "take_last_axis",
    "forward_fill_scan",
    "backward_fill_scan",
]


def _iota_like(mask: jax.Array) -> jax.Array:
    n = mask.shape[-1]
    it = lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    del n
    return it


def prev_index(mask: jax.Array, *, inclusive: bool = True) -> jax.Array:
    """Per-sample index of the nearest marked sample at-or-before it.

    Returns -1 where no marked sample exists yet.  With ``inclusive=False``
    the marked sample itself maps to the previous marked one.
    """
    it = _iota_like(mask)
    marked = jnp.where(mask, it, jnp.int32(-1))
    idx = lax.cummax(marked, axis=mask.ndim - 1)
    if not inclusive:
        idx = jnp.concatenate(
            [jnp.full_like(idx[..., :1], -1), idx[..., :-1]], axis=-1
        )
    return idx


def next_index(mask: jax.Array, *, inclusive: bool = True) -> jax.Array:
    """Per-sample index of the nearest marked sample at-or-after it.

    Returns ``n`` (one past the end) where no marked sample follows.  With
    ``inclusive=False`` the marked sample itself maps to the next marked one.
    """
    n = mask.shape[-1]
    it = _iota_like(mask)
    marked = jnp.where(mask, it, jnp.int32(n))
    idx = lax.cummin(marked, axis=mask.ndim - 1, reverse=True)
    if not inclusive:
        idx = jnp.concatenate(
            [idx[..., 1:], jnp.full_like(idx[..., :1], n)], axis=-1
        )
    return idx


def take_last_axis(values: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather along the last axis: ``out[..., i] = values[..., idx[..., i]]``.

    ``idx`` is clipped into range, so callers may pass the -1 / n sentinels
    from :func:`prev_index` / :func:`next_index` and mask afterwards.
    """
    n = values.shape[-1]
    safe = jnp.clip(idx, 0, n - 1)
    return jnp.take_along_axis(
        values, safe.astype(jnp.int32), axis=-1, mode="clip"
    )


def forward_fill(values: jax.Array, mask: jax.Array, *, inclusive: bool = True) -> jax.Array:
    """Propagate the value at the last marked sample forward over unmarked ones.

    Positions before the first marked sample receive ``values[..., 0]``
    (callers that care should mask with ``prev_index(mask) < 0``).
    """
    return take_last_axis(values, prev_index(mask, inclusive=inclusive))


def backward_fill(values: jax.Array, mask: jax.Array, *, inclusive: bool = True) -> jax.Array:
    """Propagate the value at the next marked sample backward over unmarked ones."""
    return take_last_axis(values, next_index(mask, inclusive=inclusive))


def _fill_combine(a, b):
    """Associative last-marked-wins combine over (values..., seen) tuples."""
    seen_b = b[-1]
    out = tuple(jnp.where(seen_b, bv, av) for av, bv in zip(a[:-1], b[:-1]))
    return out + (a[-1] | seen_b,)


def forward_fill_scan(values: tuple, mask: jax.Array, defaults: tuple) -> tuple:
    """Gather-free multi-channel forward fill via ``lax.associative_scan``.

    Semantically equals ``forward_fill`` per channel (positions before the
    first marked sample get the channel default), but lowers to purely
    elementwise log-passes — on TPU this avoids the pathologically slow
    per-element gather along the (long) lane axis.
    """
    elems = tuple(
        jnp.where(mask, v, jnp.asarray(d, v.dtype)) for v, d in zip(values, defaults)
    ) + (mask,)
    out = lax.associative_scan(_fill_combine, elems, axis=mask.ndim - 1)
    filled = tuple(
        jnp.where(out[-1], o, jnp.asarray(d, o.dtype))
        for o, d in zip(out[:-1], defaults)
    )
    return filled


def backward_fill_scan(values: tuple, mask: jax.Array, defaults: tuple) -> tuple:
    """Reverse-direction counterpart of :func:`forward_fill_scan`."""
    elems = tuple(
        jnp.where(mask, v, jnp.asarray(d, v.dtype)) for v, d in zip(values, defaults)
    ) + (mask,)
    out = lax.associative_scan(
        _fill_combine, elems, axis=mask.ndim - 1, reverse=True
    )
    filled = tuple(
        jnp.where(out[-1], o, jnp.asarray(d, o.dtype))
        for o, d in zip(out[:-1], defaults)
    )
    return filled
