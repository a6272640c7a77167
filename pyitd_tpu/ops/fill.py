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


_BLOCK = 1024


def _fill_scan_flat(values, mask, defaults, reverse):
    elems = tuple(
        jnp.where(mask, v, jnp.asarray(d, v.dtype)) for v, d in zip(values, defaults)
    ) + (mask,)
    out = lax.associative_scan(_fill_combine, elems, axis=mask.ndim - 1, reverse=reverse)
    return tuple(
        jnp.where(out[-1], o, jnp.asarray(d, o.dtype))
        for o, d in zip(out[:-1], defaults)
    )


def _fill_scan_blocked(values, mask, defaults, reverse):
    """Two-level fill: per-block scans + a scan over block summaries.

    Long flat associative scans produce enormous unaligned-slice graphs that
    choke the TPU compiler at 1M samples; blocking keeps every scan axis
    ~sqrt(N) and the slices tile-aligned.
    """
    n = mask.shape[-1]
    nb = -(-n // _BLOCK)
    pad = nb * _BLOCK - n
    lead = mask.shape[:-1]

    def to_blocks(a, fill):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full(lead + (pad,), fill, a.dtype)], axis=-1
            )
        return a.reshape(lead + (nb, _BLOCK))

    bm = to_blocks(mask, False)
    bv = tuple(
        jnp.where(bm, to_blocks(v, d), jnp.asarray(d, v.dtype))
        for v, d in zip(values, defaults)
    )

    # 1) within-block fill
    local = lax.associative_scan(
        _fill_combine, bv + (bm,), axis=mask.ndim, reverse=reverse
    )
    local_vals, local_seen = local[:-1], local[-1]

    # 2) carry across blocks: summaries are the block's boundary fill state
    edge = -1 if not reverse else 0
    summ_vals = tuple(v[..., edge] for v in local_vals)   # (..., nb)
    summ_seen = local_seen[..., edge]
    carried = lax.associative_scan(
        _fill_combine, summ_vals + (summ_seen,), axis=mask.ndim - 1, reverse=reverse
    )
    car_vals, car_seen = carried[:-1], carried[-1]
    # exclusive shift: block i uses the carry from blocks before (after) it
    if not reverse:
        shift = lambda a, f: jnp.concatenate(
            [jnp.full(lead + (1,), f, a.dtype), a[..., :-1]], axis=-1
        )
    else:
        shift = lambda a, f: jnp.concatenate(
            [a[..., 1:], jnp.full(lead + (1,), f, a.dtype)], axis=-1
        )
    prev_vals = tuple(shift(v, d) for v, d in zip(car_vals, defaults))
    prev_seen = shift(car_seen, False)

    out = []
    for lv, pv, d in zip(local_vals, prev_vals, defaults):
        filled = jnp.where(
            local_seen,
            lv,
            jnp.where(prev_seen[..., None], pv[..., None], jnp.asarray(d, lv.dtype)),
        )
        filled = filled.reshape(lead + (nb * _BLOCK,))
        out.append(filled[..., :n] if pad else filled)
    return tuple(out)


def forward_fill_scan(values: tuple, mask: jax.Array, defaults: tuple) -> tuple:
    """Gather-free multi-channel forward fill.

    Semantically equals ``forward_fill`` per channel (positions before the
    first marked sample get the channel default), but lowers to purely
    elementwise log-passes — on TPU this avoids the pathologically slow
    per-element gather along the (long) lane axis.
    """
    if mask.shape[-1] > 4 * _BLOCK:
        return _fill_scan_blocked(values, mask, defaults, reverse=False)
    return _fill_scan_flat(values, mask, defaults, reverse=False)


def backward_fill_scan(values: tuple, mask: jax.Array, defaults: tuple) -> tuple:
    """Reverse-direction counterpart of :func:`forward_fill_scan`."""
    if mask.shape[-1] > 4 * _BLOCK:
        return _fill_scan_blocked(values, mask, defaults, reverse=True)
    return _fill_scan_flat(values, mask, defaults, reverse=True)
