"""Masked fill primitives — the workhorse of the TPU-native ITD kernels.

The reference implementations (``/root/reference/ITD.py:106-117``,
``/root/reference/itd.cpp:139-153``) walk knot lists sequentially.  On TPU we
instead keep everything at full signal resolution and use cumulative ops:

* ``prev_index`` / ``next_index`` give, per sample, the position of the most
  recent / soonest marked sample (a "knot"), via ``lax.cummax`` /
  ``lax.cummin``; ``forward_fill`` / ``backward_fill`` propagate *values*
  with a gather on those index vectors (fast on CPU);
* the ``*_scan`` variants are **gather-free**: associative masked-fill
  scans (per-sample gathers along a million-lane axis are pathologically
  slow on TPU).  Long axes use a two-level blocked decomposition — flat
  log-pass scans at 1M samples produce slice graphs the TPU compiler
  chokes on, while blocked scans keep every scan axis ~1k and tile-aligned;
* ``fill2`` variants carry the last **two** marked samples' channels — the
  shape the ITD knot formula needs (each sample's interpolation depends on
  four surrounding knots: two via a forward fill2, two via a backward one).

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
    "forward_fill2_scan",
    "backward_fill2_scan",
]

_BLOCK = 1024


def _iota_like(mask: jax.Array) -> jax.Array:
    return lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)


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


# ---------------------------------------------------------------------------
# generic blocked associative scans (forward orientation; reverse = flips)
# ---------------------------------------------------------------------------


def _blocked_scan(elems: tuple, combine, identities: tuple):
    """Inclusive associative scan along the last axis, decomposed into
    per-block scans + a scan over block summaries (= block reductions)."""
    n = elems[0].shape[-1]
    lead = elems[0].shape[:-1]
    if n <= 4 * _BLOCK:
        return lax.associative_scan(combine, elems, axis=elems[0].ndim - 1)

    nb = -(-n // _BLOCK)
    pad = nb * _BLOCK - n

    def to_blocks(a, ident):
        if pad:
            a = jnp.concatenate(
                [a, jnp.full(lead + (pad,), ident, a.dtype)], axis=-1
            )
        return a.reshape(lead + (nb, _BLOCK))

    blocks = tuple(to_blocks(a, i) for a, i in zip(elems, identities))
    local = lax.associative_scan(combine, blocks, axis=elems[0].ndim)

    summaries = tuple(a[..., -1] for a in local)  # block reductions
    carried = lax.associative_scan(combine, summaries, axis=elems[0].ndim - 1)

    def shift(a, ident):
        lead_blk = jnp.full(lead + (1,), ident, a.dtype)
        return jnp.concatenate([lead_blk, a[..., :-1]], axis=-1)

    prefix = tuple(shift(a, i)[..., None] for a, i in zip(carried, identities))
    out = combine(prefix, local)
    out = tuple(a.reshape(lead + (nb * _BLOCK,)) for a in out)
    if pad:
        out = tuple(a[..., :n] for a in out)
    return out


def _scan(elems, combine, identities, reverse):
    if reverse:
        flipped = tuple(jnp.flip(a, axis=-1) for a in elems)
        out = _blocked_scan(flipped, combine, identities)
        return tuple(jnp.flip(a, axis=-1) for a in out)
    return _blocked_scan(elems, combine, identities)


# --- last-marked-wins fill --------------------------------------------------


def _fill_combine(a, b):
    seen_b = b[-1]
    out = tuple(jnp.where(seen_b, bv, av) for av, bv in zip(a[:-1], b[:-1]))
    return out + (a[-1] | seen_b,)


def _fill_scan(values, mask, defaults, reverse):
    elems = tuple(
        jnp.where(mask, v, jnp.asarray(d, v.dtype)) for v, d in zip(values, defaults)
    ) + (mask,)
    idents = tuple(defaults) + (False,)
    out = _scan(elems, _fill_combine, idents, reverse)
    return tuple(
        jnp.where(out[-1], o, jnp.asarray(d, o.dtype))
        for o, d in zip(out[:-1], defaults)
    )


def forward_fill_scan(values: tuple, mask: jax.Array, defaults: tuple) -> tuple:
    """Gather-free multi-channel forward fill (defaults before the first
    marked sample)."""
    return _fill_scan(values, mask, defaults, reverse=False)


def backward_fill_scan(values: tuple, mask: jax.Array, defaults: tuple) -> tuple:
    """Reverse-direction counterpart of :func:`forward_fill_scan`."""
    return _fill_scan(values, mask, defaults, reverse=True)


# --- last-TWO-marked fill ---------------------------------------------------


def _fill2_combine(a, b):
    """Truncated-concat semigroup keeping the last two marked samples.

    Element layout: (v1..., v2..., count) with count saturating at 2; v1 is
    the most recent marked sample's channels, v2 the one before.
    """
    k = (len(a) - 1) // 2
    a1, a2, ca = a[:k], a[k : 2 * k], a[-1]
    b1, b2, cb = b[:k], b[k : 2 * k], b[-1]
    r1 = tuple(jnp.where(cb >= 1, bv, av) for av, bv in zip(a1, b1))
    r2 = tuple(
        jnp.where(cb >= 2, bv2, jnp.where(cb == 1, av1, av2))
        for av1, av2, bv2 in zip(a1, a2, b2)
    )
    rc = jnp.minimum(ca + cb, 2)
    return r1 + r2 + (rc,)


def _fill2_scan(values, mask, defaults, reverse):
    d1 = tuple(
        jnp.where(mask, v, jnp.asarray(d, v.dtype)) for v, d in zip(values, defaults)
    )
    d2 = tuple(jnp.full_like(v, d) for v, d in zip(values, defaults))
    cnt = mask.astype(jnp.int32)
    idents = tuple(defaults) * 2 + (0,)
    out = _scan(d1 + d2 + (cnt,), _fill2_combine, idents, reverse)
    k = len(values)
    v1 = tuple(
        jnp.where(out[-1] >= 1, o, jnp.asarray(d, o.dtype))
        for o, d in zip(out[:k], defaults)
    )
    v2 = tuple(
        jnp.where(out[-1] >= 2, o, jnp.asarray(d, o.dtype))
        for o, d in zip(out[k : 2 * k], defaults)
    )
    return v1, v2, out[-1]


def forward_fill2_scan(values: tuple, mask: jax.Array, defaults: tuple):
    """Per sample: channels of the last marked sample at-or-before it (v1)
    and of the marked sample before that (v2), plus the saturated count."""
    return _fill2_scan(values, mask, defaults, reverse=False)


def backward_fill2_scan(values: tuple, mask: jax.Array, defaults: tuple):
    """Per sample: the next marked sample at-or-after (v1) and the one after
    it (v2)."""
    return _fill2_scan(values, mask, defaults, reverse=True)
