"""Streaming/block ITD — the JAX port of the native real-time protocol.

The protocol (prescribed in the reference native tier's header,
``itd.cpp:31-39``): keep a 3-hop window, re-assess extrema over the whole
window each hop, restrict the knot set to [last extremum in the first
third, first extremum in the last third], and emit the decomposition of the
inner third only.  Latency: 3 hops.

TPU design: the per-hop step is a fixed-shape jitted kernel over the 3-hop
window; :func:`streaming_itd` processes a whole signal by ``lax.scan`` over
hops (offline replay of the streaming semantics, batched over channels via
``vmap``), and :func:`streaming_step` exposes the single-hop transition for
genuine real-time use with a carried state.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.extrema import extrema_mask, compact_indices
from ..ops.fill import take_last_axis
from ..ops.tridiag import spline_moments
from ..ops.cubic_baseline import segment_index, eval_moment_spline

__all__ = ["StreamState", "streaming_init", "streaming_step", "streaming_itd"]


class StreamState(NamedTuple):
    window: jax.Array   # (..., 3*hop)
    filled: jax.Array   # int32 hop count (saturates at 3)


def streaming_init(hop: int, batch_shape=(), dtype=jnp.float64) -> StreamState:
    return StreamState(
        window=jnp.zeros(batch_shape + (3 * hop,), dtype),
        filled=jnp.zeros(batch_shape, jnp.int32),
    )


def _inner_baseline(window: jax.Array, hop: int) -> jax.Array:
    """Baseline of the inner third from the windowed knot set."""
    n = 3 * hop
    mask = extrema_mask(window)
    it = lax.broadcasted_iota(jnp.int32, window.shape, window.ndim - 1)

    # active knot range: last extremum with index < hop .. first extremum
    # with index >= 2*hop (fall back to window ends)
    first_third = mask & (it < hop)
    last_third = mask & (it >= 2 * hop)
    lo = jnp.max(jnp.where(first_third, it, 0), axis=-1)
    hi = jnp.min(jnp.where(last_third, it, n - 1), axis=-1)
    active = mask & (it >= lo[..., None]) & (it <= hi[..., None])
    active = active | (it == lo[..., None]) | (it == hi[..., None])

    pos, count = compact_indices(active, n)
    k = lax.broadcasted_iota(jnp.int32, pos.shape, pos.ndim - 1)
    cnt = count[..., None]
    xe = take_last_axis(window, pos)

    e_prev = jnp.concatenate([jnp.zeros_like(pos[..., :1]), pos[..., :-1]], axis=-1)
    e_next = jnp.concatenate([pos[..., 1:], jnp.zeros_like(pos[..., :1])], axis=-1)
    x_prev = jnp.concatenate([jnp.zeros_like(xe[..., :1]), xe[..., :-1]], axis=-1)
    x_next = jnp.concatenate([xe[..., 1:], jnp.zeros_like(xe[..., :1])], axis=-1)
    span = (e_next - e_prev).astype(window.dtype)
    w = (pos - e_prev).astype(window.dtype) / jnp.where(span == 0, jnp.ones_like(span), span)
    knots = 0.5 * (x_prev + w * (x_next - x_prev)) + 0.5 * xe
    # ends pinned to the signal at the boundary extrema (itd.cpp semantics)
    knots = jnp.where((k == 0) | (k == cnt - 1), xe, knots)
    knots = jnp.where(k >= cnt, jnp.zeros_like(knots), knots)

    moments = spline_moments(pos.astype(window.dtype), knots, count, bc="natural")
    h = (e_next - pos).astype(window.dtype)
    h = jnp.where(k < cnt - 1, h, jnp.ones_like(h))
    seg = segment_index(window, pos, count, cap_to_last_interval=True)
    lin, cub = eval_moment_spline(window, pos, knots, moments, h, seg)
    baseline = lin + cub
    # degenerate window (fewer than 2 usable knots): baseline 0
    usable = (count >= 2)[..., None]
    baseline = jnp.where(usable, baseline, jnp.zeros_like(baseline))
    return baseline[..., hop : 2 * hop]


@partial(jax.jit, static_argnames=("hop",))
def streaming_step(state: StreamState, hop_samples: jax.Array, hop: int):
    """One hop in, one (rotation, baseline) hop out (+ ready flag)."""
    window = jnp.concatenate([state.window[..., hop:], hop_samples], axis=-1)
    filled = jnp.minimum(state.filled + 1, 3)
    ready = filled >= 3
    inner = window[..., hop : 2 * hop]
    base = _inner_baseline(window, hop)
    base = jnp.where(ready[..., None], base, jnp.zeros_like(base))
    rot = inner - base
    return StreamState(window=window, filled=filled), rot, base, ready


def streaming_itd(x: jax.Array, hop: int):
    """Offline replay: returns (rotation, baseline) for samples
    ``[hop, 2*hop, ...)`` aligned like the real-time path (3-hop latency,
    first emitted hop corresponds to ``x[hop:2*hop]``)."""
    n = x.shape[-1]
    nhops = n // hop
    hops = jnp.moveaxis(
        x[..., : nhops * hop].reshape(x.shape[:-1] + (nhops, hop)), -2, 0
    )
    state = streaming_init(hop, x.shape[:-1], x.dtype)

    def step(st, h):
        st, rot, base, ready = streaming_step(st, h, hop)
        return st, (rot, base, ready)

    _, (rots, bases, readys) = lax.scan(step, state, hops)
    return rots, bases, readys
