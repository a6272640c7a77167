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

The complex-IQ tier (the SDR use case, ``/root/reference/itd.cpp:58-154``)
shares all machinery: a sample is a knot iff it is *simultaneously* an
extremum in both the I and Q channels (:func:`iq_extrema_mask`), knot
values come from the averaged channel ``(I+Q)/2``, and one **common scalar
baseline** is produced that both channels subtract
(:func:`iq_baseline_extract`, :func:`streaming_step_iq`,
:func:`streaming_itd_iq`).
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

__all__ = [
    "StreamState", "streaming_init", "streaming_step", "streaming_itd",
    "iq_extrema_mask", "iq_baseline_extract",
    "streaming_step_iq", "streaming_itd_iq",
]


class StreamState(NamedTuple):
    window: jax.Array   # (..., 3*hop)
    filled: jax.Array   # int32 hop count (saturates at 3)


def streaming_init(hop: int, batch_shape=(), dtype=jnp.float64, *,
                   like: jax.Array | None = None) -> StreamState:
    """Fresh 3-hop state.  Pass ``like`` (any array already inside a
    ``shard_map`` region) so the zero state inherits its varying mesh axes —
    required for the state to be a valid ``lax.scan`` carry there."""
    state = StreamState(
        window=jnp.zeros(batch_shape + (3 * hop,), dtype),
        filled=jnp.zeros(batch_shape, jnp.int32),
    )
    if like is not None:
        vma = tuple(getattr(jax.typeof(like), "vma", ()))
        if vma:
            from ..utils.vma import vary

            state = StreamState(
                window=vary(state.window, vma), filled=vary(state.filled, vma)
            )
    return state


def _frei_osorio_spline(sig: jax.Array, pos: jax.Array, count: jax.Array):
    """Frei-Osorio knot values over ``sig`` (ends pinned to the signal at
    the boundary knots, itd.cpp semantics) + natural moment-spline
    evaluation — the shared core of the scalar streaming tier and the IQ
    tier.  Returns ``(baseline, knots, k, cnt)`` where ``k``/``cnt`` are
    the knot-slot iota and broadcast count used for masking."""
    dtype = sig.dtype
    k = lax.broadcasted_iota(jnp.int32, pos.shape, pos.ndim - 1)
    cnt = jnp.broadcast_to(count, sig.shape[:-1])[..., None]
    xe = take_last_axis(sig, pos)

    e_prev = jnp.concatenate([jnp.zeros_like(pos[..., :1]), pos[..., :-1]], axis=-1)
    e_next = jnp.concatenate([pos[..., 1:], jnp.zeros_like(pos[..., :1])], axis=-1)
    x_prev = jnp.concatenate([jnp.zeros_like(xe[..., :1]), xe[..., :-1]], axis=-1)
    x_next = jnp.concatenate([xe[..., 1:], jnp.zeros_like(xe[..., :1])], axis=-1)
    span = (e_next - e_prev).astype(dtype)
    w = (pos - e_prev).astype(dtype) / jnp.where(span == 0, jnp.ones_like(span), span)
    knots = 0.5 * (x_prev + w * (x_next - x_prev)) + 0.5 * xe
    knots = jnp.where((k == 0) | (k == cnt - 1), xe, knots)  # ends pinned
    knots = jnp.where(k >= cnt, jnp.zeros_like(knots), knots)

    moments = spline_moments(pos.astype(dtype), knots, count, bc="natural")
    h = (e_next - pos).astype(dtype)
    h = jnp.where(k < cnt - 1, h, jnp.ones_like(h))
    seg = segment_index(sig, pos, count, cap_to_last_interval=True)
    lin, cub = eval_moment_spline(sig, pos, knots, moments, h, seg)
    return lin + cub, knots, k, cnt


def _inner_baseline(window: jax.Array, hop: int, mask: jax.Array | None = None) -> jax.Array:
    """Baseline of the inner third from the windowed knot set.

    ``window`` supplies the knot *values*; ``mask`` the knot positions
    (defaults to the scalar extrema mask of ``window`` — the IQ tier passes
    the joint mask over the averaged channel instead)."""
    n = 3 * hop
    if mask is None:
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
    baseline, _, _, _ = _frei_osorio_spline(window, pos, count)
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
    state = streaming_init(hop, x.shape[:-1], x.dtype, like=x)

    def step(st, h):
        st, rot, base, ready = streaming_step(st, h, hop)
        return st, (rot, base, ready)

    _, (rots, bases, readys) = lax.scan(step, state, hops)
    return rots, bases, readys


# ---------------------------------------------------------------------------
# complex-IQ tier (joint extrema, one common baseline for both channels)
# ---------------------------------------------------------------------------


def iq_extrema_mask(re: jax.Array, im: jax.Array) -> jax.Array:
    """Joint IQ knot mask: a sample is a knot iff it is simultaneously an
    extremum in both channels, with the IQ tier's tie rules
    (``/root/reference/itd.cpp:74-82``: strict on the rising edge,
    inclusive on the falling — the mask form of
    ``(prev < cur && cur >= next) || (prev > cur && cur <= next)``)."""

    def chan(x):
        db = x - jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
        df = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1) - x
        return ((db > 0) & (df <= 0)) | ((db < 0) & (df >= 0))

    n = re.shape[-1]
    it = lax.broadcasted_iota(jnp.int32, re.shape, re.ndim - 1)
    interior = (it > 0) & (it < n - 1)
    return chan(re) & chan(im) & interior


@partial(jax.jit, static_argnames=("capacity",))
def iq_baseline_extract(
    re: jax.Array,
    im: jax.Array,
    *,
    capacity: int | None = None,
    extrema: tuple[jax.Array, jax.Array] | None = None,
):
    """One common scalar baseline for an IQ pair — the SDR tier
    (``/root/reference/itd.cpp:58-154``; native twin
    ``native/itd_native.cpp`` ``pyitd_baseline_extract_iq``).

    Semantics: joint extrema, knot values = Frei-Osorio over the averaged
    channel ``(re+im)/2`` with end knots pinned to the averaged signal,
    natural cubic spline, clamped to the end knots outside the knot span,
    all-zero baseline when fewer than 2 joint extrema exist.

    ``extrema`` (positions, count) from a previous call can be passed to
    reuse knot placement across re-processing passes or channels — the
    native tier's ``compute_extrema=false`` protocol (``itd.cpp:41-44``).
    Returns ``(baseline, (positions, count))``.
    """
    n = re.shape[-1]
    cap = capacity or n
    avg = 0.5 * (re + im)

    if extrema is None:
        mask = iq_extrema_mask(re, im)
        pos, count = compact_indices(mask, cap)
    else:
        pos, count = extrema

    baseline, knots, _, cnt = _frei_osorio_spline(avg, pos, count)

    # outside the knot span: clamp to the end knots (itd_native.cpp edge rule)
    it = lax.broadcasted_iota(jnp.int32, avg.shape, avg.ndim - 1)
    e_first = jnp.take_along_axis(pos, jnp.zeros_like(cnt), axis=-1)
    e_last = jnp.take_along_axis(pos, jnp.maximum(cnt - 1, 0), axis=-1)
    k_first = jnp.take_along_axis(knots, jnp.zeros_like(cnt), axis=-1)
    k_last = jnp.take_along_axis(knots, jnp.maximum(cnt - 1, 0), axis=-1)
    baseline = jnp.where(it < e_first, k_first, baseline)
    baseline = jnp.where(it > e_last, k_last, baseline)

    baseline = jnp.where(cnt >= 2, baseline, jnp.zeros_like(baseline))
    return baseline, (pos, count)


@partial(jax.jit, static_argnames=("hop",))
def streaming_step_iq(state: StreamState, hop_samples: jax.Array, hop: int):
    """IQ single-hop transition: complex samples in, complex rotation and
    the common scalar baseline of the inner third out.

    ``state.window`` carries complex64/128; the knot mask is the joint
    IQ mask, knot values come from the averaged channel."""
    window = jnp.concatenate([state.window[..., hop:], hop_samples], axis=-1)
    filled = jnp.minimum(state.filled + 1, 3)
    ready = filled >= 3
    avg = 0.5 * (window.real + window.imag)
    mask = iq_extrema_mask(window.real, window.imag)
    base = _inner_baseline(avg, hop, mask=mask)
    base = jnp.where(ready[..., None], base, jnp.zeros_like(base))
    inner = window[..., hop : 2 * hop]
    rot = inner - lax.complex(base, base).astype(window.dtype)
    return StreamState(window=window, filled=filled), rot, base, ready


def streaming_itd_iq(x: jax.Array, hop: int):
    """Offline replay of the IQ streaming protocol over a complex signal;
    returns (complex rotations, common baselines, ready flags) per hop."""
    n = x.shape[-1]
    nhops = n // hop
    hops = jnp.moveaxis(
        x[..., : nhops * hop].reshape(x.shape[:-1] + (nhops, hop)), -2, 0
    )
    state = streaming_init(hop, x.shape[:-1], x.dtype, like=x)

    def step(st, h):
        st, rot, base, ready = streaming_step_iq(st, h, hop)
        return st, (rot, base, ready)

    _, (rots, bases, readys) = lax.scan(step, state, hops)
    return rots, bases, readys
