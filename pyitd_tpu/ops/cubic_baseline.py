"""Cubic-spline baseline tiers.

Two tiers, matching the reference's two cubic code paths:

* :func:`template_fast_baseline` — the native/"fast" tier
  (``/root/reference/itd_fourier_decomposition.py:48-122``, numba port of
  ``itd.cpp``): caller-supplied knot *positions* (e.g. zero crossings of a
  sine template), the reference's not-quite-Thomas moment recurrence, linear
  last segment, and the reference's zero-padded-buffer quirks reproduced:
  the last knot value is never written (stays 0) and the one-past-the-end
  knot reads the signal at index 0.  The single undefined behavior in the
  reference (an out-of-bounds read of the extrapolated tail position) is
  replaced by an index clamp — documented delta.
* :func:`cubic_baseline_extract` — the MEITD/2-D tier
  (``/root/reference/numba_accelerated_itd.py:182-211``, ``MEITD.py:303-338``):
  extrema-driven knots with odd-reflection end values
  ``(3x[0]-x[1])/2`` / ``(3x[-1]-x[-2])/2``, interpolated with a
  **not-a-knot** cubic spline (the scipy-splrep semantics the reference
  leans on via objmode).

Both are fixed-shape: padded position buffers + counts, masked scans over
the knot axis, scatter+cumsum segment ids, and gathers for evaluation —
jit/vmap/shard friendly.

Numerical hazard (docs/NUMERICS.md, "f32 quantization extrema"): smooth
noiseless signals whose adjacent-sample deltas fall below one f32 ulp
quantize to plateaus that mint thousands of spurious extrema, and the
not-a-knot end-moment extrapolation amplifies the resulting solver noise
by the ratio of adjacent knot spacings (~1e9x measured).  Property of the
quantized INPUT, not of any backend — feed such signals in float64.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .chained_pcr import chained_block_pcr, notaknot_rows
from .extrema import extrema_mask, compact_indices
from .fill import take_last_axis, forward_fill_scan, backward_fill_scan
from .tridiag import reference_spline_moments, spline_moments

__all__ = [
    "segment_index",
    "eval_moment_spline",
    "eval_moment_spline_scan",
    "template_fast_baseline",
    "cubic_baseline_extract",
    "CubicBaselineResult",
]

# backends that run Pallas fill kernels (no JVP/transpose rules) — these
# are wrapped in a custom VJP whose backward differentiates an equivalent
# XLA formulation, so jax.grad works through every backend
_PALLAS_BACKENDS = frozenset(
    {"fills", "fills_packed", "fills_fused", "fills_unfused",
     "fills_compact"})


def _scatter_add_ones(shape_ref: jax.Array, positions: jax.Array, valid: jax.Array) -> jax.Array:
    """Ones scattered at ``positions`` (where valid) into a signal-shaped
    int32 array; out-of-range positions are dropped."""
    n = shape_ref.shape[-1]
    base = jnp.zeros(shape_ref.shape[:-1] + (n,), jnp.int32)
    pos = jnp.where(valid, positions, jnp.full_like(positions, n))  # n -> dropped

    def one(buf, p):
        return buf.at[p].add(1, mode="drop")

    f = one
    for _ in range(base.ndim - 1):
        f = jax.vmap(f)
    return f(base, pos)


def segment_index(x_like: jax.Array, positions: jax.Array, count: jax.Array,
                  *, cap_to_last_interval: bool) -> jax.Array:
    """Per-sample segment id j: number of knot positions in [1, count-1]
    that are <= the sample index (the reference's ``j_lookup`` semantics,
    ``itd_fourier_decomposition.py:109-113``).  With
    ``cap_to_last_interval`` the id is clamped to ``count-2`` (interval
    semantics used by the spline tiers)."""
    k = lax.broadcasted_iota(jnp.int32, positions.shape, positions.ndim - 1)
    count = jnp.broadcast_to(jnp.asarray(count, jnp.int32), x_like.shape[:-1])
    cnt = count[..., None]
    valid = (k >= 1) & (k < cnt)
    marks = _scatter_add_ones(x_like, positions, valid)
    j = jnp.cumsum(marks, axis=-1)
    cap_v = cnt - 2 if cap_to_last_interval else cnt - 1
    return jnp.minimum(j, jnp.maximum(cap_v, 0)).astype(jnp.int32)


def eval_moment_spline(
    x_like: jax.Array,
    positions: jax.Array,
    values: jax.Array,
    moments: jax.Array,
    h: jax.Array,
    seg: jax.Array,
) -> jax.Array:
    """Evaluate the moment-form cubic on every sample.

    ``S(t) = (1-s)·K_j + s·K_{j+1} + h²/6·[((1-s)³-(1-s))·M_j + (s³-s)·M_{j+1}]``
    with ``s = (t - pos_j)/h_j`` — the closed-form segment evaluation of the
    reference native tier (``itd.cpp:147-153``).  Integer ``positions``
    subtract before casting (exact at any n); float positions keep the
    legacy cast-first order."""
    dtype = values.dtype
    it = lax.broadcasted_iota(jnp.int32, x_like.shape, x_like.ndim - 1)

    pos_j = take_last_axis(positions, seg)
    h_j = take_last_axis(h, seg)
    k_j = take_last_axis(values, seg)
    k_j1 = take_last_axis(values, seg + 1)
    m_j = take_last_axis(moments, seg)
    m_j1 = take_last_axis(moments, seg + 1)

    h_safe = jnp.where(h_j == 0, jnp.ones_like(h_j), h_j)
    if jnp.issubdtype(positions.dtype, jnp.integer):
        s = (it - pos_j).astype(dtype) / h_safe
    else:
        s = (it.astype(dtype) - pos_j.astype(dtype)) / h_safe
    lin = (1.0 - s) * k_j + s * k_j1
    omt = 1.0 - s
    cub = h_j * h_j / 6.0 * ((omt * omt * omt - omt) * m_j + (s * s * s - s) * m_j1)
    return lin, cub


def _scatter_channels(x_like, positions, valid, channels):
    """Scatter per-knot ``channels`` onto the signal grid at ``positions``
    (positions are unique; invalid slots are dropped)."""
    n = x_like.shape[-1]
    pos = jnp.where(valid, positions, jnp.full_like(positions, n))

    def one(p, v, base):
        return base.at[p].set(v, mode="drop")

    f = one
    for _ in range(x_like.ndim - 1):
        f = jax.vmap(f)

    out = []
    for ch in channels:
        base = jnp.zeros(x_like.shape[:-1] + (n,), ch.dtype)
        out.append(f(pos, ch, base))
    return tuple(out)


def eval_moment_spline_scan(x_like, positions, values, moments, h, count):
    """Gather-free twin of :func:`eval_moment_spline` for the MEITD-tier
    segment semantics (endpoints in the knot set, last sample capped to the
    final interval).

    Per-sample knot data is piecewise-constant between knots, so instead of
    six capacity-sized gathers per sample (pathological on TPU lane axes)
    the per-knot channels are scattered onto the signal grid once and
    propagated with the same masked fill scans the linear tier uses:
    the j-side channels forward-fill from every knot except the last, the
    (j+1)-side channels backward-fill strictly-after from every knot except
    the first, and the one sample with no strictly-after knot (the final
    endpoint) is patched with the last knot's channels.
    """
    dtype = values.dtype
    n = x_like.shape[-1]
    it = lax.broadcasted_iota(jnp.int32, x_like.shape, x_like.ndim - 1)
    k = lax.broadcasted_iota(jnp.int32, positions.shape, positions.ndim - 1)
    count = jnp.broadcast_to(jnp.asarray(count, jnp.int32), x_like.shape[:-1])
    cnt = count[..., None]

    valid_j = k < cnt - 1              # j-side: knots 0 .. count-2
    valid_n = (k >= 1) & (k < cnt)     # (j+1)-side: knots 1 .. count-1

    posf = positions.astype(dtype)
    pj_g, kj_g, mj_g, hj_g, occ_j = _scatter_channels(
        x_like, positions, valid_j,
        (posf, values, moments, h, jnp.ones_like(values)),
    )
    kn_g, mn_g, occ_n = _scatter_channels(
        x_like, positions, valid_n,
        (values, moments, jnp.ones_like(values)),
    )

    pos_j, k_j, m_j, h_j = forward_fill_scan(
        (pj_g, kj_g, mj_g, hj_g), occ_j != 0, (0.0, 0.0, 0.0, 1.0)
    )

    def shift_left(a, fill):
        tail = jnp.full_like(a[..., :1], fill)
        return jnp.concatenate([a[..., 1:], tail], axis=-1)

    k_j1, m_j1 = backward_fill_scan(
        (shift_left(kn_g, 0.0), shift_left(mn_g, 0.0)),
        shift_left(occ_n, 0.0) != 0,
        (0.0, 0.0),
    )
    # the final endpoint has no strictly-after knot; it belongs to the last
    # interval, whose right knot is knot count-1
    last_idx = jnp.maximum(cnt - 1, 0)
    k_last = jnp.take_along_axis(values, last_idx, axis=-1)
    m_last = jnp.take_along_axis(moments, last_idx, axis=-1)
    is_last = it == n - 1
    k_j1 = jnp.where(is_last, k_last, k_j1)
    m_j1 = jnp.where(is_last, m_last, m_j1)

    h_safe = jnp.where(h_j == 0, jnp.ones_like(h_j), h_j)
    s = (it.astype(dtype) - pos_j) / h_safe
    lin = (1.0 - s) * k_j + s * k_j1
    omt = 1.0 - s
    cub = h_j * h_j / 6.0 * ((omt * omt * omt - omt) * m_j + (s * s * s - s) * m_j1)
    return lin, cub


def _end_knot_positions(mask_int, iota_f, big):
    """(last1, last2, first1, first2) interior-knot positions along the
    trailing axis in ONE 4-channel top-2-both-directions ``lax.reduce``
    (the serialized forms — chained masked reductions or flip+argmax —
    cost four dependent input passes).  Positions are exact in f32 far
    beyond any padded length here.  Empty slots: last* = -1, first* =
    ``big``; callers map those to their own degenerate encodings."""
    negf = jnp.asarray(-1, iota_f.dtype)
    bigf = jnp.asarray(big, iota_f.dtype)

    def comp(a, b):
        al1, al2, as1, as2 = a
        bl1, bl2, bs1, bs2 = b
        w2l = jnp.where(al1 >= bl1, al2, bl2)
        w2s = jnp.where(as1 <= bs1, as2, bs2)
        return (jnp.maximum(al1, bl1),
                jnp.maximum(jnp.minimum(al1, bl1), w2l),
                jnp.minimum(as1, bs1),
                jnp.minimum(jnp.maximum(as1, bs1), w2s))

    return lax.reduce(
        (jnp.where(mask_int, iota_f, negf), jnp.full_like(iota_f, negf),
         jnp.where(mask_int, iota_f, bigf), jnp.full_like(iota_f, bigf)),
        (negf, negf, bigf, bigf), comp, (iota_f.ndim - 1,),
    )


def _chained_moments(x2, mask, it, iota_f, p1p, p2p, n1p, k_site, k_jm1,
                     k_j1, shift_l, use_spike=False, n_real=None):
    """Per-sample previous/next-knot spline moments via the grid-resident
    chained block PCR (no compact buffers; see :mod:`.chained_pcr`).

    Builds the not-a-knot tridiagonal row of every *interior* knot in
    place from the fill channels (previous/next knot positions and
    Frei-Osorio values), solves on the grid, and recovers the
    extrapolated end moments ``M0``/``M_last``
    (``spline_moments``'s not-a-knot closed forms) from the first/last
    two interior moments via four tiny argmax reductions.

    Returns ``(m_j, m_j1, m_last)``: moment of the knot at-or-before each
    sample, of the knot strictly after, and the end moment (the caller
    patches the final sample with it).
    """
    n = x2.shape[-1]          # buffer width (may include per-row padding)
    n_real = n if n_real is None else n_real  # true row length
    mask_int = mask & (it > 0) & (it < n_real - 1)
    hl_ = iota_f - p2p   # distance to the previous knot (endpoint included)
    hr_ = n1p - iota_f   # distance to the next knot (endpoint included)

    def sdiv(num, den):
        return num / jnp.where(den == 0, jnp.ones_like(den), den)

    a2, b2, c2, d = notaknot_rows(
        hl_, hr_, k_jm1, k_site, k_j1,
        firstrow=p2p == 0,            # previous knot is the left endpoint
        lastrow=n1p == n_real - 1,    # next knot is the right endpoint
    )

    if use_spike:
        from .pallas_spike import chained_block_spike

        u, w = chained_block_spike(mask_int, a2, b2, c2, d)
    else:
        u, w = chained_block_pcr(mask_int, a2, b2, c2, d)
    m_j = u
    m_j1 = shift_l(w)

    # end moments: M0 = M1 + (h0/h1)(M1 - M2), mirrored at the far end,
    # from the first/last two interior knots (argmax = first True)
    def at(arr, idx):
        return jnp.take_along_axis(arr, idx[..., None], axis=-1)

    il1f, il2f, i1f, i2f = _end_knot_positions(mask_int, iota_f, n)
    nnf = jnp.asarray(n, iota_f.dtype)
    # degenerate contract, pinned to the compact solver's conventions
    # (spline_moments reads its masked buffer, where a missing second
    # interior moment is 0, and its h buffer, where the spacing reaches
    # the END knot): with a single interior knot, m2/ml2 := 0, the first
    # h1 spans to the right endpoint, and the last hl2 to the left one.
    # Without this the end-moment extrapolation read the chained solution
    # at argmax-convention positions — backend-defined garbage at nex==1.
    has_i2 = (i2f < nnf)[..., None]
    has_il2 = (il2f >= 0)[..., None]
    i1 = jnp.where(i1f >= nnf, 0, i1f).astype(jnp.int32)
    i2 = jnp.where(i2f >= nnf, 0, i2f).astype(jnp.int32)
    il1 = jnp.where(il1f < 0, n - 1, il1f).astype(jnp.int32)
    il2 = jnp.where(il2f < 0, n - 1, il2f).astype(jnp.int32)

    m1 = at(u, i1)
    m2 = jnp.where(has_i2, at(u, i2), 0.0)
    ml1 = at(u, il1)
    ml2 = jnp.where(has_il2, at(u, il2), 0.0)
    h0 = i1[..., None].astype(x2.dtype)
    h1 = jnp.where(has_i2, (i2 - i1)[..., None],
                   (n_real - 1 - i1)[..., None]).astype(x2.dtype)
    hl = (n_real - 1 - il1)[..., None].astype(x2.dtype)
    hl2 = jnp.where(has_il2, (il1 - il2)[..., None],
                    il1[..., None]).astype(x2.dtype)
    m0 = m1 + sdiv(h0, h1) * (m1 - m2)
    m_last = ml1 + sdiv(hl, hl2) * (ml1 - ml2)

    m_j = jnp.where(p1p == 0, m0, m_j)        # first-interval samples
    m_j1 = jnp.where(n1p == n_real - 1, m_last, m_j1)  # last-interval samples
    return m_j, m_j1, m_last


def _fo_knot_values(xv, it, iota_f, p2p, p2x, n1p, n1x, n_real):
    """Frei-Osorio knot values at knot sites with odd-reflect end values
    (MEITD tier), from the round-1 fill channels.  Returns
    ``(k_site, b_last)`` (``b_first`` only feeds ``k_site``)."""
    span = n1p - p2p
    w = (iota_f - p2p) / jnp.where(span == 0, jnp.ones_like(span), span)
    k_site = 0.5 * (p2x + w * (n1x - p2x)) + 0.5 * xv
    b_first = 0.5 * (3.0 * xv[..., 0] - xv[..., 1])
    b_last = 0.5 * (3.0 * xv[..., n_real - 1] - xv[..., n_real - 2])
    k_site = jnp.where(it == 0, b_first[..., None], k_site)
    k_site = jnp.where(it == n_real - 1, b_last[..., None], k_site)
    return k_site, b_last


def _segment_eval(xv, it, iota_f, p1p, p2p, n1p, k_j, k_jm1, k_j1,
                  m_j, m_j1, m_last, b_last, nex, min_extrema, n_real):
    """Closed-form moment-spline evaluation from per-sample channels,
    with the final-sample patches (its j-side is the second-to-last knot,
    its (j+1)-side the last) and the pass-through guard.  Shared by the
    big-row and packed fills paths."""
    is_last = it == n_real - 1
    m_j1 = jnp.where(is_last, m_last, m_j1)
    pos_j = jnp.where(is_last, p2p, p1p)
    k_j = jnp.where(is_last, k_jm1, k_j)
    k_j1 = jnp.where(is_last, b_last[..., None], k_j1)
    right_pos = jnp.where(is_last, iota_f, n1p)

    h_j = right_pos - pos_j
    h_safe = jnp.where(h_j == 0, jnp.ones_like(h_j), h_j)
    t = (iota_f - pos_j) / h_safe
    omt = 1.0 - t
    baseline = (
        omt * k_j + t * k_j1
        + h_j * h_j / 6.0 * ((omt**3 - omt) * m_j + (t**3 - t) * m_j1)
    )
    return jnp.where((nex < min_extrema)[..., None], xv, baseline)


def _eval_fills_small(x, min_extrema):
    """Packed fills for SHORT rows: many rows share one kernel block.

    At (batch x n) shapes like the 2-D ensemble's (5120 x 256), the
    per-row fills path costs one kernel grid step per row — per-step
    overhead dominates (~350 ms for the 20-iteration ensemble).  Here P =
    BLK // n_pad rows are concatenated into each kernel row, cutting grid
    steps ~P-fold.  Correctness under packing needs NO kernel changes:
    positions are row-LOCAL and every row's endpoints are marked knots,
    so the depth-2 fills never propagate across a row boundary into any
    slot the evaluation reads (cross-boundary values land only in the
    p2/n2 channels of endpoint knots, whose values are overridden, and in
    strictly-after channels of row-end samples, which are patched).  The
    moment solve and all elementwise glue run on the UNPACKED (rows,
    n_pad) view, where rows are fully independent.
    """
    from .pallas_fill import fill2_pallas, BLK

    lead = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    rows = x2.shape[0]
    n_pad = -(-n // 128) * 128
    pack_rows = max(1, BLK // n_pad)
    rpad = -(-rows // pack_rows) * pack_rows
    interp = jax.default_backend() != "tpu"

    xp = jnp.zeros((rpad, n_pad), jnp.float32).at[:rows, :n].set(x2)
    it = lax.broadcasted_iota(jnp.int32, xp.shape, 1)
    iota_f = it.astype(jnp.float32)

    em = jnp.zeros((rpad, n_pad), bool).at[:rows, :n].set(extrema_mask(x2))
    knotmask = (em & (it > 0) & (it < n - 1)) | (it == 0) | (it == n - 1)

    def pk(a):
        return a.reshape(rpad // pack_rows, pack_rows * n_pad)

    def upk(a):
        return a.reshape(rpad, n_pad)

    def shl_packed(a, fill=0.0):
        ap = pk(a)
        out = jnp.concatenate([ap[:, 1:], jnp.full_like(ap[:, :1], fill)],
                              axis=-1)
        return upk(out)

    def fills(val, mask, reverse=False):
        outs = fill2_pallas(pk(iota_f), pk(val), pk(mask), reverse=reverse,
                            interpret=interp)
        return tuple(upk(o) for o in outs)

    p1p, p1x, p2p, p2x = fills(xp, knotmask)
    i1p, i1x, _, _ = fills(xp, knotmask, reverse=True)
    n1p = shl_packed(i1p)
    n1x = shl_packed(i1x)
    mask = (p1p == iota_f) & (it < n)
    nex = jnp.sum(mask, axis=-1).astype(jnp.int32) - 2

    k_site, b_last = _fo_knot_values(xp, it, iota_f, p2p, p2x, n1p, n1x, n)

    f2 = fills(k_site, mask)
    r2 = fills(k_site, mask, reverse=True)
    k_j, k_jm1 = f2[1], f2[3]
    k_j1 = shl_packed(r2[1])

    # moment solve + patches on the UNPACKED view: rows fully independent
    def shl_unpacked(a, fill=0.0):
        return jnp.concatenate([a[..., 1:], jnp.full_like(a[..., :1], fill)],
                               axis=-1)

    m_j, m_j1, m_last2d = _chained_moments(
        xp, mask, it, iota_f, p1p, p2p, n1p, k_site, k_jm1, k_j1,
        shl_unpacked, use_spike=False, n_real=n,
    )

    baseline = _segment_eval(xp, it, iota_f, p1p, p2p, n1p, k_j, k_jm1,
                             k_j1, m_j, m_j1, m_last2d, b_last, nex,
                             min_extrema, n)
    baseline = baseline[:rows, :n].reshape(lead + (n,)).astype(x.dtype)
    nex = nex[:rows].reshape(lead)
    return baseline, nex


def _eval_fills_fused(x, min_extrema, *, interpret=False):
    """Padded-resident TPU cubic tier: Pallas fill kernels + SPIKE factor
    kernel + the fused back-substitution/evaluation kernel
    (:func:`..pallas_spike.spike_backsub_eval`).

    Same math as ``_eval_fills(solver="chained")`` with every big array
    kept in the kernels' padded 3-D layout (no per-stage pad/crop copies),
    the XLA back-substitution + ``m_j1`` shift + segment-evaluation passes
    fused into one kernel, and the end-moment indices found with flip-free
    masked reductions.  Returns ``(baseline, rotation, nex)`` (rotation in
    f32 from the kernel).

    The two fill rounds run as ONE both-direction kernel each
    (``cubic_ksite_padded`` folds the Frei-Osorio knot-value epilogue
    into round 1; ``cubic_neighbors_padded`` derives the knot mask
    in-kernel for round 2): the reverse direction rides each kernel's
    reverse grid walk through an SMEM suffix carry, and only the forward
    per-block folds are precomputed — one XLA reduce pass per round.
    """
    import os as _os

    from .pallas_fill import (
        _LANES, _knot_mask_flat, _pad_edges, cubic_fold_states,
        cubic_ksite_padded, cubic_neighbors_padded, ksite_block_states,
        level_block_states_fwd)

    fold_emit = bool(_os.environ.get("PYITD_FOLD_EMIT"))
    from .pallas_spike import (
        SPIKE_BLK, spike_backsub_eval, spike_factors_padded)
    from .chained_pcr import reduced_interface_solve

    lead = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    rows = x2.shape[0]
    x3, prev_edge, next_edge, npad, nblk = _pad_edges(x2)
    xf = x3.reshape(rows, npad)
    it = lax.broadcasted_iota(jnp.int32, xf.shape, 1)
    iota_f = it.astype(jnp.float32)

    def sdiv(num, den):
        return num / jnp.where(den == 0, jnp.ones_like(den), den)

    def flat(a3):
        return a3.reshape(rows, npad)

    def to3(a):
        return a.reshape(rows, npad // _LANES, _LANES).astype(jnp.float32)

    # round 1: Frei-Osorio knot values (odd-reflect ends) in one kernel
    nex, fwd_prefix = level_block_states_fwd(x3, n)
    b_first = 0.5 * (3.0 * x2[:, 0] - x2[:, 1])
    b_last = 0.5 * (3.0 * x2[:, n - 1] - x2[:, n - 2])
    ks = cubic_ksite_padded(x3, prev_edge, next_edge, b_first, b_last,
                            fwd_prefix, n, interpret=interpret,
                            fold_emit=fold_emit)

    # round 2: neighbor knot positions + values per sample in one kernel;
    # its forward folds come from round 1's kernel when fold_emit is on
    # (the ksite kernel has the mask AND the values in-register — no
    # excluded samples, unlike the sift's baseline folds), else from the
    # two-array XLA sweep
    if fold_emit:
        ks3, ks_folds = ks
        kfwd_prefix = cubic_fold_states(ks_folds)
    else:
        ks3 = ks
        kfwd_prefix = ksite_block_states(x3, ks3, n)
    p1p3, p2p3, n1p3, kj3, kjm13, kj13 = cubic_neighbors_padded(
        x3, ks3, prev_edge, next_edge, kfwd_prefix, n, interpret=interpret)
    k_site = flat(ks3)
    p2p, n1p = flat(p2p3), flat(n1p3)
    k_jm1, k_j1 = flat(kjm13), flat(kj13)

    # not-a-knot rows at interior knots (XLA elementwise, one fused pass)
    mask, _ = _knot_mask_flat(xf, n)
    mask_int = mask & (it > 0) & (it < n - 1)
    a2, b2, c2, d = notaknot_rows(
        iota_f - p2p, n1p - iota_f, k_jm1, k_site, k_j1,
        firstrow=p2p == 0, lastrow=n1p == n - 1,
    )
    factors = spike_factors_padded(to3(mask_int), to3(a2), to3(b2), to3(c2),
                                   to3(d), interpret=interpret)

    # O(blocks) interface solve + per-block scalars for the fused kernel
    def blkv(a3):
        return flat(a3).reshape(rows, nblk, SPIKE_BLK)

    xp1, xp2, vl1, vl2, vr1, vr2 = factors
    e, f = reduced_interface_solve(
        -blkv(vl1)[..., -1], -blkv(vl2)[..., 0],
        -blkv(vr1)[..., -1], -blkv(vr2)[..., 0],
        blkv(xp1)[..., -1], blkv(xp2)[..., 0],
    )
    zeros1 = jnp.zeros_like(e[..., :1])
    e_prev = jnp.concatenate([zeros1, e[..., :-1]], -1)
    f_next = jnp.concatenate([f[..., 1:], zeros1], -1)
    w_first = (blkv(xp2)[..., 0] + blkv(vl2)[..., 0] * e_prev
               + blkv(vr2)[..., 0] * f_next)
    w_first_next = jnp.concatenate([w_first[..., 1:], zeros1], -1)

    # end moments from the first/last two interior knots.  ONE 4-channel
    # top-2-positions reduce (both directions) instead of four chained
    # full-array masked reductions (i2/il2 each depended on the previous
    # reduce, serializing four input passes).  Degenerate contract pinned
    # to the compact solver (see _chained_moments): a missing second
    # interior knot reads moment 0 and spans to the far end knot.
    il1f, il2f, i1f, i2f = _end_knot_positions(mask_int, iota_f, npad)
    has_i2 = i2f < npad
    has_il2 = il2f >= 0
    i1 = i1f.astype(jnp.int32)
    i2 = i2f.astype(jnp.int32)
    il1 = jnp.where(il1f < 0, n - 1, il1f).astype(jnp.int32)
    il2 = il2f.astype(jnp.int32)

    def u_at(idx):
        idxc = jnp.clip(idx, 0, npad - 1)[..., None]
        g = lambda a3: jnp.take_along_axis(flat(a3), idxc, axis=-1)[..., 0]
        bof = idxc // SPIKE_BLK
        ge = jnp.take_along_axis(e_prev, bof, axis=-1)[..., 0]
        gf = jnp.take_along_axis(f_next, bof, axis=-1)[..., 0]
        return g(xp1) + g(vl1) * ge + g(vr1) * gf

    m1 = u_at(jnp.where(i1 >= npad, 0, i1))
    m2 = jnp.where(has_i2, u_at(i2), 0.0)
    ml1 = u_at(il1)
    ml2 = jnp.where(has_il2, u_at(il2), 0.0)
    fdt = jnp.float32
    i1c = jnp.where(i1 >= npad, 0, i1)
    h0 = i1c.astype(fdt)
    h1 = jnp.where(has_i2, i2 - i1c, n - 1 - i1c).astype(fdt)
    hl = (n - 1 - il1).astype(fdt)
    hl2 = jnp.where(has_il2, il1 - il2, il1).astype(fdt)
    m0 = m1 + sdiv(h0, h1) * (m1 - m2)
    m_last = ml1 + sdiv(hl, hl2) * (ml1 - ml2)

    base3, rot3 = spike_backsub_eval(
        factors, e_prev, f_next, w_first_next, m0, m_last, b_last,
        nex < min_extrema, p1p3, p2p3, n1p3, kj3,
        kjm13, kj13, x3, n, interpret=interpret,
    )
    baseline = flat(base3)[:, :n].reshape(lead + (n,))
    rotation = flat(rot3)[:, :n].reshape(lead + (n,))
    return baseline, rotation, nex.reshape(lead)


def _eval_fills(x, capacity, min_extrema, solver="chained"):
    """Fill-kernel MEITD-tier cubic level — the dense-knot TPU shape.

    At noise-driven extrema densities (~2n/3 knots) the scatter/gather
    route costs ~40 ms per transfer at 1M points on v5e; this path keeps
    every per-sample quantity on the signal grid via the Pallas fill2
    kernels.  Two moment solvers:

    * ``solver="chained"`` (default) — no compact buffers at all: the
      knot-space tridiagonal system is embedded on the signal grid as a
      block-2x2 chained system and solved with grid PCR
      (:mod:`.chained_pcr`), whose solution channels are *already* the
      per-sample previous/next-knot moments (replaces one scatter, two
      gathers, and a whole fill round of the compact route).
    * ``solver="compact"`` — the scatter/gather route: compact the knot
      positions, PCR in knot space, scatter moments back, fill round 3.

    f32 end to end (the kernels' dtype); matches the gather/scan
    evaluations to f32 roundoff.
    """
    from .pallas_fill import linear_fill2_pallas, fill2_pallas

    lead = x.shape[:-1]
    n = x.shape[-1]
    x2 = x.reshape(-1, n).astype(jnp.float32)
    interp = jax.default_backend() != "tpu"
    it = lax.broadcasted_iota(jnp.int32, x2.shape, 1)
    iota_f = it.astype(jnp.float32)

    def shift_l(a, fill=0.0):
        return jnp.concatenate(
            [a[..., 1:], jnp.full_like(a[..., :1], fill)], axis=-1
        )

    # round 1: knot-neighbor channels (the kernel's in-kernel mask IS the
    # cubic knot set: interior extrema + both endpoints)
    p1p, p1x, p2p, p2x = linear_fill2_pallas(x2, interpret=interp)
    i1p, i1x, _, _ = linear_fill2_pallas(x2, reverse=True, interpret=interp)
    n1p = shift_l(i1p)
    n1x = shift_l(i1x)
    mask = p1p == iota_f  # a sample is a knot iff it is its own latest knot
    nex = jnp.sum(mask, axis=-1).astype(jnp.int32) - 2

    # knot values at knot sites (Frei-Osorio over this knot's neighbors,
    # odd-reflect end values — MEITD tier semantics)
    k_site, b_last = _fo_knot_values(x2, it, iota_f, p2p, p2x, n1p, n1x, n)

    # round 2: neighbor knot values per sample
    f2 = fill2_pallas(iota_f, k_site, mask, interpret=interp)
    r2 = fill2_pallas(iota_f, k_site, mask, reverse=True, interpret=interp)
    k_j, k_jm1 = f2[1], f2[3]
    k_j1 = shift_l(r2[1])
    is_last = it == n - 1

    if solver == "chained":
        # the Pallas SPIKE solver replaces ~65 ms of full-grid PCR rounds
        # on-chip; the XLA PCR stays for CPU (interpret-mode kernels crawl)
        m_j, m_j1, m_last = _chained_moments(
            x2, mask, it, iota_f, p1p, p2p, n1p, k_site, k_jm1, k_j1,
            shift_l, use_spike=not interp,
        )
    else:
        # compact solve: gather positions + knot values, not-a-knot PCR
        pos_c, kcount = compact_indices(mask, capacity)
        k_c = jnp.take_along_axis(k_site, jnp.clip(pos_c, 0, n - 1), axis=-1)
        moments = spline_moments(pos_c, k_c, kcount,  # int pos: exact h
                                 bc="not-a-knot")
        cnt = kcount[..., None]
        kk = lax.broadcasted_iota(jnp.int32, pos_c.shape, pos_c.ndim - 1)
        m_grid, = _scatter_channels(x2, pos_c, kk < cnt, (moments,))

        # round 3: neighbor moments per sample
        f3 = fill2_pallas(iota_f, m_grid, mask, interpret=interp)
        r3 = fill2_pallas(iota_f, m_grid, mask, reverse=True, interpret=interp)
        m_j = f3[1]
        m_j1 = shift_l(r3[1])
        last_idx = jnp.maximum(cnt - 1, 0)
        m_last = jnp.take_along_axis(moments, last_idx, axis=-1)
        m_j = jnp.where(is_last, f3[3], m_j)

    baseline = _segment_eval(x2, it, iota_f, p1p, p2p, n1p, k_j, k_jm1,
                             k_j1, m_j, m_j1, m_last, b_last, nex,
                             min_extrema, n)
    baseline = baseline.reshape(lead + (n,)).astype(x.dtype)
    nex = nex.reshape(lead)
    return baseline, nex


class CubicBaselineResult(NamedTuple):
    rotation: jax.Array
    baseline: jax.Array
    num_extrema: jax.Array


class _TemplatePeriodPlan(NamedTuple):
    """Host-side static plan for the PERIODIC template fast path (see
    :func:`_template_period_plan`)."""
    q0: int            # knots per period
    span: int          # samples per period
    R: int             # compaction rows (ceil(m / q0))
    m: int             # interior ("core") knot count = count - 2
    S: object          # (2*span, q0) one-hot compaction matrix (numpy)
    r_hi: int          # interior eval rows are [1, r_hi)
    start0: int        # knot-axis offset of row 1's eval window
    WK: object         # (3*q0, span) static knot-eval weights (numpy)
    WM: object         # (3*q0, span) static moment-eval weights (numpy)
    head_j: object     # (span,) segment ids of samples [0, span)
    head_w: object     # 4 x (span,) closed-form weights for the head
    tail_j: object     # segment ids of samples [r_hi*span, n)
    tail_w: object     # 4 x (.,) weights for the tail
    bad_core: object   # (nb,) core-knot indices where actual != ideal grid
    bad_pos: object    # (nb,) their ACTUAL sample positions
    bad_idx: object    # (ns,) sample indices evaluated off-pattern
    bad_j: object      # (ns,) their ACTUAL segment ids
    bad_w: object      # 4 x (ns,) their ACTUAL closed-form weights


def _template_period_plan(pos, count: int, n: int, hint, h64, seg):
    """Verify that the template knot grid is EXACTLY periodic and bake the
    static matrices of the matmul evaluation path.

    The sine-template tier's knot positions are zero crossings of
    ``sin(2*pi*f*t)`` on an integer sample grid: with ``g = gcd(2f, sr)``
    the crossing pattern repeats every ``span = sr/g`` samples with
    ``q0 = 2f/g`` crossings per period (``hint`` carries that candidate;
    floating-point sign flips near exact zeros can break it, so it is
    VERIFIED against the actual position buffer and the plan is refused on
    any mismatch — the caller then keeps the generic gather path).

    With periodicity, both gathers of the static path become one-hot
    matmuls on the MXU (a scalar gather of the 887k-knot densest comb
    entry measured 5.8 ms on v5e; the equivalent selection matmul is
    FLOP-trivial):

    * compaction ``x[core]``: window rows ``x[r*span : r*span + 2*span]``
      times a static ``(2*span, q0)`` one-hot — ``core[r*q0+j] =
      core[j] + r*span`` puts knot ``j`` of every row at the SAME window
      offset;
    * evaluation: the closed form ``w1*K[seg] + w2*K[seg+1] + w3*M[seg] +
      w4*M[seg+1]`` has STATIC per-sample weights (they depend only on
      positions), periodic with the same ``span`` — so interior rows
      evaluate as two matmuls ``knot_windows @ WK + moment_windows @ WM``
      with the selection folded into the weight matrices.  Head/tail rows
      (knot-0 region, last-segment linear quirk, the ``h = -e`` tail) are
      patched exactly via small static gathers.
    """
    import numpy as np

    q0, span = int(hint[0]), int(hint[1])
    m = count - 2
    if q0 < 1 or span < 8 or span > 4096 or m < 4 * q0 + 2:
        return None
    core = pos[1:count - 1]
    if core[0] < 0:
        return None
    R = -(-m // q0)
    R2 = n // span
    if R2 < 4:
        return None

    # majority (mode) offset pattern per residue class: floating-point
    # sign flips near exact template zeros perturb ~0.03% of crossings by
    # +-1 sample — the IDEAL grid carries the matmuls, the deviants ride
    # tiny exact patch lists
    karange = np.arange(m)
    offs = core - (karange // q0) * span
    off2 = np.concatenate(
        [offs, np.full(R * q0 - m, -1, np.int64)]).reshape(R, q0)
    pattern = np.empty(q0, np.int64)
    for j in range(q0):
        col = off2[:, j]
        vals, cnts = np.unique(col[col >= 0], return_counts=True)
        pattern[j] = vals[np.argmax(cnts)]
    if (pattern[0] < 0 or int(pattern.max()) >= 2 * span
            or np.any(np.diff(pattern) <= 0)
            or int(pattern[-1]) >= int(pattern[0]) + span):
        return None
    core_ideal = pattern[karange % q0] + (karange // q0) * span
    bad_core = np.nonzero(core_ideal != core)[0]
    if bad_core.size > max(64, m // 64):
        return None

    # the ideal grid's row-1 segment pattern and weight matrices
    pos_ideal = pos.copy()
    pos_ideal[1:count - 1] = core_ideal
    grid = pos_ideal[1:count]
    seg_id1 = np.searchsorted(
        grid, np.arange(span, 2 * span), side="right").astype(np.int64)
    trel = seg_id1 - q0
    tmin, tmax = int(trel.min()), int(trel.max())
    if q0 + tmin < 0 or tmax - tmin + 2 > 3 * q0:
        return None
    # interior rows must stay clear of the tail quirks (the linear-only
    # last segment, h[count-1] = -e, the never-written knot count-1): the
    # eval reads knots/moments up to seg+1, so cap at seg <= count-4
    r_hi = min(R2, (count - 4 - tmax) // q0)
    if r_hi < 3 or (n - r_hi * span) > 9 * span:
        return None

    e_next_ideal = np.concatenate([pos_ideal[1:], [0]])
    h_ideal = np.where(np.arange(count + 2) < count,
                       (e_next_ideal - pos_ideal).astype(np.float64), 0.0)

    # row-1 ideal weights
    idx1 = np.arange(span, 2 * span)
    pj = pos_ideal[seg_id1].astype(np.float64)
    hj = h_ideal[seg_id1]
    hs = np.where(hj == 0, 1.0, hj)
    sf = (idx1 - pj) / hs
    omt = 1.0 - sf
    hh = np.where(seg_id1 == count - 2, 0.0, hj * hj / 6.0)
    w1, w2, w3, w4 = omt, sf, hh * (omt ** 3 - omt), hh * (sf ** 3 - sf)

    krel = (trel - tmin).astype(np.int64)
    sr_ = np.arange(span)
    WK = np.zeros((3 * q0, span))
    WK[krel, sr_] += w1
    WK[krel + 1, sr_] += w2
    WM = np.zeros((3 * q0, span))
    WM[krel, sr_] += w3
    WM[krel + 1, sr_] += w4

    S = np.zeros((2 * span, q0))
    S[pattern, np.arange(q0)] = 1.0

    def coeff_actual(idx):
        j = seg[idx].astype(np.int64)
        pjj = pos[j].astype(np.float64)
        hjj = h64[j]
        hss = np.where(hjj == 0, 1.0, hjj)
        sff = (idx - pjj) / hss
        omtt = 1.0 - sff
        hhh = np.where(j == count - 2, 0.0, hjj * hjj / 6.0)
        return (omtt, sff, hhh * (omtt ** 3 - omtt),
                hhh * (sff ** 3 - sff)), j

    head_w, head_j = coeff_actual(np.arange(span))
    tail_w, tail_j = coeff_actual(np.arange(r_hi * span, n))

    # samples whose segment/weights the ideal pattern gets wrong: the
    # segments flanking each deviant knot (deviation is +-1 sample, so
    # the affected window is [knot k-1, knot k+1) in both grids)
    if bad_core.size:
        ranges = []
        for kk in bad_core:
            lo = core[kk - 1] if kk > 0 else 0
            lo = min(lo, core_ideal[kk - 1] if kk > 0 else 0)
            hi = core[kk + 1] if kk + 1 < m else n
            hi = max(hi, core_ideal[kk + 1] if kk + 1 < m else n)
            ranges.append(np.arange(max(lo, span),
                                    min(hi, r_hi * span)))
        bad_idx = np.unique(np.concatenate(ranges)) if ranges else \
            np.zeros(0, np.int64)
    else:
        bad_idx = np.zeros(0, np.int64)
    if bad_idx.size > max(4096, n // 64):
        return None
    bad_w, bad_j = coeff_actual(bad_idx) if bad_idx.size else (
        (np.zeros(0),) * 4, np.zeros(0, np.int64))

    return _TemplatePeriodPlan(
        q0=q0, span=span, R=R, m=m, S=S, r_hi=r_hi,
        start0=q0 + tmin, WK=WK, WM=WM,
        head_j=head_j, head_w=head_w, tail_j=tail_j, tail_w=tail_w,
        bad_core=bad_core, bad_pos=core[bad_core],
        bad_idx=bad_idx, bad_j=bad_j, bad_w=bad_w)


def _template_fast_baseline_static(x: jax.Array, pos_in, count: int,
                                   period_hint=None) -> jax.Array:
    """Static-positions fast path of :func:`template_fast_baseline`.

    The sine-template tier's knot positions depend only on (sample_rate,
    n) — pure config — so everything positional is precomputed with
    numpy at trace time: the per-sample segment map, the interpolation
    parameter ``s`` and its cubic coefficients become baked constants,
    and the whole evaluation collapses to ONE static-index row gather of
    the (knots, knots_next, moments, moments_next) channel matrix — on
    v5e a (cap,4)->(n,4) static row gather measured 1.1 ms vs 6.9 ms for
    a single scalar gather and ~50 ms for the scatter+fill route this
    replaces.  Per-frequency buffers are also TRIMMED to count+2 slots
    (the padded comb buffer made every frequency pay the densest comb
    entry's moment solve)."""
    import numpy as np

    dtype = x.dtype
    npdt = np.dtype(dtype)
    n = x.shape[-1]
    lead = x.shape[:-1]
    cap2 = count + 2
    k = np.arange(cap2)
    pos = np.zeros(cap2, np.int64)
    pos[:count] = np.asarray(pos_in[:count], np.int64)

    e_prev = np.concatenate([[0], pos[:-1]])
    e_next = np.concatenate([pos[1:], [0]])
    span = (e_next - e_prev).astype(npdt)
    w = (pos - e_prev).astype(npdt) / np.where(span == 0, np.ones_like(span), span)

    h_np = (e_next - pos).astype(np.float64)  # h[count-1] = -e, as in the ref
    h_np = np.where(k < count, h_np, np.zeros_like(h_np))
    seg = np.searchsorted(pos[1:count], np.arange(n), side="right").astype(np.int32)

    plan = None
    if period_hint is not None and not (
            dtype == jnp.float64 and jax.default_backend() == "tpu"):
        plan = _template_period_plan(pos, count, n, period_hint, h_np, seg)

    if plan is not None:
        # compaction x[core] as one one-hot matmul over period windows
        q0, spn, R = plan.q0, plan.span, plan.R
        need = (R + 1) * spn
        xp = x
        if need > n:
            xp = jnp.concatenate(
                [x, jnp.zeros(lead + (need - n,), dtype)], axis=-1)
        xa = xp[..., : R * spn].reshape(lead + (R, spn))
        xb = xp[..., spn:(R + 1) * spn].reshape(lead + (R, spn))
        core_vals = jnp.einsum(
            "...rk,kj->...rj", jnp.concatenate([xa, xb], axis=-1),
            jnp.asarray(plan.S.astype(npdt)),
            precision=lax.Precision.HIGHEST)
        core_vals = core_vals.reshape(lead + (R * q0,))[..., :plan.m]
        ex_idx = int(min(max(int(pos[count - 1]), 0), n - 1))
        xe = jnp.concatenate(
            [x[..., :1], core_vals, x[..., ex_idx:ex_idx + 1],
             jnp.broadcast_to(x[..., :1], lead + (2,))], axis=-1)
        if plan.bad_core.size:
            # deviant crossings (actual != ideal grid): overwrite with
            # the signal at the ACTUAL positions (tiny static scatter)
            xe = xe.at[..., jnp.asarray(
                (plan.bad_core + 1).astype(np.int32))].set(
                jnp.take(x, jnp.asarray(plan.bad_pos.astype(np.int32)),
                         axis=-1))
    else:
        xe = jnp.take(x, jnp.asarray(np.clip(pos, 0, n - 1)), axis=-1)
    x_prev = jnp.concatenate([jnp.zeros_like(xe[..., :1]), xe[..., :-1]], axis=-1)
    x_next = jnp.concatenate([xe[..., 1:], jnp.zeros_like(xe[..., :1])], axis=-1)
    interior = 0.5 * (x_prev + jnp.asarray(w) * (x_next - x_prev)) + 0.5 * xe

    knots = interior
    knots = jnp.where(jnp.asarray(k == 0), xe, knots)
    knots = jnp.where(jnp.asarray(k == count - 1), 0.0, knots)   # never written
    knots = jnp.where(jnp.asarray(k == count), x[..., :1], knots)  # x[0] quirk
    knots = jnp.where(jnp.asarray(k > count), 0.0, knots)

    h = h_np.astype(npdt)
    # "banded": the truncated affine doubling (64-knot exact window; the
    # recurrence's propagator decays below f64 roundoff well inside it —
    # ops/tridiag._affine_scan_banded).  At template-comb knot counts the
    # full log-depth scan ran 20 rounds where 6 carry all the signal.
    moments = reference_spline_moments(knots, jnp.asarray(h),
                                       jnp.int32(count), method="banded")

    if plan is not None:
        # evaluation as two matmuls: interior rows select + weight the
        # knot/moment windows with the static WK/WM matrices; head/tail
        # rows (segment 0, the lastlin/-e quirk region, the ragged end)
        # use the closed form with baked weights and SMALL static gathers
        q0, spn, RI = plan.q0, plan.span, plan.r_hi - 1
        needk = plan.start0 + (RI + 2) * q0

        def windows(v):
            vv = v
            if needk > cap2:
                vv = jnp.concatenate(
                    [v, jnp.zeros(lead + (needk - cap2,), dtype)], axis=-1)
            return jnp.concatenate(
                [vv[..., plan.start0 + c * q0: plan.start0 + (c + RI) * q0]
                 .reshape(lead + (RI, q0)) for c in range(3)], axis=-1)

        inter = (jnp.einsum("...rk,ks->...rs", windows(knots),
                            jnp.asarray(plan.WK.astype(npdt)),
                            precision=lax.Precision.HIGHEST)
                 + jnp.einsum("...rk,ks->...rs", windows(moments),
                              jnp.asarray(plan.WM.astype(npdt)),
                              precision=lax.Precision.HIGHEST))
        inter = inter.reshape(lead + (RI * spn,))

        def patch(jidx, ws):
            j = jnp.asarray(jidx.astype(np.int32))
            j1 = jnp.asarray((jidx + 1).astype(np.int32))
            kj = jnp.take(knots, j, axis=-1)
            kj1 = jnp.take(knots, j1, axis=-1)
            mj = jnp.take(moments, j, axis=-1)
            mj1 = jnp.take(moments, j1, axis=-1)
            w1_, w2_, w3_, w4_ = (jnp.asarray(a.astype(npdt)) for a in ws)
            return w1_ * kj + w2_ * kj1 + w3_ * mj + w4_ * mj1

        head = patch(plan.head_j, plan.head_w)
        tail = patch(plan.tail_j, plan.tail_w)
        out = jnp.concatenate([head, inter, tail], axis=-1)
        if plan.bad_idx.size:
            # samples in segments flanking deviant crossings: the ideal
            # pattern's weights are wrong there — overwrite with the
            # exact closed form at the ACTUAL grid (tiny static scatter)
            out = out.at[..., jnp.asarray(plan.bad_idx.astype(np.int32))
                         ].set(patch(plan.bad_j, plan.bad_w))
        return out

    # generic static path: ONLY the segment map is baked (one i32 (n,)
    # constant per frequency — baking the interpolation coefficients too
    # quadrupled the remote-compile payload and tripped the relay's
    # request-size limit); per-knot channels ride the single row gather
    # and the coefficients derive on-device from them.
    def shl(a):
        return jnp.concatenate([a[..., 1:], jnp.zeros_like(a[..., :1])], axis=-1)

    pos_f = jnp.asarray(pos.astype(npdt))
    h_f = jnp.asarray(h)
    # lastlin flag per knot: the reference's linear-only last segment
    lastlin = jnp.asarray((k == count - 2).astype(npdt))
    chan = jnp.stack(
        [jnp.broadcast_to(pos_f, x.shape[:-1] + (cap2,)),
         jnp.broadcast_to(h_f, x.shape[:-1] + (cap2,)),
         jnp.broadcast_to(lastlin, x.shape[:-1] + (cap2,)),
         knots, shl(knots), moments, shl(moments)], axis=-1)
    g = jnp.take(chan, jnp.asarray(seg), axis=-2)  # (..., n, 7)
    pos_j, h_j, is_lastlin = g[..., 0], g[..., 1], g[..., 2]
    k_j, k_j1, m_j, m_j1 = g[..., 3], g[..., 4], g[..., 5], g[..., 6]

    it = jnp.asarray(np.arange(n, dtype=npdt))
    h_safe = jnp.where(h_j == 0, jnp.ones_like(h_j), h_j)
    s = (it - pos_j) / h_safe
    omt = 1.0 - s
    hh = jnp.where(is_lastlin > 0, 0.0, h_j * h_j / 6.0)  # zero cub there
    return (omt * k_j + s * k_j1
            + hh * ((omt * omt * omt - omt) * m_j + (s * s * s - s) * m_j1))


def template_fast_baseline(x: jax.Array, positions: jax.Array, count: jax.Array,
                           *, period_hint=None) -> jax.Array:
    """Native-tier ("fast") cubic baseline with caller-supplied knot positions.

    ``positions[..., cap]`` is zero-padded past ``count`` (mirroring the
    reference's zero-initialized extrema buffers, which is load-bearing:
    the one-past-the-end knot value resolves to ``x[0]``).

    When ``positions`` is a host numpy array and ``count`` a python int
    (the sine-template tier: positions are pure config), dispatches to
    the static fast path (:func:`_template_fast_baseline_static`);
    ``period_hint=(q0, span)`` additionally offers the exact knot-grid
    periodicity candidate for the matmul evaluation path (verified
    against the buffer, silently ignored when it does not hold — see
    :func:`_template_period_plan`)."""
    import numpy as _np

    # f32 position ceiling (ADVICE r4): both paths evaluate
    # s = (it - pos_j) / h with a float sample grid — for f32 inputs the
    # grid aliases past 2^24 samples, the silent-corruption mode guarded
    # everywhere else.  f64 is exact to 2^53.
    if x.dtype == jnp.float32 and x.shape[-1] > (1 << 24):
        raise ValueError(
            f"n={x.shape[-1]} exceeds the f32 sample-grid ceiling "
            f"(2^24={1 << 24}) of template_fast_baseline; use a float64 "
            "input."
        )
    if isinstance(positions, _np.ndarray) and isinstance(
            count, (int, _np.integer)):
        return _template_fast_baseline_static(x, positions, int(count),
                                              period_hint=period_hint)
    dtype = x.dtype
    k = lax.broadcasted_iota(jnp.int32, positions.shape, positions.ndim - 1)
    count = jnp.broadcast_to(jnp.asarray(count, jnp.int32), x.shape[:-1])
    cnt = count[..., None]

    pos = jnp.where(k < cnt, positions, jnp.zeros_like(positions))
    pos_f = pos.astype(dtype)
    xe = take_last_axis(x, pos)  # clamped read (defined replacement for ref UB)

    e_prev = jnp.concatenate([jnp.zeros_like(pos[..., :1]), pos[..., :-1]], axis=-1)
    e_next = jnp.concatenate([pos[..., 1:], jnp.zeros_like(pos[..., :1])], axis=-1)
    x_prev = jnp.concatenate([jnp.zeros_like(xe[..., :1]), xe[..., :-1]], axis=-1)
    x_next = jnp.concatenate([xe[..., 1:], jnp.zeros_like(xe[..., :1])], axis=-1)

    span = (e_next - e_prev).astype(dtype)
    w = (pos - e_prev).astype(dtype) / jnp.where(span == 0, jnp.ones_like(span), span)
    interior = 0.5 * (x_prev + w * (x_next - x_prev)) + 0.5 * xe

    knots = interior
    knots = jnp.where(k == 0, xe, knots)                       # K[0] = x[e0]
    knots = jnp.where(k == cnt - 1, jnp.zeros_like(knots), knots)  # never written
    knots = jnp.where(k == cnt, take_last_axis(x, jnp.zeros_like(pos)), knots)  # x[0]
    knots = jnp.where(k > cnt, jnp.zeros_like(knots), knots)

    h = (e_next - pos).astype(dtype)  # h[count-1] = -e[count-1], as in the ref
    h = jnp.where(k < cnt, h, jnp.zeros_like(h))

    moments = reference_spline_moments(knots, h, count)

    # Gather-free evaluation: the reference's segment id at sample t is
    # the number of knots 1..count-1 at or before t, and every per-sample
    # quantity the closed form reads — pos[seg], K[seg], K[seg+1],
    # M[seg], M[seg+1], h[seg] — is piecewise-constant between knots.
    # Scatter those channels onto the grid AT knots 1..count-1 and
    # forward-fill once (defaults = the knot-0 channels for the region
    # before the first interior knot).  Values are selected, never
    # recombined, so this is bit-identical to the earlier per-sample
    # gather route, which cost six capacity-sized gathers plus a
    # scatter+cumsum segment pass per template frequency (~pathological
    # on TPU at the 1M-knot audio combs of BASELINE config 5).
    k_next = jnp.concatenate([knots[..., 1:], jnp.zeros_like(knots[..., :1])], axis=-1)
    m_next = jnp.concatenate([moments[..., 1:], jnp.zeros_like(moments[..., :1])], axis=-1)
    # marks at knots 0..count-1 (knot 0's slot carries the seg-0
    # channels); samples before pos[0] are patched from the k=0 slots
    valid_mark = k < cnt
    chans = (pos_f, knots, k_next, moments, m_next, h)
    scat = _scatter_channels(
        x, pos, valid_mark, chans + (jnp.ones_like(knots),))
    filled = forward_fill_scan(scat[:-1] + (scat[-1],), scat[-1] != 0,
                               (0.0,) * 7)
    seen = filled[-1] > 0

    def at0(c):  # the k=0 slot, broadcast over samples (static slice)
        return c[..., :1]

    pos_j, k_j, k_j1, m_j, m_j1, h_j = (
        jnp.where(seen, f, at0(c)) for f, c in zip(filled[:-1], chans)
    )

    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1).astype(dtype)
    h_safe = jnp.where(h_j == 0, jnp.ones_like(h_j), h_j)
    s = (it - pos_j) / h_safe
    omt = 1.0 - s
    lin = omt * k_j + s * k_j1
    cub = h_j * h_j / 6.0 * ((omt**3 - omt) * m_j + (s**3 - s) * m_j1)

    # the reference's last SEGMENT (seg == count-2) is linear-only:
    # identified by its left knot's position (positions are unique ints,
    # so the equality is unambiguous)
    pos_cnt2 = jnp.take_along_axis(pos_f, jnp.maximum(cnt - 2, 0), axis=-1)
    last_lin = pos_j == pos_cnt2
    return jnp.where(last_lin, lin, lin + cub)


def cubic_baseline_extract(
    x: jax.Array, capacity: int, *, min_extrema: int = 10,
    eval_backend: str = "auto",
) -> CubicBaselineResult:
    """MEITD-tier cubic baseline: extrema knots + not-a-knot spline.

    With fewer than ``min_extrema`` interior extrema the baseline is the
    signal itself (rotation 0) — the reference's pass-through guard
    (``numba_accelerated_itd.py:188-190``).  Pass ``min_extrema=0`` to
    disable (MEITD's own extract has the guard commented out and relies on
    its drivers to never call below 6 extrema).

    ``eval_backend``: "gather" (per-sample gathers — fast on CPU), "scan"
    (scatter + masked fill scans), "fills" (Pallas fill kernels + the
    grid-resident chained-PCR moment solve — the dense-knot TPU shape,
    f32), "fills_packed" (short rows packed many-per-kernel-block — the
    batched small-n TPU shape, f32), "fills_compact" (fill kernels +
    compact-knot-space PCR with scatter/gather movement — kept for A/B
    verification), or "auto" (gather on CPU; on TPU "fills" at
    n >= 4096 and "fills_packed" below).  Numerically identical up to
    f32 roundoff on the fills paths.

    ``capacity`` bounds the compact knot buffers of the gather / scan /
    fills_compact backends (knots beyond it are dropped); the chained
    fills backends have no compact buffers and ignore it — pass a
    capacity covering the worst case (interior extrema + 2) when
    cross-backend agreement matters.

    Differentiable through EVERY backend: the Pallas fills backends carry
    a custom VJP whose backward differentiates the equivalent XLA
    formulation (scan on accelerators, gather on CPU) — the knot
    STRUCTURE is treated as locally constant in x, exactly like AD of the
    where/select gather formulation (pinned in tests)."""
    eval_backend = _resolve_cubic_backend(eval_backend, x.shape[-1])
    _check_cubic_ceiling(x, eval_backend)
    if eval_backend in _PALLAS_BACKENDS:
        return _cubic_extract_structural(x, capacity, min_extrema,
                                         eval_backend)
    return _cubic_extract_impl(x, capacity, min_extrema, eval_backend)


def _resolve_cubic_backend(eval_backend: str, n: int) -> str:
    if eval_backend != "auto":
        return eval_backend
    if jax.default_backend() == "cpu":
        return "gather"
    if n >= 4096:
        return "fills"
    # short rows: pack many rows per kernel block — the per-row
    # fills path is grid-step-overhead-bound there (the 2-D
    # ensemble's (5120 x 256) shape spent ~350 ms on overhead
    # with every unpacked backend)
    return "fills_packed"


def _check_cubic_ceiling(x: jax.Array, eval_backend: str) -> None:
    """f32 position ceiling, applied to the RESOLVED backend: the fills
    backends compute in f32 end to end (any input dtype) and the scan
    backend scatters f32 position channels — past 2^24 samples those
    alias and the spline silently corrupts, so refuse loudly.  The gather
    backend keeps positions as integers end to end (spline_moments and
    eval_moment_spline difference before casting) and is exact at any n
    and any dtype; f64 scan is exact to 2^53."""
    if x.shape[-1] <= (1 << 24) or eval_backend == "gather":
        return
    if eval_backend == "scan" and x.dtype != jnp.float32:
        return
    raise ValueError(
        f"n={x.shape[-1]} exceeds the f32 knot-position ceiling "
        f"(2^24={1 << 24}) of the {eval_backend!r} backend; use "
        "eval_backend='gather' (exact integer positions at any n) or a "
        "float64 input with 'scan'."
    )


def _cubic_extract_structural(x, capacity, min_extrema, eval_backend):
    """The fills backends behind a custom VJP.

    The Pallas fill/SPIKE kernels have no AD rules — ``jax.grad`` through
    them raised ``TypeError: Zero(...) is not a valid JAX type`` (same
    failure the linear sift fixed in round 4; this ports that fix, as the
    round-4 verdict required).  The backward differentiates the scan
    formulation (gather on CPU), which computes the same function: the
    level is linear in x for fixed knot structure, and the structure is
    x-a.e.-constant.  Knot truncation delta: the chained fills forwards
    ignore ``capacity`` (never truncate), so the backward runs with
    capacity >= n to differentiate the same untruncated function — under
    a deliberately small capacity with ``fills_compact`` the gradient is
    that of the untruncated map.
    """

    @jax.custom_vjp
    def level(xx):
        return _cubic_extract_impl(xx, capacity, min_extrema, eval_backend)

    def fwd(xx):
        return level(xx), xx

    def bwd(xx, ct):
        g_rot, g_base, _g_nex = ct

        def z(g):
            # float0 / symbolic-zero cotangents arrive for unused outputs
            if g is None or getattr(g, "dtype", None) == jax.dtypes.float0:
                return jnp.zeros_like(xx)
            return g

        diff_backend = ("gather" if jax.default_backend() == "cpu"
                        else "scan")
        cap_bwd = max(capacity, xx.shape[-1] + 2)

        def f(xi):
            r = _cubic_extract_impl(xi, cap_bwd, min_extrema, diff_backend)
            return r.rotation, r.baseline

        _, pull = jax.vjp(f, xx)
        return (pull((z(g_rot), z(g_base)))[0],)

    level.defvjp(fwd, bwd)
    return level(x)


def _cubic_extract_impl(x, capacity, min_extrema, eval_backend):
    """Backend dispatch after resolution + ceiling checks (no AD
    protection — :func:`cubic_baseline_extract` is the public entry)."""
    if eval_backend == "fills_packed":
        baseline, nex = _eval_fills_small(x, min_extrema)
        return CubicBaselineResult(
            rotation=x - baseline, baseline=baseline, num_extrema=nex
        )
    if eval_backend in ("fills", "fills_fused", "fills_unfused",
                        "fills_compact"):
        if (eval_backend != "fills_compact"
                and capacity < x.shape[-1]):
            # the chained backends have no compact buffers and ignore
            # capacity entirely, while gather/scan/fills_compact truncate
            # knots beyond it — a deliberately small capacity silently
            # diverges across backends, so flag it at trace time.  Worst
            # case: every interior sample an extremum (n - 2) plus the
            # two end knots = n.
            import warnings

            warnings.warn(
                f"cubic_baseline_extract: capacity={capacity} < worst-case "
                f"knot count ({x.shape[-1]}); the chained fills "
                "backends ignore capacity, so results may differ from the "
                "truncating gather/scan/fills_compact backends",
                stacklevel=2,
            )
        if eval_backend == "fills_fused" or (
                eval_backend == "fills" and jax.default_backend() == "tpu"):
            # padded-resident route with the fused SPIKE backsub+eval
            # kernel; "fills_fused" forces it (interpret mode off-TPU,
            # for parity tests)
            baseline, rot, nex = _eval_fills_fused(
                x, min_extrema, interpret=jax.default_backend() != "tpu")
            baseline = baseline.astype(x.dtype)
            rotation = (rot if x.dtype == jnp.float32 else x - baseline)
            return CubicBaselineResult(
                rotation=rotation, baseline=baseline, num_extrema=nex
            )
        solver = ("compact" if eval_backend == "fills_compact" else
                  "chained")  # "fills" (CPU) and "fills_unfused" (A/B)
        baseline, nex = _eval_fills(x, capacity, min_extrema, solver=solver)
        return CubicBaselineResult(
            rotation=x - baseline, baseline=baseline, num_extrema=nex
        )

    dtype = x.dtype
    n = x.shape[-1]
    mask = extrema_mask(x)
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    knotmask = mask | (it == 0) | (it == n - 1)
    pos, kcount = compact_indices(knotmask, capacity)
    nex = jnp.sum(mask, axis=-1).astype(jnp.int32)

    b_first = 0.5 * (3.0 * x[..., 0] - x[..., 1])
    b_last = 0.5 * (3.0 * x[..., n - 1] - x[..., n - 2])

    k = lax.broadcasted_iota(jnp.int32, pos.shape, pos.ndim - 1)
    cnt = kcount[..., None]
    xe = take_last_axis(x, pos)
    e_prev = jnp.concatenate([jnp.zeros_like(pos[..., :1]), pos[..., :-1]], axis=-1)
    e_next = jnp.concatenate([pos[..., 1:], jnp.zeros_like(pos[..., :1])], axis=-1)
    x_prev = jnp.concatenate([jnp.zeros_like(xe[..., :1]), xe[..., :-1]], axis=-1)
    x_next = jnp.concatenate([xe[..., 1:], jnp.zeros_like(xe[..., :1])], axis=-1)
    span = (e_next - e_prev).astype(dtype)
    w = (pos - e_prev).astype(dtype) / jnp.where(span == 0, jnp.ones_like(span), span)
    knots = 0.5 * (x_prev + w * (x_next - x_prev)) + 0.5 * xe
    knots = jnp.where(k == 0, b_first[..., None], knots)
    knots = jnp.where(k == cnt - 1, b_last[..., None], knots)
    knots = jnp.where(k >= cnt, jnp.zeros_like(knots), knots)

    moments = spline_moments(pos, knots, kcount, bc="not-a-knot")  # int pos: exact h
    h = (e_next - pos).astype(dtype)
    h = jnp.where(k < cnt - 1, h, jnp.ones_like(h))
    if eval_backend == "gather":
        seg = segment_index(x, pos, kcount, cap_to_last_interval=True)
        lin, cub = eval_moment_spline(x, pos, knots, moments, h, seg)
    elif eval_backend == "scan":
        lin, cub = eval_moment_spline_scan(x, pos, knots, moments, h, kcount)
    else:
        raise ValueError(f"unknown eval_backend: {eval_backend!r}")
    baseline = lin + cub

    passthrough = nex < min_extrema
    baseline = jnp.where(passthrough[..., None], x, baseline)
    rotation = x - baseline
    return CubicBaselineResult(rotation=rotation, baseline=baseline, num_extrema=nex)
