"""Pallas TPU kernel for the last-two-marked fill — the ITD hot path.

The XLA associative-scan fills run ~3% of HBM bandwidth (every log-pass
round-trips HBM).  This kernel streams each signal row once: the grid walks
(row, block) sequentially, a block is filled hierarchically in VMEM
(lane-axis doubling, then sublane-axis doubling over lane summaries), and
the cross-block carry lives in SMEM scratch — so HBM sees one read of the
channels and one write of the four fill outputs per direction.

The kernel is a generic two-channel fill2: callers pass (pos, value) as
plain arrays, so shifts/flips/padding happen in cheap XLA elementwise land
and the kernel stays oblivious to orientation.  **Precondition: marked
positions are non-negative** — the scan state encodes "no mark seen" as a
negative position, which drops the separate saturating-count channel of the
XLA scan backend (``ops/fill.py`` ``_fill2_combine``).  That encoding cuts
the per-step VPU work by ~25% on a compute-bound kernel: 4 carried channels
instead of 5 (fewer rolls), 2 comparisons instead of 3, no count add/min,
and border masking only on the two position channels (value channels may
carry garbage wherever the position is negative — one select per output at
block end restores the scan backend's zero-defaults exactly).
"""
from __future__ import annotations

import os
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fill2_pallas", "fill2_padded", "fillv_pallas", "segsum_pallas",
    "linear_fill2_pallas",
    "linear_baseline_pallas", "linear_level_pallas",
    "sift_level_emit_padded", "BLK",
]

BLK = 8192
_LANES = 128
_NONE = -1.0  # "no mark yet" sentinel in the position channels

# --- i32 bit-pattern position channels (any-n exactness) -------------------
# f32 VALUE position channels are exact only to 2^24 samples.  In "bits"
# mode (VERDICT r4 item 6: the sharded path's i32 trick ported into these
# kernels) a position p rides the fill machinery as the f32 whose BIT
# PATTERN is p + _ENC_OFF.  Every encoded position is then a normal
# positive float (offset 2^23 = the smallest normal's pattern, so nothing
# is subnormal and hardware flush-to-zero can't touch it), and because
# IEEE ordering of positive floats equals the ordering of their bit
# patterns, the sign-encoded _NONE sentinel, the >= 0 mark tests, all
# ordering comparisons, and equality behave EXACTLY as in value mode while
# distinct positions can never alias.  The machinery only selects/compares
# positions; the few sites doing position ARITHMETIC (knot weights, nex
# iota match) decode via bitcast — and pairwise differences need no offset
# at all (it cancels).  Ceiling: p + _ENC_OFF must stay below the +inf
# pattern (0x7F800000), i.e. n < 2^31 - 2^23 — beyond single-chip HBM.
_ENC_OFF = np.int32(0x00800000)
POS_BITS_MAX_N = (1 << 31) - (1 << 24)  # conservative (padding headroom)


def _enc_pos(pos_i32, encode: bool):
    """Position channel value for integer positions: plain f32 cast in
    value mode, offset bit pattern in bits mode."""
    if not encode:
        return pos_i32.astype(jnp.float32)
    return lax.bitcast_convert_type(pos_i32 + _ENC_OFF, jnp.float32)


def _enc_const(p: int, encode: bool) -> float:
    if not encode:
        return float(p)
    return float(np.int32(int(p) + int(_ENC_OFF)).view(np.float32))


def _pos_diff(a_f, b_f, encode: bool):
    """a - b on position channels as f32.  Bits mode subtracts the i32
    patterns (offset cancels; exact at any n for the < 2^24 spans the
    f32 weight ratio can represent); value mode keeps the legacy f32
    subtract bit-for-bit."""
    if not encode:
        return a_f - b_f
    return (lax.bitcast_convert_type(a_f, jnp.int32)
            - lax.bitcast_convert_type(b_f, jnp.int32)).astype(jnp.float32)


def _knot_value_fn(encode: bool):
    """The Frei-Osorio knot-value formula over (position, value) fill
    channels — the one epilogue site that does position arithmetic."""
    def knot_value(kpos, kval, lpos, lx, rpos, rx, end_val, is_first):
        span = _pos_diff(rpos, lpos, encode)
        w = _pos_diff(kpos, lpos, encode) / jnp.where(
            span == 0, jnp.ones_like(span), span)
        formula = 0.5 * (lx + w * (rx - lx)) + 0.5 * kval
        return jnp.where(is_first, end_val, formula)
    return knot_value

# PLATFORM-WA(donation): still-live/multiply-donated Pallas operands
# corrupt on the pinned backend — kernels declare structural aliases only
# (docs/PLATFORM.md).  PYITD_NO_ALIAS=1 is the diagnostic escape hatch:
# drop all donations (keep required aliases) to isolate aliasing from
# numerics.
_NO_ALIAS = bool(os.environ.get("PYITD_NO_ALIAS"))


def _out_struct(shape, dtype, *operands):
    """Output aval for a ``pallas_call`` that may run inside ``shard_map``:
    under ``check_vma`` the outputs must declare their varying mesh axes
    (an explicit — possibly empty — set; ``None`` is rejected there),
    which for these kernels is simply the union of the operands' (each
    output is elementwise-aligned with the big inputs)."""
    vma = frozenset()
    for o in operands:
        try:
            vma = vma | jax.typeof(o).vma
        except AttributeError:  # pragma: no cover - older jax
            return jax.ShapeDtypeStruct(shape, dtype)
    try:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    except TypeError:  # pragma: no cover - older jax without vma kwarg
        return jax.ShapeDtypeStruct(shape, dtype)


def _roll(a, k, axis):
    """``pltpu.roll`` with the shift pinned to i32.

    Python-int shifts canonicalize to i64 under ``jax_enable_x64``, and
    Mosaic's ``tpu.dynamic_rotate`` verifier requires an i32 operand —
    so an x64 caller (e.g. the f64 MEITD tier driving the f32 cubic
    kernels) would fail to lower.  ``np.int32`` restores the exact
    non-x64 form."""
    return pltpu.roll(a, np.int32(k) if isinstance(k, int) else k, axis)


def _combine(a, b):
    """fill2 combine on sign-encoded (p1, x1, p2, x2) tuples.

    ``p >= 0`` means the slot holds a real mark.  Invariant: whenever the
    combined element has >= k marks, its k-th slot is correct; slots beyond
    the mark count may hold garbage *values* but always a negative
    *position*.
    """
    a1p, a1x, a2p, a2x = a
    b1p, b1x, b2p, b2x = b
    has_b1 = b1p >= 0
    has_b2 = b2p >= 0
    t2p = jnp.where(has_b1, a1p, a2p)
    t2x = jnp.where(has_b1, a1x, a2x)
    return (
        jnp.where(has_b1, b1p, a1p),
        jnp.where(has_b1, b1x, a1x),
        jnp.where(has_b2, b2p, t2p),
        jnp.where(has_b2, b2x, t2x),
    )


def _combine1(a, b):
    """fill-LAST-ONE combine on a sign-encoded (p1, x1) pair — the depth-1
    subset of :func:`_combine` for scans that only need the most recent
    (or, reversed, the next) mark."""
    a1p, a1x = a
    b1p, b1x = b
    has_b1 = b1p >= 0
    return (jnp.where(has_b1, b1p, a1p), jnp.where(has_b1, b1x, a1x))


def _state_combine(a, b):
    return _combine(a, b) if len(a) == 4 else _combine1(a, b)


def _shifted(arrs, k: int, axis: int, reverse: bool):
    """Scan-predecessor state shifted by k along axis.

    Border slots (no predecessor) get the identity element: position
    channels (even indices) become the negative sentinel; value channels
    roll in garbage, which the sign-encoding invariant permits.

    Forward: predecessor = element k before (roll down).  Reverse:
    predecessor in scan order = element k after (roll up)."""
    idx = lax.broadcasted_iota(jnp.int32, arrs[0].shape, axis)
    size = arrs[0].shape[axis]
    if reverse:
        keep = idx < size - k
    else:
        keep = idx >= k
    out = []
    for i, a in enumerate(arrs):
        rolled = _roll(a, size - k if reverse else k, axis)
        if i % 2 == 0:  # position channel: sentinel at the border
            rolled = jnp.where(keep, rolled, jnp.full_like(a, _NONE))
        out.append(rolled)
    return tuple(out)


def _doubling_scan(state, axis: int, steps: int, reverse: bool):
    for s in range(steps):
        prev = _shifted(state, 1 << s, axis, reverse)
        state = _state_combine(prev, state)
    return state


def _doubling_scan_rolled(state, axis: int, steps: int, reverse: bool):
    """``_doubling_scan`` as a ``fori_loop`` with dynamic roll amounts.

    Bit-identical arithmetic (same shifts, same combine) but the Mosaic
    module holds ONE loop body instead of ``steps`` unrolled rounds —
    the fused level kernel's unrolled form pushed Mosaic compile time
    superlinearly (~150 s per module vs ~10 s for the smaller emit
    kernel)."""
    size = state[0].shape[axis]
    idx = lax.broadcasted_iota(jnp.int32, state[0].shape, axis)

    def body(s, st):
        k = jnp.int32(1) << s.astype(jnp.int32)  # x64-proof (i32 rotate)
        if reverse:
            keep = idx < size - k
            sh = jnp.int32(size) - k
        else:
            keep = idx >= k
            sh = k
        prev = []
        for i, a in enumerate(st):
            rolled = _roll(a, sh, axis)
            if i % 2 == 0:  # position channel: sentinel at the border
                rolled = jnp.where(keep, rolled, jnp.full_like(a, _NONE))
            prev.append(rolled)
        return _state_combine(tuple(prev), st)

    return lax.fori_loop(0, steps, body, state)


def _mask_outputs(state):
    """Restore the scan backend's defaults: zero wherever no mark exists."""
    has1 = state[0] >= 0
    has2 = state[2] >= 0
    return (
        jnp.where(has1, state[0], 0.0),
        jnp.where(has1, state[1], 0.0),
        jnp.where(has2, state[2], 0.0),
        jnp.where(has2, state[3], 0.0),
    )


def _block_scan(state, reverse: bool, carry_in, rows: int,
                rolled: str | bool = False):
    """Hierarchical in-VMEM fill of one (rows, 128) block.

    ``carry_in`` is the exclusive cross-block prefix (4 scalars); returns
    the inclusive state and the carry for the next block (the state at this
    block's scan-order-last element).  ``rolled`` runs doubling rounds as
    ``fori_loop``s (same arithmetic, much smaller Mosaic module — see
    ``_doubling_scan_rolled``): ``True`` rolls both stages (cheapest
    compile, but dynamic lane rotates cost ~80% runtime at 8x1M);
    ``"sublane"`` rolls only the tiny (rows, 1) summary stage — the lane
    stage keeps its fast static rolls while the module shrinks enough to
    tame Mosaic's superlinear compile."""
    lane_scan = _doubling_scan_rolled if rolled is True else _doubling_scan
    sub_scan = _doubling_scan_rolled if rolled else _doubling_scan
    # stage 1: within each 128-lane row
    state = lane_scan(state, axis=1, steps=7, reverse=reverse)

    # stage 2: row summaries (full-row reductions) across sublanes
    edge = 0 if reverse else _LANES - 1
    summ = tuple(s[:, edge : edge + 1] for s in state)  # (rows, 1)
    pref = sub_scan(summ, axis=0, steps=int(np.log2(rows)), reverse=reverse)
    pref = _shifted(pref, 1, 0, reverse)  # exclusive

    # stage 3: fold the cross-block carry into the (rows, 1) row prefixes
    # first (combine is associative, so this is exact: carry ∘ (pref ∘
    # state) == (carry ∘ pref) ∘ state), then ONE full-block combine —
    # halving what used to be two broadcast combine passes over the
    # whole (rows, 128) block.
    carry_row = tuple(jnp.full((rows, 1), c) for c in carry_in)
    pref = _state_combine(carry_row, pref)
    state = _state_combine(
        tuple(jnp.broadcast_to(p, (rows, _LANES)) for p in pref), state
    )

    erow = 0 if reverse else rows - 1
    ecol = 0 if reverse else _LANES - 1
    carry_out = tuple(s[erow, ecol] for s in state)
    return state, carry_out


def _init_carry(carry):
    carry[0] = _NONE
    carry[1] = 0.0
    carry[2] = _NONE
    carry[3] = 0.0


def _make_fill2_kernel(reverse: bool):
    def kernel(p_ref, x_ref, m_ref, p1p_ref, p1x_ref, p2p_ref, p2x_ref, carry):
        b = pl.program_id(1)
        rows = BLK // _LANES

        @pl.when(b == 0)
        def _():
            _init_carry(carry)

        pos = p_ref[0]
        x = x_ref[0]
        m = m_ref[0] != 0

        # sign-encoded init: unmarked -> sentinel position, garbage values
        state = (jnp.where(m, pos, _NONE), x, jnp.full_like(x, _NONE), x)
        carry_in = tuple(carry[i] for i in range(4))
        state, carry_out = _block_scan(state, reverse, carry_in, rows)
        for i in range(4):
            carry[i] = carry_out[i]

        outs = _mask_outputs(state)
        p1p_ref[0], p1x_ref[0], p2p_ref[0], p2x_ref[0] = outs

    return kernel


_fill2_fwd = _make_fill2_kernel(False)
_fill2_bwd = _make_fill2_kernel(True)


def _make_fillv_kernel(reverse: bool):
    """Last-ONE-marked fill of a single VALUE channel (the depth-1
    counterpart of the fill2 kernel): per sample, the value at the last
    (forward) / next (reverse) marked sample, 0 where none exists.
    Multi-channel fills ride it by stacking channels along the rows axis
    (the grid's parallel dimension) — but that costs one full pass per
    channel; the structural sift backward, which used to stream its
    cumsum read-backs through this, now uses :func:`segsum_pallas`
    (channels in the scan state, ~half the cost for two channels)."""

    def kernel(v_ref, m_ref, out_ref, carry):
        b = pl.program_id(1)
        rows = BLK // _LANES

        @pl.when(b == 0)
        def _():
            carry[0] = _NONE
            carry[1] = 0.0

        v = v_ref[0]
        m = m_ref[0] != 0
        # sign-encoded init: the position channel only carries mark
        # presence here (0 = marked), values may be arbitrary floats
        state = (jnp.where(m, 0.0, _NONE), v)
        carry_in = (carry[0], carry[1])
        state, carry_out = _block_scan(state, reverse, carry_in, rows)
        carry[0] = carry_out[0]
        carry[1] = carry_out[1]
        out_ref[0] = jnp.where(state[0] >= 0, state[1],
                               jnp.zeros_like(state[1]))

    return kernel


_fillv_fwd = _make_fillv_kernel(False)
_fillv_bwd = _make_fillv_kernel(True)


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def fillv_pallas(v: jax.Array, mask: jax.Array, *,
                 reverse: bool = False, interpret: bool = False):
    """Per sample: value of the last (forward) or next (reverse) marked
    sample, inclusively; 0 before the first mark.  Semantically identical
    to ``ops.fill.forward_fill_scan((v,), mask, (0.0,))[0]`` (or the
    backward variant) — one streaming Pallas pass instead of the XLA
    log-depth scan.  ``v``: (rows, n) float32; ``mask``: (rows, n) bool."""
    rows, n = v.shape
    npad = -(-n // BLK) * BLK
    pad = npad - n

    def prep(a, fill, dtype):
        a = a.astype(dtype)
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((rows, pad), fill, dtype)], axis=-1
            )
        return a.reshape(rows, npad // _LANES, _LANES)

    v3 = prep(v, 0.0, jnp.float32)
    m3 = prep(mask, False, jnp.float32)

    sub = BLK // _LANES
    nblk = npad // BLK
    if reverse:
        index_map = lambda r, b: (r, nblk - 1 - b, np.int32(0))
        kernel = _fillv_bwd
    else:
        index_map = lambda r, b: (r, b, np.int32(0))
        kernel = _fillv_fwd
    spec = pl.BlockSpec((1, sub, _LANES), index_map, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(rows, nblk),
        in_specs=[spec, spec],
        out_specs=spec,
        out_shape=_out_struct(v3.shape, jnp.float32, v3, m3),
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
        interpret=interpret,
    )(v3, m3)
    out = out.reshape(rows, npad)
    return out[..., :n] if pad else out


# ---------------------------------------------------------------------------
# segmented running sums — the structural sift backward's segment-sum
# primitive.  out[t] = v[t] + (flag[t] ? 0 : out[t-1])  (forward; reverse
# mirrors with t+1): inclusive running sums that RESET at flagged samples.
# One streaming pass replaces the adjoint's cumsum + stacked-row fillv
# read-backs (where segment sums were reconstructed as differences of a
# global cumulative sum — O(n) more rounding exposure AND three extra
# passes).  Channels ride the scan STATE (like fill2's four channels), not
# stacked rows, so C channels cost ~(C+1)/4 of a fill2 pass instead of C
# full fillv passes.
# ---------------------------------------------------------------------------


def _seg_combine(a, b):
    """Segmented-sum combine; ``b`` is the later element in scan order.

    State = (flag, s_1..s_C): ``s_i`` is the channel-i sum of the interval
    suffix after its last reset (the whole interval if none); ``flag`` is
    1.0 where the interval contains a reset.  Identity element: all-zero.
    """
    reset = b[0] > 0
    return (jnp.maximum(a[0], b[0]),) + tuple(
        jnp.where(reset, sb, sa + sb) for sa, sb in zip(a[1:], b[1:])
    )


def _seg_shifted(arrs, k: int, axis: int, reverse: bool):
    """Scan-predecessor state shifted by k; border slots get the identity
    (all channels zero — sums are not idempotent, so garbage would
    corrupt, unlike the fill monoid's sign-encoded slack)."""
    idx = lax.broadcasted_iota(jnp.int32, arrs[0].shape, axis)
    size = arrs[0].shape[axis]
    keep = (idx < size - k) if reverse else (idx >= k)
    return tuple(
        jnp.where(keep, _roll(a, size - k if reverse else k, axis),
                  jnp.zeros_like(a))
        for a in arrs
    )


def _seg_doubling_scan(state, axis: int, steps: int, reverse: bool):
    for s in range(steps):
        prev = _seg_shifted(state, 1 << s, axis, reverse)
        state = _seg_combine(prev, state)
    return state


def _seg_block_scan(state, reverse: bool, carry_in, rows: int):
    """Hierarchical in-VMEM segmented sum of one (rows, 128) block —
    the :func:`_block_scan` pattern on the segmented-sum monoid."""
    state = _seg_doubling_scan(state, axis=1, steps=7, reverse=reverse)
    edge = 0 if reverse else _LANES - 1
    summ = tuple(s[:, edge : edge + 1] for s in state)
    pref = _seg_doubling_scan(summ, axis=0, steps=int(np.log2(rows)),
                              reverse=reverse)
    pref = _seg_shifted(pref, 1, 0, reverse)
    carry_row = tuple(jnp.full((rows, 1), c) for c in carry_in)
    pref = _seg_combine(carry_row, pref)
    state = _seg_combine(
        tuple(jnp.broadcast_to(p, (rows, _LANES)) for p in pref), state
    )
    erow = 0 if reverse else rows - 1
    ecol = 0 if reverse else _LANES - 1
    carry_out = tuple(s[erow, ecol] for s in state)
    return state, carry_out


def _make_segsum_kernel(reverse: bool, nch: int):
    def kernel(*refs):
        z_refs, f_ref = refs[:nch], refs[nch]
        out_refs, carry = refs[nch + 1 : 2 * nch + 1], refs[-1]
        b = pl.program_id(1)
        rows = BLK // _LANES

        @pl.when(b == 0)
        def _():
            for i in range(nch + 1):
                carry[i] = 0.0

        state = (f_ref[0],) + tuple(z[0] for z in z_refs)
        carry_in = tuple(carry[i] for i in range(nch + 1))
        state, carry_out = _seg_block_scan(state, reverse, carry_in, rows)
        for i in range(nch + 1):
            carry[i] = carry_out[i]
        for i in range(nch):
            out_refs[i][0] = state[1 + i]

    return kernel


@lru_cache(maxsize=None)
def _segsum_kernel(reverse: bool, nch: int):
    return _make_segsum_kernel(reverse, nch)


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def segsum_pallas(vals, flags: jax.Array, *,
                  reverse: bool = False, interpret: bool = False):
    """Segmented inclusive running sums over the last axis.

    ``vals``: tuple of (rows, n) float32 channels (a single array is
    accepted); ``flags``: (rows, n) bool.  Forward:
    ``out[t] = v[t] + (flags[t] ? 0 : out[t-1])`` — sums reset AT flagged
    samples (each starts a new segment).  Reverse mirrors with ``t+1``
    (segments extend leftward from flags).  Returns a tuple matching
    ``vals``.  All channels share the flag channel and one streaming
    pass; padding is flag-less zero, which is the scan identity."""
    single = not isinstance(vals, (tuple, list))
    if single:
        vals = (vals,)
    nch = len(vals)
    rows, n = vals[0].shape
    npad = -(-n // BLK) * BLK
    pad = npad - n

    def prep(a, fill):
        a = a.astype(jnp.float32)
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((rows, pad), fill, jnp.float32)], axis=-1
            )
        return a.reshape(rows, npad // _LANES, _LANES)

    ops3 = [prep(v, 0.0) for v in vals] + [prep(flags, False)]

    sub = BLK // _LANES
    nblk = npad // BLK
    if reverse:
        index_map = lambda r, b: (r, nblk - 1 - b, np.int32(0))
    else:
        index_map = lambda r, b: (r, b, np.int32(0))
    spec = pl.BlockSpec((1, sub, _LANES), index_map, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _segsum_kernel(reverse, nch),
        grid=(rows, nblk),
        in_specs=[spec] * (nch + 1),
        out_specs=[spec] * nch,
        out_shape=[_out_struct(ops3[0].shape, jnp.float32, *ops3)] * nch,
        scratch_shapes=[pltpu.SMEM((nch + 1,), jnp.float32)],
        interpret=interpret,
    )(*ops3)
    outs = tuple(o.reshape(rows, npad) for o in outs)
    if pad:
        outs = tuple(o[..., :n] for o in outs)
    return outs[0] if single else outs


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def fill2_pallas(pos: jax.Array, x: jax.Array, mask: jax.Array, *,
                 reverse: bool = False, interpret: bool = False):
    """Per sample: (p1_pos, p1_x, p2_pos, p2_x) of the last two (forward) or
    next two (reverse) marked samples, inclusively.  Channels with fewer
    marks available hold 0 (the scan fills' defaults).

    ``pos``/``x``: (rows, n) float32; ``mask``: (rows, n) bool.
    ``pos`` must be non-negative at marked samples (see module docstring).
    n is padded to a BLK multiple internally (padding is unmarked).
    """
    rows, n = x.shape
    npad = -(-n // BLK) * BLK
    pad = npad - n

    def prep(a, fill, dtype):
        a = a.astype(dtype)
        if pad:
            a = jnp.concatenate(
                [a, jnp.full((rows, pad), fill, dtype)], axis=-1
            )
        # 3-D view: the block's last two dims (BLK/128, 128) satisfy the
        # Mosaic (8, 128) divisibility constraint
        return a.reshape(rows, npad // _LANES, _LANES)

    p = prep(pos, 0.0, jnp.float32)
    v = prep(x, 0.0, jnp.float32)
    m = prep(mask, False, jnp.float32)  # float mask: != 0 in kernel

    outs = fill2_padded(p, v, m, reverse=reverse, interpret=interpret)
    outs = tuple(o.reshape(rows, npad) for o in outs)
    if pad:
        outs = tuple(o[..., :n] for o in outs)
    return outs


def fill2_padded(p3, v3, m3, *, reverse: bool = False,
                 interpret: bool = False):
    """:func:`fill2_pallas` on already-padded 3-D ``(rows, npad//128, 128)``
    inputs, outputs kept padded (padding must be unmarked)."""
    rows = p3.shape[0]
    npad = p3.shape[1] * _LANES
    sub = BLK // _LANES
    nblk = npad // BLK
    if reverse:
        # reverse scans walk the grid from the last block backwards
        index_map = lambda r, b: (r, nblk - 1 - b, np.int32(0))
        kernel = _fill2_bwd
    else:
        index_map = lambda r, b: (r, b, np.int32(0))
        kernel = _fill2_fwd
    spec = pl.BlockSpec((1, sub, _LANES), index_map, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(rows, nblk),
        in_specs=[spec, spec, spec],
        out_specs=[spec] * 4,
        out_shape=[_out_struct(p3.shape, jnp.float32, p3, v3, m3)] * 4,
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=interpret,
    )(p3, v3, m3)


# ---------------------------------------------------------------------------
# specialized ITD-level kernel: mask + positions computed in-kernel, so HBM
# sees only x in (three views: 1-tile halos) and the four fill channels out
# ---------------------------------------------------------------------------

def _roll_next(a, boundary, row, lane):
    """Row-major next element of a (sub, 128) block; the block's last
    element receives ``boundary`` (a scalar)."""
    sub = a.shape[0]
    nxt = _roll(a, _LANES - 1, 1)
    col_next = _roll(a[:, :1], sub - 1, 0)
    nxt = jnp.where(lane == _LANES - 1, col_next, nxt)
    return jnp.where((lane == _LANES - 1) & (row == sub - 1), boundary, nxt)


def _knot_state(x, blk, n_real, prev_scalar, next_scalar, encode=False):
    """In-kernel ITD knot mask (canonical extrema + endpoints, NaN
    quarantine) and sign-encoded fill2 init state for one block."""
    sub = BLK // _LANES
    row = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 1)
    pos = blk * BLK + row * _LANES + lane

    # one-sample neighbors in row-major order; block-edge scalars come
    # from the scalar-prefetch SMEM arrays
    xm1 = _roll(x, 1, 1)
    col_prev = _roll(x[:, _LANES - 1 :], 1, 0)
    xm1 = jnp.where(lane == 0, col_prev, xm1)
    xm1 = jnp.where((lane == 0) & (row == 0), prev_scalar, xm1)
    xp1 = _roll_next(x, next_scalar, row, lane)

    dxb = x - xm1
    dxf = xp1 - x
    dxb = jnp.where(jnp.isnan(dxb), jnp.inf, dxb)
    dxf = jnp.where(jnp.isnan(dxf), jnp.inf, dxf)
    near_nan = jnp.isnan(x) | jnp.isnan(xm1) | jnp.isnan(xp1)
    interior = (pos > 0) & (pos < n_real - 1)
    is_min = (dxb <= 0) & (dxf > 0)
    is_max = (dxb >= 0) & (dxf < 0)
    m = ((is_min | is_max) & interior & ~near_nan) | (pos == 0) | (
        pos == n_real - 1
    )

    state = (
        jnp.where(m, _enc_pos(pos, encode), _NONE),
        x,
        jnp.full_like(x, _NONE),
        x,
    )
    return pos, row, lane, m, state


@lru_cache(maxsize=None)
def _make_linear_fill2_kernel(reverse: bool, n_real: int, nblk: int,
                              encode: bool = False):
    sub = BLK // _LANES

    def kernel(xprev_ref, xnext_ref, x_ref, p1p_ref, p1x_ref, p2p_ref,
               p2x_ref, carry):
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            _init_carry(carry)

        blk = (nblk - 1 - g) if reverse else g
        _, _, _, _, state = _knot_state(
            x_ref[0], blk, n_real, xprev_ref[r, blk], xnext_ref[r, blk],
            encode
        )
        carry_in = tuple(carry[i] for i in range(4))
        state, carry_out = _block_scan(state, reverse, carry_in, sub)
        for i in range(4):
            carry[i] = carry_out[i]

        outs = _mask_outputs(state)
        p1p_ref[0], p1x_ref[0], p2p_ref[0], p2x_ref[0] = outs

    return kernel


def _pad_edges(x):
    """Pad a (rows, n) f32 signal to a BLK multiple and compute the
    per-block edge-neighbor scalar arrays the kernels prefetch."""
    rows, n = x.shape
    npad = -(-n // BLK) * BLK
    pad = npad - n
    xp = x.astype(jnp.float32)
    if pad:
        xp = jnp.concatenate([xp, jnp.zeros((rows, pad), jnp.float32)], axis=-1)
    nblk = npad // BLK
    # block-edge scalars: prev_edge[b] = x[b*BLK-1], next_edge[b] = x[(b+1)*BLK]
    prev_edge = jnp.concatenate(
        [xp[:, :1], xp[:, BLK - 1 : npad - 1 : BLK]], axis=-1
    )  # (rows, nblk)
    next_edge = jnp.concatenate(
        [xp[:, BLK::BLK], xp[:, -1:]], axis=-1
    )  # (rows, nblk)
    x3 = xp.reshape(rows, npad // _LANES, _LANES)
    return x3, prev_edge, next_edge, npad, nblk


def block_edge_scalars(base3, nblk):
    """Per-block edge-neighbor scalars from a padded 3-D baseline —
    ``_pad_edges``'s (prev_edge, next_edge) recomputed from a kernel
    output that never left the padded layout: ``prev_edge[b] =
    B[b*BLK - 1]`` (b=0: ``B[0]``), ``next_edge[b] = B[(b+1)*BLK]``
    (last block: don't-care, stays finite).  The single source of the
    edge convention for the single-chip sift loop, the emit path, and
    the sharded sift."""
    rows, nsub, lanes = base3.shape
    sub = nsub // nblk
    b4 = base3.reshape(rows, nblk, sub, lanes)
    ef = b4[:, :, 0, 0]
    el = b4[:, :, sub - 1, lanes - 1]
    pe = jnp.concatenate([ef[:, :1], el[:, :-1]], axis=-1)
    ne = jnp.concatenate([ef[:, 1:], el[:, -1:]], axis=-1)
    return pe, ne


def _linear_fill2_padded(x3, prev_edge, next_edge, n, nblk, reverse,
                         interpret, encode=False):
    """Run the ITD fill2 kernel on already-padded 3-D inputs; returns the
    four fill channels still in padded 3-D layout."""
    rows = x3.shape[0]
    sub = BLK // _LANES
    if reverse:
        main_map = lambda r, b, _pe, _ne: (r, nblk - 1 - b, np.int32(0))
    else:
        main_map = lambda r, b, _pe, _ne: (r, b, np.int32(0))

    spec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows, nblk),
        in_specs=[spec],
        out_specs=[spec] * 4,
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )
    return pl.pallas_call(
        _make_linear_fill2_kernel(reverse, n, nblk, encode),
        grid_spec=grid_spec,
        out_shape=[_out_struct(x3.shape, jnp.float32, x3)] * 4,
        interpret=interpret,
    )(prev_edge, next_edge, x3)


@partial(jax.jit, static_argnames=("reverse", "interpret"))
def linear_fill2_pallas(x: jax.Array, *, reverse: bool = False,
                        interpret: bool = False):
    """ITD-specialized fill2: knot mask (canonical extrema + endpoints, NaN
    quarantine) and positions are derived in-kernel from ``x``; block-edge
    neighbor samples arrive as per-block SMEM scalars so every BlockSpec
    index map stays affine (non-affine maps stall the DMA pipeline).
    Returns inclusive (p1_pos, p1_x, p2_pos, p2_x) in the chosen direction.
    """
    rows, n = x.shape
    x3, prev_edge, next_edge, npad, nblk = _pad_edges(x)
    outs = _linear_fill2_padded(x3, prev_edge, next_edge, n, nblk, reverse,
                                interpret)
    return tuple(o.reshape(rows, npad)[..., :n] for o in outs)


# ---------------------------------------------------------------------------
# fused level kernel: the reverse fill *and* the knot-value/interpolation
# epilogue in one pass, so HBM sees x + the 4 forward channels in and ONLY
# the baseline out (the XLA epilogue previously re-read all fill channels
# and dominated the level time ~2:1 over the fills)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_linear_baseline_kernel(n_real: int, nblk: int, endpoint_mode: str,
                                 encode: bool = False):
    sub = BLK // _LANES
    nm1 = _enc_const(n_real - 1, encode)
    enc0 = _enc_const(0, encode)

    def kernel(xprev_ref, xnext_ref, bfirst_ref, blast_ref, x_ref,
               f1p_ref, f1x_ref, f2p_ref, f2x_ref, base_ref, rot_ref,
               err_ref, carry):
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            _init_carry(carry)

        blk = nblk - 1 - g  # reverse walk
        x = x_ref[0]
        pos, row, lane, _, state = _knot_state(
            x, blk, n_real, xprev_ref[r, blk], xnext_ref[r, blk], encode
        )
        # carry_in = inclusive reverse state at the NEXT block's first
        # element — read it before updating: it is both this block's scan
        # prefix and the shift boundary for "strictly after"
        carry_in = tuple(carry[i] for i in range(4))
        state, carry_out = _block_scan(state, reverse=True,
                                       carry_in=carry_in, rows=sub)
        for i in range(4):
            carry[i] = carry_out[i]

        # strictly-after knots: the inclusive state of the next sample
        # (row-major shift; the block's last sample takes carry_in)
        shifted = tuple(
            _roll_next(s, c, row, lane) for s, c in zip(state, carry_in)
        )
        n1p, n1x, n2p, n2x = _mask_outputs(shifted)

        # forward channels were default-masked by the forward kernel
        f1p, f1x, f2p, f2x = f1p_ref[0], f1x_ref[0], f2p_ref[0], f2x_ref[0]

        b_first = bfirst_ref[r]
        b_last = blast_ref[r]

        knot_value = _knot_value_fn(encode)

        b_l = knot_value(f1p, f1x, f2p, f2x, n1p, n1x, b_first, f1p == enc0)
        b_l = jnp.where(f1p == nm1, b_last, b_l)
        b_r = knot_value(n1p, n1x, f1p, f1x, n2p, n2x, b_last, n1p == nm1)

        den = n1x - f1x
        slope = jnp.where(
            den == 0,
            jnp.zeros_like(den),
            (b_r - b_l) / jnp.where(den == 0, jnp.ones_like(den), den),
        )
        baseline = b_l + slope * (x - f1x)
        if endpoint_mode == "reference":
            baseline = jnp.where(pos == n_real - 1,
                                 jnp.zeros_like(baseline), baseline)
        base_ref[0] = baseline

        # rotation and its exact two-sum rounding residual, computed while
        # x and baseline are in registers (the sift's compensated
        # reconstruction needs err = (x - baseline) - fl(x - baseline))
        rot = x - baseline
        bb = rot - x
        err = (x - (rot - bb)) + ((-baseline) - bb)
        rot_ref[0] = rot
        err_ref[0] = err

    return kernel


def _linear_baseline_padded(x3, fwd3, prev_edge, next_edge, b_first, b_last,
                            n, nblk, endpoint_mode, interpret, encode=False):
    """Run the fused reverse-fill + epilogue kernel on padded 3-D inputs;
    returns padded (baseline, rotation, sub_err)."""
    rows = x3.shape[0]
    sub = BLK // _LANES
    main_map = lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0))
    spec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(rows, nblk),
        in_specs=[spec] * 5,
        out_specs=[spec] * 3,
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )
    return pl.pallas_call(
        _make_linear_baseline_kernel(n, nblk, endpoint_mode, encode),
        grid_spec=grid_spec,
        out_shape=[_out_struct(x3.shape, jnp.float32, x3, *fwd3)] * 3,
        interpret=interpret,
    )(prev_edge, next_edge, b_first, b_last, x3, *fwd3)


@partial(jax.jit, static_argnames=("endpoint_mode", "interpret"))
def linear_baseline_pallas(x: jax.Array, f1p: jax.Array, f1x: jax.Array,
                           f2p: jax.Array, f2x: jax.Array, *,
                           endpoint_mode: str = "reference",
                           interpret: bool = False) -> jax.Array:
    """Full linear-in-value ITD baseline from the forward fill channels.

    Runs the reverse fill and the knot-value + interpolation math
    (``/root/reference/ITD.py:106-117`` semantics, matching
    ``linear_baseline._baseline_scan`` exactly) fused in one reverse-walking
    kernel.  ``f*`` are the outputs of ``linear_fill2_pallas(x)``.
    (Production path: :func:`linear_level_pallas`, which keeps the forward
    channels in padded layout between the two kernels.)
    """
    rows, n = x.shape
    x3, prev_edge, next_edge, npad, nblk = _pad_edges(x)
    pad = npad - n

    def prep(a):
        a = a.astype(jnp.float32)
        if pad:
            a = jnp.concatenate([a, jnp.zeros((rows, pad), jnp.float32)],
                                axis=-1)
        return a.reshape(x3.shape)

    b_first = 0.5 * (x[:, 0] + x[:, 1]).astype(jnp.float32)
    b_last = 0.5 * (x[:, n - 2] + x[:, n - 1]).astype(jnp.float32)
    out = _linear_baseline_padded(
        x3, (prep(f1p), prep(f1x), prep(f2p), prep(f2x)),
        prev_edge, next_edge, b_first, b_last, n, nblk, endpoint_mode,
        interpret,
    )
    return out[0].reshape(rows, npad)[..., :n]


@partial(jax.jit, static_argnames=("endpoint_mode", "interpret", "encode"))
def linear_level_pallas(x: jax.Array, *, endpoint_mode: str = "reference",
                        interpret: bool = False, encode: bool = False):
    """One full linear-baseline level: forward fill2 kernel + fused
    reverse/epilogue kernel, with the four intermediate fill channels kept
    in padded 3-D layout between the two (no crop/re-pad copies — at
    non-BLK-multiple n those cost ~8 full-array copies per level).

    Returns ``(baseline, rotation, sub_err, num_extrema)``: rotation and
    its exact two-sum rounding residual come from the fused kernel while x
    and baseline are in registers, and the interior extrema count comes
    from the forward kernel's per-block knot-mask counts (total marks minus
    the 2 endpoint marks)."""
    rows, n = x.shape
    x3, prev_edge, next_edge, npad, nblk = _pad_edges(x)
    fwd3 = _linear_fill2_padded(x3, prev_edge, next_edge, n, nblk,
                                reverse=False, interpret=interpret,
                                encode=encode)
    b_first = 0.5 * (x[:, 0] + x[:, 1]).astype(jnp.float32)
    b_last = 0.5 * (x[:, n - 2] + x[:, n - 1]).astype(jnp.float32)
    base, rot, err = _linear_baseline_padded(
        x3, fwd3, prev_edge, next_edge, b_first, b_last, n, nblk,
        endpoint_mode, interpret, encode,
    )

    def crop(a):
        return a.reshape(rows, npad)[..., :n]

    # knot count from the forward channels: a sample is a knot iff it is
    # its own most-recent knot (value-mode positions are exact in f32
    # below 2^24; encoded positions at any n); padded samples never match
    # (their p1 position is < n).  Interior extrema count = total knots -
    # the 2 endpoint marks.
    f1p_flat = fwd3[0].reshape(rows, npad)
    iota = _enc_pos(lax.broadcasted_iota(jnp.int32, (rows, npad), 1), encode)
    nex = jnp.sum(f1p_flat == iota, axis=-1).astype(jnp.int32) - 2
    return crop(base), crop(rot), crop(err), nex


# ---------------------------------------------------------------------------
# sift-emit level: the fused kernel additionally consumes the sift's carried
# arrays (previous rotation / baseline / pending rounding residual /
# compensation) plus per-row stop flags, and emits the sift's OUTPUT ROW and
# updated compensation in-register — replacing the XLA bookkeeping passes
# that cost ~1 ms per level at 8x1M (decomp/itd.py's row construction,
# residual selects, compensation update, and extrema-count reduction)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_linear_emit_kernel(n_real: int, nblk: int, endpoint_mode: str,
                             row_4d: bool = False, encode: bool = False):
    sub = BLK // _LANES
    nm1 = _enc_const(n_real - 1, encode)
    enc0 = _enc_const(0, encode)

    def kernel(xprev_ref, xnext_ref, bfirst_ref, blast_ref, fa_ref, fb_ref,
               fc_ref, *rest):
        if row_4d:
            # the level index rides as one more scalar-prefetch operand so
            # every unrolled sift trip lowers the SAME Mosaic module (a
            # static index map baked a distinct module per trip — 13 extra
            # kernel compiles that dominated cold-compile time)
            (_li_ref, x_ref, f1p_ref, f1x_ref, f2p_ref, f2x_ref, rotp_ref,
             pbase_ref, perr_ref, comp_ref, _orot, base_ref, rot_ref,
             err_ref, row_ref, compo_ref, carry) = rest
        else:
            (x_ref, f1p_ref, f1x_ref, f2p_ref, f2x_ref, rotp_ref,
             pbase_ref, perr_ref, comp_ref, base_ref, rot_ref, err_ref,
             row_ref, compo_ref, carry) = rest
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            _init_carry(carry)

        blk = nblk - 1 - g  # reverse walk
        x = x_ref[0]
        pos, row, lane, _, state = _knot_state(
            x, blk, n_real, xprev_ref[r, blk], xnext_ref[r, blk], encode
        )
        carry_in = tuple(carry[i] for i in range(4))
        state, carry_out = _block_scan(state, reverse=True,
                                       carry_in=carry_in, rows=sub)
        for i in range(4):
            carry[i] = carry_out[i]

        shifted = tuple(
            _roll_next(s, c, row, lane) for s, c in zip(state, carry_in)
        )
        n1p, n1x, n2p, n2x = _mask_outputs(shifted)
        f1p, f1x, f2p, f2x = f1p_ref[0], f1x_ref[0], f2p_ref[0], f2x_ref[0]
        b_first = bfirst_ref[r]
        b_last = blast_ref[r]

        knot_value = _knot_value_fn(encode)

        b_l = knot_value(f1p, f1x, f2p, f2x, n1p, n1x, b_first, f1p == enc0)
        b_l = jnp.where(f1p == nm1, b_last, b_l)
        b_r = knot_value(n1p, n1x, f1p, f1x, n2p, n2x, b_last, n1p == nm1)

        den = n1x - f1x
        slope = jnp.where(
            den == 0,
            jnp.zeros_like(den),
            (b_r - b_l) / jnp.where(den == 0, jnp.ones_like(den), den),
        )
        baseline = b_l + slope * (x - f1x)
        if endpoint_mode == "reference":
            baseline = jnp.where(pos == n_real - 1,
                                 jnp.zeros_like(baseline), baseline)
        base_ref[0] = baseline

        rot = x - baseline
        bb = rot - x
        err = (x - (rot - bb)) + ((-baseline) - bb)
        rot_ref[0] = rot
        err_ref[0] = err

        # --- sift bookkeeping for the PREVIOUS extraction's outputs ---
        # (x here IS that extraction's baseline; rotp its rotation)
        stop_a = fa_ref[r] != 0
        stop_b = fb_ref[r] != 0
        cont = fc_ref[r] != 0
        rotp = rotp_ref[0]
        res_sum = rotp + x
        rbb = res_sum - rotp
        res_err = (rotp - (res_sum - rbb)) + (x - rbb)

        zero = jnp.zeros_like(x)
        residual = jnp.where(stop_a, pbase_ref[0], res_sum)
        row_val = jnp.where(
            stop_a | stop_b, residual, jnp.where(cont, rotp, zero)
        )
        if row_4d:
            row_ref[0, 0] = row_val
        else:
            row_ref[0] = row_val
        perr = perr_ref[0]
        compo_ref[0] = (
            comp_ref[0]
            + jnp.where(cont | stop_b, perr, zero)
            + jnp.where(stop_b, res_err, zero)
        )

    return kernel


def _fused_scans_and_epilogue(x, state0, pos, row, lane, fwd_in, rev_in,
                              nm1, is_final_sample, b_first, b_last,
                              endpoint_mode, stop_a, stop_b, cont,
                              rotp_ref, pbase_ref, perr_ref, comp_ref,
                              base_ref, rot_ref, err_ref, row_ref,
                              compo_ref, row_4d, encode=False):
    """Shared body of the one-kernel fused level (single-chip and
    sharded): seeded forward/reverse block scans, the interpolation
    epilogue, and the sift row/compensation bookkeeping.  Returns the
    block's inclusive reverse carry (its state at the block's first
    element) so a reverse-walking caller can chain it."""
    sub = x.shape[0]
    # unrolled scans: the rolled variants compile much faster but cost
    # 30-80% runtime (dynamic rotates); the one-time Mosaic compile of the
    # big unrolled module is absorbed by the persistent compilation cache
    # (bench.py / tests enable it).  Measured at 8x1M, same chip era:
    # unrolled 33.8 ms/sift, sublane-rolled 52.4, fully-rolled 61.6.
    fstate, _ = _block_scan(state0, reverse=False, carry_in=fwd_in,
                            rows=sub)
    f1p, f1x, f2p, f2x = _mask_outputs(fstate)

    rstate, rev_carry_out = _block_scan(state0, reverse=True,
                                        carry_in=rev_in, rows=sub)
    shifted = tuple(
        _roll_next(s, c, row, lane) for s, c in zip(rstate, rev_in)
    )
    n1p, n1x, n2p, n2x = _mask_outputs(shifted)

    knot_value = _knot_value_fn(encode)

    b_l = knot_value(f1p, f1x, f2p, f2x, n1p, n1x, b_first,
                     f1p == _enc_const(0, encode))
    b_l = jnp.where(f1p == nm1, b_last, b_l)
    b_r = knot_value(n1p, n1x, f1p, f1x, n2p, n2x, b_last, n1p == nm1)

    den = n1x - f1x
    slope = jnp.where(
        den == 0,
        jnp.zeros_like(den),
        (b_r - b_l) / jnp.where(den == 0, jnp.ones_like(den), den),
    )
    baseline = b_l + slope * (x - f1x)
    if endpoint_mode == "reference":
        baseline = jnp.where(is_final_sample, jnp.zeros_like(baseline),
                             baseline)
    base_ref[0] = baseline

    rot = x - baseline
    bb = rot - x
    err = (x - (rot - bb)) + ((-baseline) - bb)
    rot_ref[0] = rot
    err_ref[0] = err

    # --- sift bookkeeping for the PREVIOUS extraction's outputs ---
    rotp = rotp_ref[0]
    res_sum = rotp + x
    rbb = res_sum - rotp
    res_err = (rotp - (res_sum - rbb)) + (x - rbb)

    zero = jnp.zeros_like(x)
    residual = jnp.where(stop_a, pbase_ref[0], res_sum)
    row_val = jnp.where(
        stop_a | stop_b, residual, jnp.where(cont, rotp, zero)
    )
    if row_4d:
        row_ref[0, 0] = row_val
    else:
        row_ref[0] = row_val
    perr = perr_ref[0]
    compo_ref[0] = (
        comp_ref[0]
        + jnp.where(cont | stop_b, perr, zero)
        + jnp.where(stop_b, res_err, zero)
    )
    return rev_carry_out


@lru_cache(maxsize=None)
def _make_level_fused_kernel(n_real: int, nblk: int, endpoint_mode: str,
                             row_4d: bool = False, fold_emit: bool = False,
                             encode: bool = False):
    """ONE kernel per sift level: both direction scans + epilogue + emit.

    The grid walks each row's blocks in REVERSE, so the reverse scan's
    cross-block state rides a sequential SMEM carry for free (exactly the
    two-kernel emit design); only the FORWARD exclusive prefixes need
    precomputation (``fwd_prefix`` via scalar prefetch, flattened
    (rows, nblk*4) — computed with the extrema count in one XLA reduce,
    :func:`level_block_states_fwd`).  Vs the both-directions-prefetched
    form this halves the XLA summary pass, which cost ~0.7 ms/level at
    8x1M (~25%% of the whole sift).

    ``fold_emit`` additionally emits, per block, the NEXT level's partial
    forward fill fold — the top-2-marked (position, value) of the freshly
    computed baseline over this block EXCLUDING its first sample (whose
    knot mask needs the previous block's last baseline value, which the
    reverse walk has not produced yet) — plus the partial mark count.
    :func:`fold_emit_states` resolves the one excluded sample per block
    from tiny strided slices, replacing the next trip's full-array XLA
    pass (``level_block_states_fwd``) with (rows, nblk)-sized work.  The
    fold is 5 native reductions over values already in registers; the
    baseline's block-first value crosses grid steps in one extra SMEM
    carry slot."""
    nm1 = _enc_const(n_real - 1, encode)

    def kernel(fp_ref, xprev_ref, xnext_ref, bfirst_ref, blast_ref,
               fa_ref, fb_ref, fc_ref, *rest):
        if row_4d:
            (_li_ref, x_ref, rotp_ref, pbase_ref, perr_ref, comp_ref,
             _orot, base_ref, rot_ref, err_ref, row_ref, compo_ref,
             *tail) = rest
        else:
            (x_ref, rotp_ref, pbase_ref, perr_ref, comp_ref,
             base_ref, rot_ref, err_ref, row_ref, compo_ref, *tail) = rest
        if fold_emit:
            fold_ref, carry = tail
        else:
            (carry,) = tail
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            _init_carry(carry)
            if fold_emit:
                # next-block-first baseline value: no next block at the
                # reverse walk's first step.  0.0 is safe — it can only
                # reach the mask of the last block's final sample, whose
                # mark is position-determined (endpoint or padding).
                carry[4] = 0.0

        blk = nblk - 1 - g  # reverse walk
        x = x_ref[0]
        pos, row, lane, _, state0 = _knot_state(
            x, blk, n_real, xprev_ref[r, blk], xnext_ref[r, blk], encode
        )
        # folds are flattened (rows, nblk*4): a trailing size-4 SMEM dim
        # would be lane-padded to 128 (~32x SMEM waste -> OOM at 1M)
        fwd_in = tuple(fp_ref[r, blk * 4 + i] for i in range(4))
        rev_in = tuple(carry[i] for i in range(4))
        carry_out = _fused_scans_and_epilogue(
            x, state0, pos, row, lane, fwd_in, rev_in, nm1,
            pos == n_real - 1, bfirst_ref[r], blast_ref[r], endpoint_mode,
            fa_ref[r] != 0, fb_ref[r] != 0, fc_ref[r] != 0,
            rotp_ref, pbase_ref, perr_ref, comp_ref,
            base_ref, rot_ref, err_ref, row_ref, compo_ref, row_4d,
            encode)
        for i in range(4):
            carry[i] = carry_out[i]

        if fold_emit:
            b = base_ref[0]  # the baseline just written (next level's x)
            nf = carry[4]    # baseline[(blk+1)*BLK], from the previous step
            # same mask formula as the next trip's _knot_state will apply;
            # the prev-edge dummy (0.0) only reaches the block's FIRST
            # sample, which the partial fold excludes
            _, _, _, mb, _ = _knot_state(b, blk, n_real, jnp.float32(0.0),
                                         nf)
            mp = mb & ~((row == 0) & (lane == 0))
            posf = _enc_pos(pos, encode)
            mpp = jnp.where(mp, posf, _NONE)
            p1 = jnp.max(mpp)
            p2 = jnp.max(jnp.where(mpp == p1, _NONE, mpp))
            # one-hot value picks: positions are unique, so the sum has
            # exactly one (or zero: p==_NONE never matches) contributor
            v1 = jnp.sum(jnp.where(posf == p1, b, 0.0))
            v2 = jnp.sum(jnp.where(posf == p2, b, 0.0))
            cnt = jnp.sum(mp.astype(jnp.float32))
            fr = lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
            fl = lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
            vec = jnp.zeros((8, _LANES), jnp.float32)
            for k, s in enumerate((p1, v1, p2, v2, cnt)):
                vec = jnp.where((fr == 0) & (fl == k), s, vec)
            fold_ref[0] = vec
            carry[4] = b[0, 0]

    return kernel


def _top2_comp(direction: int):
    """Commutative top-2-by-position reduction computation for
    ``lax.reduce``: merges two (p1, v1, p2, v2) states (each internally
    ordered, p1 the most extreme) into the two most extreme positions of
    the union with their values.  ``direction`` +1 keeps the LARGEST
    positions (sentinel -1 = empty slot), -1 the SMALLEST (sentinel must
    be larger than any real position).  Commutative because positions are
    unique (sentinel ties resolve to identical (sentinel, 0) states), so
    XLA's unspecified reduction order is safe."""
    def comp(a, b):
        a1p, a1v, a2p, a2v = a
        b1p, b1v, b2p, b2v = b
        if direction > 0:
            take_b1 = b1p > a1p
        else:
            take_b1 = b1p < a1p
        f1p = jnp.where(take_b1, b1p, a1p)
        f1v = jnp.where(take_b1, b1v, a1v)
        # runner-up candidates: the loser's best and the winner's second
        l1p = jnp.where(take_b1, a1p, b1p)
        l1v = jnp.where(take_b1, a1v, b1v)
        w2p = jnp.where(take_b1, b2p, a2p)
        w2v = jnp.where(take_b1, b2v, a2v)
        take_l = l1p > w2p if direction > 0 else l1p < w2p
        f2p = jnp.where(take_l, l1p, w2p)
        f2v = jnp.where(take_l, l1v, w2v)
        return f1p, f1v, f2p, f2v

    return comp


def _top2cnt_comp(a, b):
    """:func:`_top2_comp` (+1 direction) extended with a mark-count
    channel (plain add — counts are exact in f32 far beyond any signal
    length here)."""
    f1p, f1v, f2p, f2v = _top2_comp(+1)(a[:4], b[:4])
    return f1p, f1v, f2p, f2v, a[4] + b[4]


def block_fill_summaries(mb, pf, xb, big, directions: str = "both"):
    """Per-block last-two (fwd) and first-two (rev) marked (position,
    value) states as ONE variadic ``lax.reduce`` per direction over the
    trailing axis.  ``big`` must exceed every real position (the rev
    sentinel).  A chained-masked-reduction formulation (l1, then l2 gated
    on l1, then one-hot value sums) costs ~18 HBM passes in XLA; a top-2
    reduction carries values with positions in a single input pass per
    direction.  Outputs are sign-encoded states (empty slots: position
    ``_NONE``, value 0), bitwise identical to the chained form.

    ``directions``: "both" returns ``(fwd, rev)``; "fwd" / "rev" compute
    and return just that direction's tuple (one input pass)."""
    zero = jnp.float32(0)
    neg = jnp.float32(_NONE)
    axis = pf.ndim - 1
    fwd = None
    if directions in ("both", "fwd"):
        fwd = lax.reduce(
            (jnp.where(mb, pf, neg), jnp.where(mb, xb, zero),
             jnp.full_like(pf, neg), jnp.zeros_like(xb)),
            (neg, zero, neg, zero),
            _top2_comp(+1), (axis,),
        )
        if directions == "fwd":
            return fwd
    big = jnp.float32(big)
    rev = lax.reduce(
        (jnp.where(mb, pf, big), jnp.where(mb, xb, zero),
         jnp.full_like(pf, big), jnp.zeros_like(xb)),
        (big, zero, big, zero),
        _top2_comp(-1), (axis,),
    )
    rev = (jnp.where(rev[0] >= big, neg, rev[0]),
           jnp.where(rev[0] >= big, zero, rev[1]),
           jnp.where(rev[2] >= big, neg, rev[2]),
           jnp.where(rev[2] >= big, zero, rev[3]))
    if directions == "rev":
        return rev
    return fwd, rev


def _top2x2cnt_comp(a, b):
    """Both-direction :func:`_top2_comp` plus a count channel in ONE
    commutative comparator: channels 0-3 forward last-two (_NONE-encoded
    empties), 4-7 reverse first-two (big-encoded empties), 8 mark count
    (plain add, exact in f32 at any signal length here)."""
    f = _top2_comp(+1)(a[:4], b[:4])
    r = _top2_comp(-1)(a[4:8], b[4:8])
    return f + r + (a[8] + b[8],)


def block_fill_summaries_cnt(mb, pf, xb, big):
    """Per-block forward last-two, reverse first-two, and mark count as
    ONE variadic ``lax.reduce`` over the trailing axis — the sharded twin
    of :func:`level_block_states_fwd`'s fused 5-channel pass (one input
    pass instead of a forward reduce + a count sum + a whole-shard
    reverse reduce).

    Returns ``(fwd, rev_enc, cnt)``; ``rev_enc`` stays big-encoded so the
    caller can fold it across blocks (top-2 merge is order-exact) before
    decoding empty slots to ``_NONE``.
    """
    zero = jnp.float32(0)
    neg = jnp.float32(_NONE)
    bigf = jnp.float32(big)
    axis = pf.ndim - 1
    out = lax.reduce(
        (jnp.where(mb, pf, neg), jnp.where(mb, xb, zero),
         jnp.full_like(pf, neg), jnp.zeros_like(xb),
         jnp.where(mb, pf, bigf), jnp.where(mb, xb, zero),
         jnp.full_like(pf, bigf), jnp.zeros_like(xb),
         mb.astype(jnp.float32)),
        (neg, zero, neg, zero, bigf, zero, bigf, zero, zero),
        _top2x2cnt_comp, (axis,),
    )
    return out[:4], out[4:8], out[8]


def _knot_mask_flat(flat, n: int):
    """ITD knot mask over the padded flat signal — formula-identical to
    ``_knot_state`` (canonical extrema + endpoints, NaN quarantine);
    padding is never marked."""
    it = lax.broadcasted_iota(jnp.int32, flat.shape, 1)
    xm1 = jnp.concatenate([flat[:, :1], flat[:, :-1]], axis=-1)
    xp1 = jnp.concatenate([flat[:, 1:], flat[:, -1:]], axis=-1)
    dxb = jnp.where(jnp.isnan(flat - xm1), jnp.inf, flat - xm1)
    dxf = jnp.where(jnp.isnan(xp1 - flat), jnp.inf, xp1 - flat)
    near_nan = jnp.isnan(flat) | jnp.isnan(xm1) | jnp.isnan(xp1)
    interior = (it > 0) & (it < n - 1)
    is_min = (dxb <= 0) & (dxf > 0)
    is_max = (dxb >= 0) & (dxf < 0)
    return ((is_min | is_max) & interior & ~near_nan) | (it == 0) | (
        it == n - 1
    ), it


def _exclusive_fwd_folds(inc_tuple):
    """Exclusive per-block prefixes from inclusive per-block fold tuples,
    flattened (rows, nblk*4) for SMEM prefetch."""
    inc = lax.associative_scan(_combine, inc_tuple, axis=1)
    exc = tuple(
        jnp.concatenate(
            [jnp.full_like(s[:, :1], _NONE if i % 2 == 0 else 0.0),
             s[:, :-1]], axis=1)
        for i, s in enumerate(inc)
    )
    rows, nblk = exc[0].shape
    return jnp.stack(exc, axis=-1).reshape(rows, nblk * 4)


def level_block_states_fwd(x3, n: int, encode: bool = False):
    """Forward-only XLA side of the fused level: knot mask
    (formula-identical to ``_knot_state``), interior extrema count, and
    the per-block exclusive FORWARD fill-state folds, all from ONE
    5-channel ``lax.reduce`` pass over the padded flat signal.  The
    reverse direction needs no precomputation — the fused kernel walks
    the grid in reverse and chains the suffix through its SMEM carry.

    Returns ``(nex, fwd_prefix)`` with the folds flattened as
    (rows, nblk*4).
    """
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    flat = x3.reshape(rows, npad)
    m, it = _knot_mask_flat(flat, n)

    mb = m.reshape(rows, nblk, BLK)
    xb = flat.reshape(rows, nblk, BLK)
    pf = _enc_pos(it, encode).reshape(rows, nblk, BLK)
    zero = jnp.float32(0)
    neg = jnp.float32(_NONE)
    l1, v1, l2, v2, cnt = lax.reduce(
        (jnp.where(mb, pf, neg), jnp.where(mb, xb, zero),
         jnp.full_like(pf, neg), jnp.zeros_like(xb),
         mb.astype(jnp.float32)),
        (neg, zero, neg, zero, zero),
        _top2cnt_comp, (2,),
    )
    nex = jnp.sum(cnt, axis=-1).astype(jnp.int32) - 2
    return nex, _exclusive_fwd_folds((l1, v1, l2, v2))


def fold_emit_states(fold_raw, base3, prev_edge, n: int,
                     encode: bool = False):
    """``(nex, fwd_prefix)`` for the next sift trip from the fused
    kernel's in-kernel partial folds (``fold_emit=True``) — bitwise-equal
    to ``level_block_states_fwd(base3, n)`` with only (rows, nblk)-sized
    XLA work in place of its full-array reduce pass.

    Each kernel-emitted block fold excludes the block's FIRST sample
    (its knot mask needs the previous block's last baseline value, which
    the reverse-walking kernel had not produced yet).  That one sample
    per block is resolved here from tiny strided slices: its neighbors
    are ``prev_edge[b] = B[b*BLK-1]`` (the driver's existing per-block
    edge scalars) and the block's second sample, and its state is folded
    in FRONT of the partial fold (``_combine`` is ordered, positions are
    unique, values are selected not combined — so association with the
    in-kernel reduction is exact).
    """
    rows, nsub, _ = base3.shape
    npad = nsub * _LANES
    nblk = npad // BLK
    f = fold_raw.reshape(rows, nblk, 8, _LANES)
    p1, v1, p2, v2, cnt = (f[:, :, 0, k] for k in range(5))

    flat = base3.reshape(rows, npad)
    b0 = flat[:, ::BLK]   # first sample of each block
    b1 = flat[:, 1::BLK]  # its next neighbor (in-block)
    bm1 = prev_edge       # its previous neighbor (b=0: B[0], see _pad_edges)
    pos0_i = (jnp.arange(nblk, dtype=jnp.int32) * BLK)[None, :]
    pos0 = _enc_pos(pos0_i, encode)

    # the _knot_mask_flat formula restricted to the blocks' first samples
    dxb = jnp.where(jnp.isnan(b0 - bm1), jnp.inf, b0 - bm1)
    dxf = jnp.where(jnp.isnan(b1 - b0), jnp.inf, b1 - b0)
    near_nan = jnp.isnan(b0) | jnp.isnan(bm1) | jnp.isnan(b1)
    interior = (pos0_i > 0) & (pos0_i < n - 1)
    is_min = (dxb <= 0) & (dxf > 0)
    is_max = (dxb >= 0) & (dxf < 0)
    m0 = ((is_min | is_max) & interior & ~near_nan) | (pos0_i == 0) | (
        pos0_i == n - 1
    )

    first = (jnp.where(m0, jnp.broadcast_to(pos0, b0.shape), _NONE),
             jnp.where(m0, b0, 0.0),
             jnp.full_like(b0, _NONE), jnp.zeros_like(b0))
    folds = _combine(first, (p1, v1, p2, v2))
    nex = (jnp.sum(cnt, axis=-1)
           + jnp.sum(m0.astype(jnp.float32), axis=-1)).astype(jnp.int32) - 2
    return nex, _exclusive_fwd_folds(folds)


def ksite_block_states(x3, ksite3, n: int):
    """Per-block exclusive FORWARD folds of (position, k_site) under the
    knot mask of x — the prefetched seeds for the cubic neighbor kernel
    (its reverse direction rides the SMEM carry).  One 4-channel
    ``lax.reduce`` pass over (x, k_site)."""
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    flat = x3.reshape(rows, npad)
    m, it = _knot_mask_flat(flat, n)

    mb = m.reshape(rows, nblk, BLK)
    kb = ksite3.reshape(rows, nblk, BLK)
    pf = it.astype(jnp.float32).reshape(rows, nblk, BLK)
    zero = jnp.float32(0)
    neg = jnp.float32(_NONE)
    folds = lax.reduce(
        (jnp.where(mb, pf, neg), jnp.where(mb, kb, zero),
         jnp.full_like(pf, neg), jnp.zeros_like(kb)),
        (neg, zero, neg, zero),
        _top2_comp(+1), (2,),
    )
    return _exclusive_fwd_folds(folds)


# ---------------------------------------------------------------------------
# cubic-tier fused fills: round 1 + the Frei-Osorio knot-value epilogue in
# ONE kernel (emits only k_site), round 2 (neighbor positions + knot
# values) in ONE kernel — each reverse-walking with an SMEM suffix carry
# and forward folds via scalar prefetch (the fused sift level's scheme).
# Replaces the cubic tier's four generic fill kernels (2 launches, 14
# channel-direction scans and ~60% of their HBM traffic instead of 16).
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _make_cubic_ksite_kernel(n_real: int, nblk: int,
                             fold_emit: bool = False):
    sub = BLK // _LANES

    def kernel(fp_ref, xprev_ref, xnext_ref, bfirst_ref, blast_ref,
               x_ref, k_ref, *rest):
        if fold_emit:
            fold_ref, carry = rest
        else:
            (carry,) = rest
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            carry[0] = _NONE
            carry[1] = 0.0

        blk = nblk - 1 - g  # reverse walk
        x = x_ref[0]
        pos, row, lane, m, state0 = _knot_state(
            x, blk, n_real, xprev_ref[r, blk], xnext_ref[r, blk]
        )
        fwd_in = tuple(fp_ref[r, blk * 4 + i] for i in range(4))
        fstate, _ = _block_scan(state0, reverse=False, carry_in=fwd_in,
                                rows=sub)
        _, _, f2p, f2x = _mask_outputs(fstate)

        # reverse: only the strictly-after next knot — a 2-channel scan
        state2 = (state0[0], x)
        carry_in = (carry[0], carry[1])
        rstate, carry_out = _block_scan(state2, reverse=True,
                                        carry_in=carry_in, rows=sub)
        shifted = tuple(
            _roll_next(s, c, row, lane) for s, c in zip(rstate, carry_in)
        )
        has = shifted[0] >= 0
        n1p = jnp.where(has, shifted[0], 0.0)
        n1x = jnp.where(has, shifted[1], 0.0)
        carry[0] = carry_out[0]
        carry[1] = carry_out[1]

        # Frei-Osorio knot value at every sample (only knot sites are
        # consumed downstream) — expression-identical to _fo_knot_values
        iota_f = pos.astype(jnp.float32)
        span = n1p - f2p
        w = (iota_f - f2p) / jnp.where(span == 0, jnp.ones_like(span), span)
        k = 0.5 * (f2x + w * (n1x - f2x)) + 0.5 * x
        k = jnp.where(pos == 0, bfirst_ref[r], k)
        k = jnp.where(pos == n_real - 1, blast_ref[r], k)
        k_ref[0] = k

        if fold_emit:
            # the (position, k_site) per-block forward fold the neighbor
            # kernel needs — NO excluded samples: the mask is on x, whose
            # block edges arrived via scalar prefetch, so the fold is
            # complete in-block (unlike the sift's baseline folds)
            posf = pos.astype(jnp.float32)
            mpp = jnp.where(m, posf, _NONE)
            p1 = jnp.max(mpp)
            p2 = jnp.max(jnp.where(mpp == p1, _NONE, mpp))
            v1 = jnp.sum(jnp.where(posf == p1, k, 0.0))
            v2 = jnp.sum(jnp.where(posf == p2, k, 0.0))
            fr = lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
            fl = lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
            vec = jnp.zeros((8, _LANES), jnp.float32)
            for kk, s in enumerate((p1, v1, p2, v2)):
                vec = jnp.where((fr == 0) & (fl == kk), s, vec)
            fold_ref[0] = vec

    return kernel


def cubic_ksite_padded(x3, prev_edge, next_edge, b_first, b_last,
                       fwd_prefix, n: int, *, interpret: bool = False,
                       fold_emit: bool = False):
    """Frei-Osorio knot values in ONE both-direction kernel.  Returns
    padded 3-D ``k_site``; with ``fold_emit``, also the raw per-block
    (position, k_site) forward-fold planes — run them through
    :func:`cubic_fold_states` to replace the ``ksite_block_states``
    full-array pass."""
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    sub = BLK // _LANES
    main_map = lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0))
    spec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    out_specs = [spec]
    out_shape = [_out_struct(x3.shape, jnp.float32, x3)]
    if fold_emit:
        out_specs.append(pl.BlockSpec(
            (1, 8, _LANES), lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0)),
            memory_space=pltpu.VMEM))
        out_shape.append(
            _out_struct((rows, nblk * 8, _LANES), jnp.float32, x3))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(rows, nblk),
        in_specs=[spec],
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )
    outs = pl.pallas_call(
        _make_cubic_ksite_kernel(n, nblk, fold_emit=fold_emit),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(fwd_prefix, prev_edge, next_edge,
      b_first.astype(jnp.float32), b_last.astype(jnp.float32), x3)
    return outs if fold_emit else outs[0]


def cubic_fold_states(fold_raw):
    """Exclusive (rows, nblk*4) forward prefixes from the ksite kernel's
    complete per-block folds — bitwise ``ksite_block_states(x3, ks3, n)``
    without its two-array full sweep."""
    rows = fold_raw.shape[0]
    nblk = fold_raw.shape[1] // 8
    f = fold_raw.reshape(rows, nblk, 8, _LANES)
    return _exclusive_fwd_folds(tuple(f[:, :, 0, k] for k in range(4)))


@lru_cache(maxsize=None)
def _make_cubic_neighbors_kernel(n_real: int, nblk: int):
    sub = BLK // _LANES

    def kernel(kp_ref, xprev_ref, xnext_ref, x_ref, k_ref,
               p1p_ref, p2p_ref, n1p_ref, kj_ref, kjm1_ref, kj1_ref,
               carry):
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            carry[0] = _NONE
            carry[1] = 0.0

        blk = nblk - 1 - g  # reverse walk
        x = x_ref[0]
        k = k_ref[0]
        pos, row, lane, m, _ = _knot_state(
            x, blk, n_real, xprev_ref[r, blk], xnext_ref[r, blk]
        )
        posf = pos.astype(jnp.float32)
        mp = jnp.where(m, posf, _NONE)

        # forward: top-2 (position, k_site) — positions equal round 1's
        # p1p/p2p (same mask), values are the neighbor knot values
        state0 = (mp, k, jnp.full_like(k, _NONE), k)
        fwd_in = tuple(kp_ref[r, blk * 4 + i] for i in range(4))
        fstate, _ = _block_scan(state0, reverse=False, carry_in=fwd_in,
                                rows=sub)
        p1p, kj, p2p, kjm1 = _mask_outputs(fstate)

        # reverse: only the strictly-after next knot — a 2-channel scan
        state2 = (mp, k)
        carry_in = (carry[0], carry[1])
        rstate, carry_out = _block_scan(state2, reverse=True,
                                        carry_in=carry_in, rows=sub)
        shifted = tuple(
            _roll_next(s, c, row, lane) for s, c in zip(rstate, carry_in)
        )
        has = shifted[0] >= 0
        n1p = jnp.where(has, shifted[0], 0.0)
        kj1 = jnp.where(has, shifted[1], 0.0)
        carry[0] = carry_out[0]
        carry[1] = carry_out[1]

        p1p_ref[0], p2p_ref[0], n1p_ref[0] = p1p, p2p, n1p
        kj_ref[0], kjm1_ref[0], kj1_ref[0] = kj, kjm1, kj1

    return kernel


def cubic_neighbors_padded(x3, ksite3, prev_edge, next_edge, kfwd_prefix,
                           n: int, *, interpret: bool = False):
    """Neighbor-knot channels in ONE both-direction kernel: returns
    padded 3-D ``(p1p, p2p, n1p, k_j, k_jm1, k_j1)`` (n1p/k_j1 already
    strictly-after-shifted, zero-defaulted)."""
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    sub = BLK // _LANES
    main_map = lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0))
    spec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(rows, nblk),
        in_specs=[spec, spec],
        out_specs=[spec] * 6,
        scratch_shapes=[pltpu.SMEM((2,), jnp.float32)],
    )
    return pl.pallas_call(
        _make_cubic_neighbors_kernel(n, nblk),
        grid_spec=grid_spec,
        out_shape=[_out_struct(x3.shape, jnp.float32, x3, ksite3)] * 6,
        interpret=interpret,
    )(kfwd_prefix, prev_edge, next_edge, x3, ksite3)


def sift_level_fused_padded(x3, prev_edge, next_edge, b_first, b_last,
                            fwd_prefix, stop_a, stop_b, cont,
                            rot3, pbase3, perr3, comp3, n: int, *,
                            endpoint_mode: str = "reference",
                            interpret: bool = False,
                            out_levels=None, level_idx=None,
                            donate_input: bool = False,
                            fold_emit: bool = False,
                            encode: bool = False):
    """One sift trip as ONE reverse-walking kernel (see
    ``_make_level_fused_kernel``); stop flags and the forward block folds
    arrive precomputed from :func:`level_block_states_fwd`.  Returns
    ``(base3, rot3, err3, row, comp3)``; with ``fold_emit``, appends the
    raw (rows, nblk*8, 128) per-block partial-fold planes for
    :func:`fold_emit_states`.

    ``donate_input=True`` donates ``x3``'s buffer to the baseline output;
    only pass it when ``x3`` genuinely dies at this call.  The sift trip
    loop keeps its input live (as the next trip's ``pbase3``), where a
    donation would both force XLA to insert a full-array copy AND exercise
    the still-live-donated-operand pattern this backend is known to
    mishandle (see the structural-aliases-only note below)."""
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    sub = BLK // _LANES
    main_map = lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0))
    rspec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    row_into_levels = out_levels is not None
    operands = [
        fwd_prefix, prev_edge, next_edge, b_first, b_last,
        stop_a.astype(jnp.float32), stop_b.astype(jnp.float32),
        cont.astype(jnp.float32),
    ]
    tensor_operands = [x3, rot3, pbase3, perr3, comp3]
    if row_into_levels:
        num_prefetch = 9
        operands.append(jnp.asarray(level_idx, jnp.int32).reshape(1))
        operands += tensor_operands + [out_levels]
        in_specs = [rspec] * 5 + [pl.BlockSpec(memory_space=pl.ANY)]
        row_spec = pl.BlockSpec(
            (1, 1, sub, _LANES),
            lambda r, b, *refs: (refs[8][0], r, nblk - 1 - b, np.int32(0)),
            memory_space=pltpu.VMEM,
        )
        row_shape = _out_struct(out_levels.shape, jnp.float32, out_levels,
                                x3)
        # STRUCTURAL aliases only: x3->base (only when the caller says the
        # input dies, via donate_input), and out_levels->row (REQUIRED -
        # the in-place row write passes the unwritten levels through via
        # the shared buffer).  Carry aliases (pbase->rot, perr->err,
        # comp->comp_out) are deliberately NOT used: on-chip, XLA's copy
        # insertion around must-aliased custom calls proved unreliable
        # (outputs ended up sharing memory and the pending-err channel
        # corrupted by ~1 ulp of the signal; verified by an
        # aliasing-ablation A/B), and dropping them costs no bandwidth -
        # only buffer reuse, which XLA's assigner recovers from liveness
        # anyway.
        aliases = {14: 3}
        required_aliases = {14: 3}
        if donate_input:
            aliases = {9: 0, 14: 3}
    else:
        num_prefetch = 8
        operands += tensor_operands
        in_specs = [rspec] * 5
        row_spec = rspec
        row_shape = _out_struct(x3.shape, jnp.float32, x3, rot3)
        aliases = {8: 0} if donate_input else {}
        required_aliases = {}
    out_specs = [rspec, rspec, rspec, row_spec, rspec]
    out_shape = [_out_struct(x3.shape, jnp.float32, x3, comp3)] * 3 + [
        row_shape, _out_struct(x3.shape, jnp.float32, x3, comp3)]
    if fold_emit:
        # one (8, 128) plane per block: row 0 lanes 0-4 carry
        # (p1, v1, p2, v2, cnt) — a full f32 tile so the write stays
        # tile-aligned; ~0.5 MB/trip at 8x1M vs the 32 MB XLA pass it
        # replaces
        out_specs.append(pl.BlockSpec(
            (1, 8, _LANES), lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0)),
            memory_space=pltpu.VMEM))
        out_shape.append(
            _out_struct((rows, nblk * 8, _LANES), jnp.float32, x3))
    rgrid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(rows, nblk),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.SMEM((5 if fold_emit else 4,), jnp.float32)],
    )
    return pl.pallas_call(
        _make_level_fused_kernel(n, nblk, endpoint_mode,
                                 row_4d=row_into_levels,
                                 fold_emit=fold_emit, encode=encode),
        grid_spec=rgrid,
        out_shape=out_shape,
        # the ablation gate drops donations but keeps the REQUIRED
        # out_levels->row pass-through alias (without it the unwritten
        # levels of the row output are garbage, not a comparable ablation)
        input_output_aliases=required_aliases if _NO_ALIAS else aliases,
        interpret=interpret,
    )(*operands)


def sift_level_emit_padded(x3, prev_edge, next_edge, b_first, b_last,
                           rot3, pbase3, perr3, comp3, done, over_budget,
                           n: int, *, endpoint_mode: str = "reference",
                           interpret: bool = False,
                           out_levels=None, level_idx: int | None = None,
                           encode: bool = False):
    """One sift trip, fully in-kernel and **padded-resident** (see
    ``decomp/itd.py`` for the loop semantics): the stop-flag logic runs on
    a fused count of the forward channels, and the fused reverse kernel
    interpolates the next level AND materializes this trip's output row +
    compensation update in-register.

    All big arrays stay in the kernels' padded 3-D layout
    ``(rows, npad//128, 128)`` between trips — no pad/crop copies — and the
    next trip's block-edge scalars come from tiny strided slices of the
    padded baseline.  (SMEM whole-array outputs were measured to roughly
    double a kernel's wall time — the fwd fill ran 1.9 ms with an SMEM
    counts output vs 0.8 ms without — so both kernels emit only VMEM
    tiles and the scalar plumbing stays in XLA.)

    Returns ``(base3, rot3, err3, row3, comp3, nex, stop_a, stop_b, cont,
    prev_edge', next_edge', b_first', b_last')`` where the primed values
    describe the returned baseline (the next trip's input).
    """
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    sub = BLK // _LANES

    fwd3 = _linear_fill2_padded(x3, prev_edge, next_edge, n, nblk,
                                reverse=False, interpret=interpret,
                                encode=encode)

    # interior extrema count: a sample is a knot iff it is its own most
    # recent knot; one fused elementwise+reduce pass (~0.05 ms at 8x1M)
    it_i = lax.broadcasted_iota(jnp.int32, x3.shape, 1) * _LANES + \
        lax.broadcasted_iota(jnp.int32, x3.shape, 2)
    iota = _enc_pos(it_i, encode)
    nex = jnp.sum(fwd3[0] == iota, axis=(-2, -1)).astype(jnp.int32) - 2
    stop_a = (~done) & (nex < 2)
    stop_b = (~done) & (~stop_a) & over_budget
    cont = (~done) & (~stop_a) & (~stop_b)

    main_map = lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0))
    rspec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    row_into_levels = out_levels is not None
    operands = [
        prev_edge, next_edge, b_first, b_last,
        stop_a.astype(jnp.float32), stop_b.astype(jnp.float32),
        cont.astype(jnp.float32),
    ]
    tensor_operands = [x3, *fwd3, rot3, pbase3, perr3, comp3]
    # structural aliases only (see sift_level_fused_padded): f1p->base
    # (dies here) and out_levels->row when writing in place.
    if row_into_levels:
        # the sift's output buffer rides along unpiped (ANY memory
        # space); the row output writes only level `level_idx`'s blocks
        # in place, everything else passes through via the alias.  The
        # level index is a DYNAMIC scalar-prefetch operand read by the
        # row index map, so all trips share one kernel module.
        num_prefetch = 8
        operands.append(jnp.asarray(level_idx, jnp.int32).reshape(1))
        operands += tensor_operands + [out_levels]
        in_specs = [rspec] * 9 + [pl.BlockSpec(memory_space=pl.ANY)]
        row_spec = pl.BlockSpec(
            (1, 1, sub, _LANES),
            lambda r, b, *refs: (refs[7][0], r, nblk - 1 - b, np.int32(0)),
            memory_space=pltpu.VMEM,
        )
        row_shape = _out_struct(out_levels.shape, jnp.float32, out_levels,
                                x3)
        # structural aliases only - see sift_level_fused_padded.  The f1p
        # forward channel (input 9) genuinely dies here, so its donation
        # is always safe; {17: 3} is the REQUIRED row pass-through.
        aliases = {9: 0, 17: 3}
        required_aliases = {17: 3}
        # rot3 (input 13) still dies here but its shape no longer matches
        # the row output; leave it undonated.
    else:
        num_prefetch = 7
        operands += tensor_operands
        in_specs = [rspec] * 9
        row_spec = rspec
        row_shape = _out_struct(x3.shape, jnp.float32, x3, rot3)
        aliases = {8: 0}
        required_aliases = {}
    rgrid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(rows, nblk),
        in_specs=in_specs,
        out_specs=[rspec, rspec, rspec, row_spec, rspec],
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )
    outs = pl.pallas_call(
        _make_linear_emit_kernel(n, nblk, endpoint_mode,
                                 row_4d=row_into_levels, encode=encode),
        grid_spec=rgrid,
        out_shape=[_out_struct(x3.shape, jnp.float32, x3, *fwd3)] * 3
        + [row_shape, _out_struct(x3.shape, jnp.float32, x3, comp3)],
        input_output_aliases=required_aliases if _NO_ALIAS else aliases,
        interpret=interpret,
    )(*operands)
    base3, rot_out, err3, row3, comp_out = outs

    # next trip's edge/end scalars: tiny strided slices of the padded
    # baseline.
    pe2, ne2 = block_edge_scalars(base3, nblk)
    flat = base3.reshape(rows, npad)
    bf2 = 0.5 * (flat[:, 0] + flat[:, 1])
    bl2 = 0.5 * (flat[:, n - 2] + flat[:, n - 1])
    return (base3, rot_out, err3, row3, comp_out, nex, stop_a, stop_b,
            cont, pe2, ne2, bf2, bl2)
