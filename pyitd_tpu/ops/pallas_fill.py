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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fill2_pallas", "linear_fill2_pallas", "BLK"]

BLK = 8192
_LANES = 128
_NONE = -1.0  # "no mark yet" sentinel in the position channels


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
        rolled = pltpu.roll(a, size - k if reverse else k, axis)
        if i % 2 == 0:  # position channel: sentinel at the border
            rolled = jnp.where(keep, rolled, jnp.full_like(a, _NONE))
        out.append(rolled)
    return tuple(out)


def _doubling_scan(state, axis: int, steps: int, reverse: bool):
    for s in range(steps):
        prev = _shifted(state, 1 << s, axis, reverse)
        state = _combine(prev, state)
    return state


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


def _block_scan(state, reverse: bool, carry, rows: int):
    """Hierarchical in-VMEM fill of one (rows, 128) block + SMEM carry."""
    # stage 1: within each 128-lane row
    state = _doubling_scan(state, axis=1, steps=7, reverse=reverse)

    # stage 2: row summaries (full-row reductions) across sublanes
    edge = 0 if reverse else _LANES - 1
    summ = tuple(s[:, edge : edge + 1] for s in state)  # (rows, 1)
    pref = _doubling_scan(summ, axis=0, steps=int(np.log2(rows)), reverse=reverse)
    pref = _shifted(pref, 1, 0, reverse)  # exclusive

    # stage 3: row prefixes, then the cross-block SMEM carry
    state = _combine(
        tuple(jnp.broadcast_to(p, (rows, _LANES)) for p in pref), state
    )
    carry_t = tuple(jnp.full((rows, _LANES), carry[i]) for i in range(4))
    state = _combine(carry_t, state)

    erow = 0 if reverse else rows - 1
    ecol = 0 if reverse else _LANES - 1
    for i in range(4):
        carry[i] = state[i][erow, ecol]
    return state


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
        state = _block_scan(state, reverse, carry, rows)

        outs = _mask_outputs(state)
        p1p_ref[0], p1x_ref[0], p2p_ref[0], p2x_ref[0] = outs

    return kernel


_fill2_fwd = _make_fill2_kernel(False)
_fill2_bwd = _make_fill2_kernel(True)


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

    sub = BLK // _LANES
    nblk = npad // BLK
    if reverse:
        # reverse scans walk the grid from the last block backwards
        index_map = lambda r, b: (r, nblk - 1 - b, 0)
        kernel = _fill2_bwd
    else:
        index_map = lambda r, b: (r, b, 0)
        kernel = _fill2_fwd
    spec = pl.BlockSpec((1, sub, _LANES), index_map, memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(rows, nblk),
        in_specs=[spec, spec, spec],
        out_specs=[spec] * 4,
        out_shape=[
            jax.ShapeDtypeStruct((rows, npad // _LANES, _LANES), jnp.float32)
        ] * 4,
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
        interpret=interpret,
    )(p, v, m)
    outs = tuple(o.reshape(rows, npad) for o in outs)
    if pad:
        outs = tuple(o[..., :n] for o in outs)
    return outs


# ---------------------------------------------------------------------------
# specialized ITD-level kernel: mask + positions computed in-kernel, so HBM
# sees only x in (three views: 1-tile halos) and the four fill channels out
# ---------------------------------------------------------------------------

def _make_linear_fill2_kernel(reverse: bool, n_real: int, nblk: int):
    sub = BLK // _LANES

    def kernel(xprev_ref, xnext_ref, x_ref, p1p_ref, p1x_ref, p2p_ref,
               p2x_ref, carry):
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            _init_carry(carry)

        blk = (nblk - 1 - g) if reverse else g
        x = x_ref[0]
        row = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 0)
        lane = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 1)
        pos = blk * BLK + row * _LANES + lane

        # one-sample neighbors in row-major order; block-edge scalars come
        # from the scalar-prefetch SMEM arrays
        prev_scalar = xprev_ref[r, blk]
        next_scalar = xnext_ref[r, blk]
        xm1 = pltpu.roll(x, 1, 1)
        col_prev = pltpu.roll(x[:, _LANES - 1 :], 1, 0)
        xm1 = jnp.where(lane == 0, col_prev, xm1)
        xm1 = jnp.where((lane == 0) & (row == 0), prev_scalar, xm1)
        xp1 = pltpu.roll(x, _LANES - 1, 1)
        col_next = pltpu.roll(x[:, :1], sub - 1, 0)
        xp1 = jnp.where(lane == _LANES - 1, col_next, xp1)
        xp1 = jnp.where((lane == _LANES - 1) & (row == sub - 1), next_scalar, xp1)

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
            jnp.where(m, pos.astype(jnp.float32), _NONE),
            x,
            jnp.full_like(x, _NONE),
            x,
        )
        state = _block_scan(state, reverse, carry, sub)

        outs = _mask_outputs(state)
        p1p_ref[0], p1x_ref[0], p2p_ref[0], p2x_ref[0] = outs

    return kernel


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

    sub = BLK // _LANES
    if reverse:
        main_map = lambda r, b, _pe, _ne: (r, nblk - 1 - b, 0)
    else:
        main_map = lambda r, b, _pe, _ne: (r, b, 0)

    spec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(rows, nblk),
        in_specs=[spec],
        out_specs=[spec] * 4,
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )
    outs = pl.pallas_call(
        _make_linear_fill2_kernel(reverse, n, nblk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((rows, npad // _LANES, _LANES), jnp.float32)
        ] * 4,
        interpret=interpret,
    )(prev_edge, next_edge, x3)
    outs = tuple(o.reshape(rows, npad)[..., :n] for o in outs)
    return outs
