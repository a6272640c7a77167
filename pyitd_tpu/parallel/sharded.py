"""Sequence-parallel ITD — time-axis sharding over a device mesh.

For million-point-plus signals the time axis is sharded across chips
(SURVEY.md §2.5 / §5): extrema detection needs a 1-sample halo exchange
(`ppermute`), and the knot-propagation fills need one small `all_gather`
of per-shard boundary summaries — everything else is shard-local.  The
collectives ride ICI; batch members stay independent (data parallelism on
the other mesh axis).

Layout contract: ``x`` is (batch, n) sharded P('data', 'seq'); outputs
keep the same sharding with the level axis replicated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..ops.fill import prev_index, next_index, take_last_axis
from ..utils.vma import vary
# the shared Knuth two-sum residual (single definition)
from ..ops.linear_baseline import two_sum_err as _two_sum_err

__all__ = ["make_mesh", "sharded_itd_sift", "sharded_cubic_baseline"]


def make_mesh(n_devices: int | None = None, seq: int | None = None) -> Mesh:
    """A (data, seq) mesh over the first ``n_devices`` devices."""
    devs = jax.devices() if n_devices is None else jax.devices()[:n_devices]
    n = len(devs)
    if seq is None:
        seq = 2 if n % 2 == 0 and n > 1 else 1
    return Mesh(np.asarray(devs).reshape(n // seq, seq), ("data", "seq"))


# ---------------------------------------------------------------------------
# shard-local helpers (run inside shard_map; `seq` is the time-shard axis)
# ---------------------------------------------------------------------------


def _shift_right(a, axis_name, fill):
    """a[i-1] with the left neighbor's last element crossing the boundary."""
    edge = lax.ppermute(a[..., -1], axis_name,
                        [(i, i + 1) for i in range(lax.axis_size(axis_name) - 1)])
    first = jnp.where(lax.axis_index(axis_name) == 0, fill, edge)
    return jnp.concatenate([first[..., None], a[..., :-1]], axis=-1)


def _shift_left(a, axis_name, fill):
    size = lax.axis_size(axis_name)
    edge = lax.ppermute(a[..., 0], axis_name,
                        [(i + 1, i) for i in range(size - 1)])
    last = jnp.where(lax.axis_index(axis_name) == size - 1, fill, edge)
    return jnp.concatenate([a[..., 1:], last[..., None]], axis=-1)


def _ffill(values: tuple, mask, axis_name, defaults: tuple):
    """Cross-shard forward fill of several channels under one mask.

    Each channel gets the value at the most recent masked sample; samples
    before the first masked sample anywhere get the channel default.  All
    channel summaries and the has-flag ride ONE stacked ``all_gather``
    (one collective per fill, not two per channel)."""
    idx = prev_index(mask)
    has_local = idx >= 0
    rank = lax.axis_index(axis_name)
    size = lax.axis_size(axis_name)
    sel = jnp.arange(size) < rank

    locs = [take_last_axis(v, idx) for v in values]
    dt = locs[0].dtype
    has = has_local[..., -1]
    stacked = jnp.stack(
        [loc[..., -1] for loc in locs] + [has.astype(dt)], axis=-1)
    allg = lax.all_gather(stacked, axis_name)          # (S, ..., k+1)
    all_has = allg[..., -1] != 0
    shape = [size] + [1] * (all_has.ndim - 1)
    pick = jnp.max(
        jnp.where(all_has & sel.reshape(shape),
                  jnp.arange(size).reshape(shape), -1),
        axis=0,
    )
    out = []
    for i, (loc, d) in enumerate(zip(locs, defaults)):
        prefix = jnp.take_along_axis(
            allg[..., i], jnp.maximum(pick, 0)[None], axis=0
        )[0]
        prefix = jnp.where(pick >= 0, prefix, d).astype(loc.dtype)
        out.append(jnp.where(has_local, loc, prefix[..., None]))
    return tuple(out)


def _bfill(values: tuple, mask, axis_name, defaults: tuple):
    idx = next_index(mask)
    n_loc = mask.shape[-1]
    has_local = idx < n_loc
    rank = lax.axis_index(axis_name)
    size = lax.axis_size(axis_name)
    sel = jnp.arange(size) > rank

    locs = [take_last_axis(v, idx) for v in values]
    dt = locs[0].dtype
    has = has_local[..., 0]
    stacked = jnp.stack(
        [loc[..., 0] for loc in locs] + [has.astype(dt)], axis=-1)
    allg = lax.all_gather(stacked, axis_name)
    all_has = allg[..., -1] != 0
    shape = [size] + [1] * (all_has.ndim - 1)
    pick = jnp.min(
        jnp.where(all_has & sel.reshape(shape),
                  jnp.arange(size).reshape(shape), size),
        axis=0,
    )
    out = []
    for i, (loc, d) in enumerate(zip(locs, defaults)):
        suffix = jnp.take_along_axis(
            allg[..., i], jnp.minimum(pick, size - 1)[None], axis=0
        )[0]
        suffix = jnp.where(pick < size, suffix, d).astype(loc.dtype)
        out.append(jnp.where(has_local, loc, suffix[..., None]))
    return tuple(out)


def _end_samples(x, axis_name):
    """(x[0], x[1]) and (x[-2], x[-1]) of the GLOBAL signal with one
    stacked ``all_gather`` (the two 2-sample gathers ride together)."""
    allg = lax.all_gather(
        jnp.concatenate([x[..., :2], x[..., -2:]], axis=-1), axis_name)
    return allg[0, ..., :2], allg[-1, ..., 2:]


def _end_samples_at(x, gpos, n_global, axis_name):
    """Global samples at positions (0, 1, n_global-2, n_global-1) by
    OWNERSHIP: each shard contributes its one-hot sum per position, one
    stacked psum.  Exactly one shard contributes a nonzero per slot, so
    the f32 sums are bitwise the owned values.  Unlike
    :func:`_end_samples` this stays correct when the global time axis is
    padded past ``n_global`` (any-length support: the true last samples
    sit mid-shard, not at the gathered edges)."""
    targets = jnp.asarray([0, 1, n_global - 2, n_global - 1], jnp.int32)
    hits = gpos[..., None] == targets  # (..., n_loc, 4)
    vals = jnp.sum(jnp.where(hits, x[..., None], 0.0), axis=-2)
    vals = lax.psum(vals, axis_name)
    return vals[..., :2], vals[..., 2:]


def _bits_f(i, dtype):
    """Integer positions as BIT PATTERNS of ``dtype`` so they can ride
    the (select-only) cross-shard fill helpers next to value channels of
    the same dtype — exact at any n (a float VALUE channel would round
    positions above the mantissa).  The width must MATCH the value
    channels: a mixed-dtype stack would promote the bits through a float
    conversion, and XLA backends flush subnormal f32 on convert (small
    integers bitcast to subnormals), zeroing positions.  Selects,
    gathers, and stacks of a uniform dtype never touch the bits."""
    if dtype == jnp.float64:
        return lax.bitcast_convert_type(i.astype(jnp.int64), jnp.float64)
    return lax.bitcast_convert_type(i.astype(jnp.int32), jnp.float32)


def _bits_i(f):
    if f.dtype == jnp.float64:
        return lax.bitcast_convert_type(f, jnp.int64).astype(jnp.int32)
    return lax.bitcast_convert_type(f, jnp.int32)


def _level(x, axis_name, n_global, endpoint_mode):
    """One sharded linear-baseline level; returns (rotation, baseline, nex)."""
    dtype = x.dtype
    n_loc = x.shape[-1]
    rank = lax.axis_index(axis_name)
    gpos = (rank * n_loc + lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1))

    big = jnp.asarray(jnp.inf, dtype)
    x_m1 = _shift_right(x, axis_name, big)   # x[i-1]; +inf kills i=0
    x_p1 = _shift_left(x, axis_name, big)    # x[i+1]
    dxb = jnp.where(jnp.isnan(x - x_m1), jnp.inf, x - x_m1)
    dxf = jnp.where(jnp.isnan(x_p1 - x), jnp.inf, x_p1 - x)
    interior = (gpos > 0) & (gpos < n_global - 1)
    # NaN quarantine (ops.extrema.extrema_masks contract): samples within
    # +-1 of a NaN are never extrema; the halo fill value is +inf, never
    # NaN, so shard edges need no special case
    near_nan = jnp.isnan(x) | jnp.isnan(x_m1) | jnp.isnan(x_p1)
    is_min = (dxb <= 0) & (dxf > 0) & interior & ~near_nan
    is_max = (dxb >= 0) & (dxf < 0) & interior & ~near_nan
    mask = is_min | is_max
    nex = lax.psum(jnp.sum(mask, axis=-1).astype(jnp.int32), axis_name)

    knots = mask | (gpos == 0) | (gpos == n_global - 1)

    # exclusive neighbors of each knot: fills over shifted (pos, x).
    # Positions ride the fills as i32 BIT PATTERNS in f32 channels
    # (_bits_f): the fill helpers only select, never do arithmetic, so
    # the integers come back exact at ANY n — storing them as f32 VALUES
    # would round above 2^24 and corrupt the knot weights.
    km1 = _shift_right(knots, axis_name, jnp.asarray(False))
    # shifted POSITIONS are arithmetic, not communication: the neighbor's
    # last global position is gpos - 1 by construction (fill at gpos 0)
    pos_m1 = jnp.where(gpos == 0, 0, gpos - 1)
    xv_m1 = _shift_right(x, axis_name, jnp.zeros((), dtype))
    zbits = _bits_f(jnp.zeros((), jnp.int32), dtype)
    prev_bits, prev_x = _ffill(
        (_bits_f(pos_m1, dtype), xv_m1.astype(dtype)), km1, axis_name,
        (zbits, jnp.zeros((), dtype)))
    kp1 = _shift_left(knots, axis_name, jnp.asarray(False))
    pos_p1 = jnp.where(gpos == n_global - 1, 0, gpos + 1)
    xv_p1 = _shift_left(x, axis_name, jnp.zeros((), dtype))
    next_bits, next_x = _bfill(
        (_bits_f(pos_p1, dtype), xv_p1.astype(dtype)), kp1, axis_name,
        (zbits, jnp.zeros((), dtype)))
    prev_pos_i = _bits_i(prev_bits)
    next_pos_i = _bits_i(next_bits)

    # integer differences FIRST (exact at any n), one cast each
    span = (next_pos_i - prev_pos_i).astype(dtype)
    w = (gpos - prev_pos_i).astype(dtype) / jnp.where(
        span == 0, jnp.ones_like(span), span)
    knot_val = 0.5 * (prev_x + w * (next_x - prev_x)) + 0.5 * x

    # end-knot values need x[0], x[1], x[n-2], x[n-1] (global), located
    # by ownership (any-length-safe: with a padded time axis the true
    # last samples sit mid-shard)
    first2, last2 = _end_samples_at(x, gpos, n_global, axis_name)
    b_first = 0.5 * (first2[..., 0] + first2[..., 1])
    b_last = 0.5 * (last2[..., 0] + last2[..., 1])
    knot_val = jnp.where(gpos == 0, b_first[..., None], knot_val)
    knot_val = jnp.where(gpos == n_global - 1, b_last[..., None], knot_val)

    b_l, x_l = _ffill((knot_val, x), knots, axis_name,
                      (jnp.zeros((), dtype), jnp.zeros((), dtype)))
    b_r, x_r = _bfill((knot_val, x), knots, axis_name,
                      (jnp.zeros((), dtype), jnp.zeros((), dtype)))
    # right knot must be *strictly* after: shift the backward fill left by one
    b_r = _shift_left(b_r, axis_name, jnp.zeros((), dtype))
    x_r = _shift_left(x_r, axis_name, jnp.zeros((), dtype))

    den = x_r - x_l
    slope = jnp.where(den == 0, 0.0, (b_r - b_l) / jnp.where(den == 0, 1.0, den))
    baseline = b_l + slope * (x - x_l)
    if endpoint_mode == "reference":
        baseline = jnp.where(gpos == n_global - 1, 0.0, baseline)
    return x - baseline, baseline, nex


# Initial loop carries / freshly created constants must carry the vma
# their updates will have (fori_loop needs carry-in == carry-out), and
# elementwise ops under ``check_vma`` require operands with equal vma.
_vary = vary



def _sift_local(x, axis_name, n_global, max_iteration, endpoint_mode):
    levels = max_iteration + 2
    rotation, baseline, _ = _level(x, axis_name, n_global, endpoint_mode)
    # pending_err/comp: the compensated-reconstruction channel, same
    # telescoping two-sum accumulation as decomp/itd.py's XLA body
    pending_err = _two_sum_err(x, -baseline, rotation)

    both = ("data", axis_name)
    out = _vary(jnp.zeros((levels,) + x.shape, x.dtype), both)
    batch = x.shape[:-1]
    done = _vary(jnp.zeros(batch, bool), ("data",))
    reason = _vary(jnp.zeros(batch, jnp.int32), ("data",))
    ncomp = _vary(jnp.zeros(batch, jnp.int32), ("data",))
    prev_base = _vary(jnp.zeros_like(x), both)
    comp = _vary(jnp.zeros_like(x), both)

    def body(i, carry):
        (rotation, baseline, prev_base, out, done, reason, ncomp,
         pending_err, comp) = carry
        new_rot, new_base, nex = _level(baseline, axis_name, n_global, endpoint_mode)
        stop_a = (~done) & (nex < 2)
        # PLATFORM-WA(strict-gt): >= form, see docs/PLATFORM.md
        stop_b = (~done) & (~stop_a) & (i >= max_iteration + 1)
        cont = (~done) & (~stop_a) & (~stop_b)
        stopping = stop_a | stop_b
        res_sum = rotation + baseline
        residual = jnp.where(stop_a[..., None], prev_base, res_sum)
        row = jnp.where(stopping[..., None], residual,
                        jnp.where(cont[..., None], rotation, 0.0))
        out = out.at[i].set(row)
        # compensation: pending subtraction error enters when the rotation
        # is emitted (cont) or folded into the stop-B residual (which
        # rounds once more); stop A discards the pending extraction
        res_err = _two_sum_err(rotation, baseline, res_sum)
        emit = (cont | stop_b)[..., None]
        comp = comp + jnp.where(emit, pending_err, 0.0) + jnp.where(
            stop_b[..., None], res_err, 0.0
        )
        # unconditional carry updates: stopped elements' carries are never
        # read again (see decomp/itd.py body for the argument)
        rotation = new_rot
        pending_err = _two_sum_err(baseline, -new_base, new_rot)
        prev_base = baseline
        baseline = new_base
        ncomp = jnp.where(stopping, i + 1, ncomp)
        reason = jnp.where(stop_a, 1, jnp.where(stop_b, 2, reason))
        done = done | stopping
        return (rotation, baseline, prev_base, out, done, reason, ncomp,
                pending_err, comp)

    carry = (rotation, baseline, prev_base, out, done, reason, ncomp,
             pending_err, comp)
    carry = lax.fori_loop(0, levels, body, carry)
    out, done, reason, ncomp, comp = (
        carry[3], carry[4], carry[5], carry[6], carry[8]
    )
    return out, ncomp, reason, comp


# ---------------------------------------------------------------------------
# Pallas-backed sequence-parallel sift: each trip runs the single-chip fused
# fill/emit kernels shard-locally; the only cross-shard traffic per trip is
# 2 halo ppermutes, ONE all_gather of the stacked 8-scalar-per-row knot
# summaries (both fill carry interfaces), and ONE stacked psum (mark count
# + end knots) — O(shards), like the SPIKE cubic's 6-scalar interface
# (ops/chained_pcr.py)
# ---------------------------------------------------------------------------


def _shard_halos(flat, axis_name, rank, size, both):
    """1-sample halo exchange: (left neighbor's last, right neighbor's
    first) samples; the global edges use the shard's own edge sample,
    matching the single-chip kernels' self-neighbor convention."""
    edge_l = lax.ppermute(flat[:, -1], axis_name,
                          [(i, i + 1) for i in range(size - 1)])
    halo_l = jnp.where(_vary(rank == 0, both), flat[:, 0], edge_l)
    edge_r = lax.ppermute(flat[:, 0], axis_name,
                          [(i + 1, i) for i in range(size - 1)])
    halo_r = jnp.where(_vary(rank == size - 1, both), flat[:, -1], edge_r)
    return halo_l, halo_r


def _fold_states_both(tot_f, tot_r, rank, size, axis_name, both):
    """Cross-shard exclusive fill-state prefix (from the forward shard
    totals) and suffix (from the reverse ones) with ONE ``all_gather``:
    the 8 scalars per row ride together (an all_gather per channel per
    direction is 8 latency-bound collectives per trip on real ICI), then
    the fill2 combine folds the shards strictly before (after) this one,
    nearest shard last so its knots win.  Returns two (rows, 4) states."""
    from ..ops.pallas_fill import _combine

    stacked = jnp.stack(tuple(tot_f) + tuple(tot_r), axis=-1)  # (rows, 8)
    gathered = _vary(lax.all_gather(stacked, axis_name), both)
    rows = stacked.shape[0]
    none = jnp.full((rows,), -1.0, jnp.float32)
    zero = jnp.zeros((rows,), jnp.float32)

    def fold(col0, reverse):
        acc = tuple(_vary(a, both) for a in (none, zero, none, zero))
        order = range(size) if not reverse else range(size - 1, -1, -1)
        for s in order:
            st = tuple(gathered[s, :, col0 + i] for i in range(4))
            new = _combine(acc, st)
            use = _vary(rank > s if not reverse else rank < s, both)
            acc = tuple(jnp.where(use, n, a) for n, a in zip(new, acc))
        return jnp.stack(acc, axis=-1)  # (rows, 4)

    return fold(0, reverse=False), fold(4, reverse=True)


def _block_edges(base3, nblk):
    """Per-block edge-neighbor scalars from a padded 3-D baseline (the
    shared ``pallas_fill.block_edge_scalars`` convention)."""
    from ..ops.pallas_fill import block_edge_scalars

    return block_edge_scalars(base3, nblk)


def _sift_local_pallas(x, axis_name, n_global, max_iteration, endpoint_mode,
                       interpret, fold_emit=None):
    """Sequence-parallel sift trip loop on the fused Pallas level kernel.

    Same loop semantics as ``_sift_local`` / ``decomp.itd._itd_sift_fused``;
    big arrays stay in the kernel's padded 3-D layout across trips and the
    output row is written in place (aliased 4-D output, dynamic level
    index).  Per trip: one XLA mask/summary pass (which also yields the
    extrema count and the per-block fill-state folds, seeded with the
    cross-shard states), then ONE block-parallel kernel.

    ``fold_emit`` (default: the ``PYITD_FOLD_EMIT`` env flag, shared with
    the single-chip lever) sources each trip's per-block fill-state folds
    + mark count from the PREVIOUS trip's kernel instead of the 9-channel
    full-shard XLA reduce; the kernel excludes each block's first sample
    and the shard's last sample (their masks need values the reverse walk
    / this trip hasn't produced), which ``states_from_folds`` resolves
    from halos and strided slices.  Bit-identical outputs, pinned in
    tests; opt-in until the on-chip A/B records a win."""
    import os as _os

    from ..ops.pallas_fill import (
        BLK, _combine, _pad_edges, _top2_comp, block_fill_summaries_cnt)
    from ..ops.pallas_fill_sharded import sharded_sift_level_fused

    if fold_emit is None:
        fold_emit = bool(_os.environ.get("PYITD_FOLD_EMIT"))
    levels = max_iteration + 2
    batch_shape = x.shape[:-1]
    n_loc = x.shape[-1]
    x2 = x.reshape(-1, n_loc).astype(jnp.float32)
    rows = x2.shape[0]
    rank = lax.axis_index(axis_name)
    size = lax.axis_size(axis_name)
    both = ("data", axis_name)
    off = _vary((rank * n_loc).astype(jnp.int32).reshape(1), both)

    x3, pe, ne, npad, nblk = _pad_edges(x2)
    x3 = _vary(x3, both)

    nblk_ = npad // BLK
    sentinel = _vary(
        jnp.tile(jnp.asarray([-1.0, 0.0, -1.0, 0.0], jnp.float32),
                 (rows, 1)), both)

    def block_states(flat_pad, halo_l, halo_r):
        """Sharded twin of ``pallas_fill.level_block_states_fwd``: knot
        mask over the padded flat shard (halo-patched, global positions —
        formula-identical to ``_knot_state_sharded``), the shard's
        extrema-mark count, forward per-block summaries + local exclusive
        folds, and the shard-total states for BOTH directions (the
        cross-shard interface; the reverse one seeds the reverse-walking
        kernel's SMEM carry)."""
        it = lax.broadcasted_iota(jnp.int32, flat_pad.shape, 1)
        gposf = _vary(it.astype(jnp.float32), both) + off[0].astype(
            jnp.float32)
        xm1 = jnp.concatenate([flat_pad[:, :1], flat_pad[:, :-1]], axis=-1)
        xm1 = jnp.where(it == 0, halo_l[:, None], xm1)
        xp1 = jnp.concatenate([flat_pad[:, 1:], flat_pad[:, -1:]], axis=-1)
        xp1 = jnp.where(it == n_loc - 1, halo_r[:, None], xp1)
        dxb = jnp.where(jnp.isnan(flat_pad - xm1), jnp.inf, flat_pad - xm1)
        dxf = jnp.where(jnp.isnan(xp1 - flat_pad), jnp.inf, xp1 - flat_pad)
        near_nan = (jnp.isnan(flat_pad) | jnp.isnan(xm1) | jnp.isnan(xp1))
        gpos = it + off[0]
        valid = it < n_loc
        interior = (gpos > 0) & (gpos < n_global - 1) & valid
        m = ((((dxb <= 0) & (dxf > 0)) | ((dxb >= 0) & (dxf < 0)))
             & interior & ~near_nan) | (
            valid & ((gpos == 0) | (gpos == n_global - 1)))
        mb = m.reshape(rows, nblk_, BLK)
        xb = flat_pad.reshape(rows, nblk_, BLK)
        pf = gposf.reshape(rows, nblk_, BLK)

        # ONE 9-channel input pass (the single-chip
        # ``level_block_states_fwd`` scheme + the reverse channels the
        # cross-shard interface needs): per-block forward last-two,
        # per-block reverse first-two, per-block mark counts.
        fwd_sum, rev_blk, cnt = block_fill_summaries_cnt(
            mb, pf, xb, n_global + npad + 1)
        return _finish_states(fwd_sum, rev_blk, cnt)

    def _finish_states(fwd_sum, rev_blk, cnt):
        """Shared tail: exclusive forward folds, shard totals for both
        directions, and the mark count, from per-block states."""
        marks = jnp.sum(cnt, axis=-1).astype(jnp.int32)

        inc = lax.associative_scan(_combine, fwd_sum, axis=1)
        exc_f = tuple(
            jnp.concatenate(
                [jnp.full_like(s[:, :1], -1.0 if i % 2 == 0 else 0.0),
                 s[:, :-1]], axis=1)
            for i, s in enumerate(inc)
        )
        tot_f = tuple(s[:, -1] for s in inc)

        # the reverse direction needs no per-block folds — the kernel
        # walks blocks in reverse and chains the suffix through its SMEM
        # carry; only the SHARD-total "first two knots" state is needed
        # (the cross-shard interface).  Fold the per-block first-two
        # states across blocks (top-2 merge is order-exact, so this is
        # bitwise the whole-shard reduce) and decode empties to -1.
        bigf = jnp.float32(n_global + npad + 1)
        zero = jnp.float32(0)
        tr = lax.reduce(rev_blk, (bigf, zero, bigf, zero),
                        _top2_comp(-1), (1,))
        tot_r = (jnp.where(tr[0] >= bigf, -1.0, tr[0]),
                 jnp.where(tr[0] >= bigf, zero, tr[1]),
                 jnp.where(tr[2] >= bigf, -1.0, tr[2]),
                 jnp.where(tr[2] >= bigf, zero, tr[3]))
        return marks, (exc_f, tot_f), tot_r

    def states_from_folds(fold_raw, flat_pad, halo_l, halo_r):
        """``block_states`` from the previous kernel's partial folds
        (``fold_emit``): resolve each block's first sample (neighbors:
        halo_l / the previous block's last sample, and the block's second
        sample) and the shard's last real sample (neighbors: its
        predecessor and halo_r), fold them into the partials in position
        order, then run the shared tail.  Bitwise ``block_states`` —
        positions are unique and values are selected, never combined."""
        f = fold_raw.reshape(rows, nblk_, 8, 128)
        ch = [f[:, :, 0, k] for k in range(9)]
        big = jnp.float32(n_global + npad + 1)

        b0 = flat_pad[:, ::BLK]
        b1 = flat_pad[:, 1::BLK]
        bm1 = jnp.concatenate(
            [halo_l[:, None], flat_pad[:, BLK - 1 : npad - 1 : BLK]],
            axis=-1)
        lpos0 = np.arange(nblk_) * BLK
        last_is_block_first = (n_loc - 1) % BLK == 0
        bL = (n_loc - 1) // BLK
        if last_is_block_first:
            # the shard-last sample IS block bL's first: its next
            # neighbor is the next shard's first sample, not padding
            b1 = b1.at[:, bL].set(halo_r)
        gpos0 = off[0].astype(jnp.float32) + jnp.asarray(
            lpos0, jnp.float32)[None, :]
        dxb = jnp.where(jnp.isnan(b0 - bm1), jnp.inf, b0 - bm1)
        dxf = jnp.where(jnp.isnan(b1 - b0), jnp.inf, b1 - b0)
        near = jnp.isnan(b0) | jnp.isnan(bm1) | jnp.isnan(b1)
        interior = (gpos0 > 0) & (gpos0 < n_global - 1)
        m0 = ((((dxb <= 0) & (dxf > 0)) | ((dxb >= 0) & (dxf < 0)))
              & interior & ~near) | (gpos0 == 0) | (gpos0 == n_global - 1)
        fwd_sum = _combine(
            (jnp.where(m0, gpos0, -1.0), jnp.where(m0, b0, 0.0),
             jnp.full_like(b0, -1.0), jnp.zeros_like(b0)),
            tuple(ch[:4]))
        rev_blk = _top2_comp(-1)(
            (jnp.where(m0, gpos0, big), jnp.where(m0, b0, 0.0),
             jnp.full_like(b0, big), jnp.zeros_like(b0)),
            tuple(ch[4:8]))
        cnt = ch[8] + m0.astype(jnp.float32)

        if not last_is_block_first:
            vl = flat_pad[:, n_loc - 1]
            vlm1 = flat_pad[:, n_loc - 2]
            gl = off[0].astype(jnp.float32) + jnp.float32(n_loc - 1)
            dxbL = jnp.where(jnp.isnan(vl - vlm1), jnp.inf, vl - vlm1)
            dxfL = jnp.where(jnp.isnan(halo_r - vl), jnp.inf, halo_r - vl)
            nearL = jnp.isnan(vl) | jnp.isnan(vlm1) | jnp.isnan(halo_r)
            interiorL = (gl > 0) & (gl < n_global - 1)
            mL = ((((dxbL <= 0) & (dxfL > 0)) | ((dxbL >= 0) & (dxfL < 0)))
                  & interiorL & ~nearL) | (gl == 0) | (gl == n_global - 1)
            # fold the last sample into block bL in position order: it has
            # the largest position of the block (forward: appended; the
            # reverse top-2 merge is order-insensitive)
            updF = _combine(
                tuple(c[:, bL] for c in fwd_sum),
                (jnp.where(mL, gl, -1.0), jnp.where(mL, vl, 0.0),
                 jnp.full_like(vl, -1.0), jnp.zeros_like(vl)))
            fwd_sum = tuple(
                c.at[:, bL].set(u) for c, u in zip(fwd_sum, updF))
            updR = _top2_comp(-1)(
                tuple(c[:, bL] for c in rev_blk),
                (jnp.where(mL, gl, big), jnp.where(mL, vl, 0.0),
                 jnp.full_like(vl, big), jnp.zeros_like(vl)))
            rev_blk = tuple(
                c.at[:, bL].set(u) for c, u in zip(rev_blk, updR))
            cnt = cnt.at[:, bL].add(mL.astype(jnp.float32))

        return _finish_states(fwd_sum, rev_blk, cnt)

    def seed(exc, shard_state):
        """Combine the cross-shard state into every block's local fold
        (it is farther than anything local, so local marks win)."""
        seeded = _combine(
            tuple(shard_state[:, i : i + 1] for i in range(4)), exc)
        return jnp.stack(seeded, axis=-1).reshape(rows, nblk_ * 4)

    def level(base3, pe, ne, rot3, pbase3, perr3, comp3,
              out_rot, static_i, done, over_budget, donate_input=False,
              fold_raw=None):
        """One trip: XLA mask/summary pass (extrema count, block folds,
        shard interface states), cross-shard fold, stop flags, then ONE
        fused kernel.  Cross-shard traffic: 2 halo ppermutes, 1 stacked
        all_gather (both fold directions), 1 stacked psum (mark count +
        the two global end-knot values).  ``fold_raw`` (fold_emit mode):
        the previous trip's in-kernel partial folds, resolved instead of
        the full-shard summary pass."""
        flat_pad = base3.reshape(rows, npad)
        halo_l, halo_r = _shard_halos(flat_pad[:, :n_loc], axis_name,
                                      rank, size, both)
        if fold_raw is not None:
            marks, (exc_f, tot_f), tot_r = states_from_folds(
                fold_raw, flat_pad, halo_l, halo_r)
        else:
            marks, (exc_f, tot_f), tot_r = block_states(
                flat_pad, halo_l, halo_r)
        if size > 1:
            shard_prefix, shard_suffix = _fold_states_both(
                tot_f, tot_r, rank, size, axis_name, both)
        else:
            shard_prefix = shard_suffix = sentinel
        fp = seed(exc_f, shard_prefix)
        rs = shard_suffix  # (rows, 4): seeds the kernel's SMEM carry
        # one psum for the trip's three scalars-per-row: the mark count
        # (integer-valued f32, exact far beyond any signal length here;
        # the single-chip pass counts in f32 the same way) and the global
        # end-knot values, located by OWNERSHIP of global positions
        # (0, 1) / (n_global-2, n_global-1) — any-length-safe: with a
        # padded time axis the true last samples sit mid-shard.  Only
        # owning shards contribute; the rest add exact zeros, so the f32
        # sum is bitwise the owner's value.  When one shard owns both
        # samples (the common case) it contributes 0.5*(a+b) in the
        # single-chip kernels' exact arithmetic order.
        def owned_pair(g0, g1):
            s0, l0 = divmod(g0, n_loc)
            s1, l1 = divmod(g1, n_loc)
            if s0 == s1:
                return jnp.where(
                    _vary(rank == s0, both),
                    0.5 * (flat_pad[:, l0] + flat_pad[:, l1]), 0.0)
            return (jnp.where(_vary(rank == s0, both),
                              0.5 * flat_pad[:, l0], 0.0)
                    + jnp.where(_vary(rank == s1, both),
                                0.5 * flat_pad[:, l1], 0.0))

        bf_loc = owned_pair(0, 1)
        bl_loc = owned_pair(n_global - 2, n_global - 1)
        tot = lax.psum(
            jnp.stack([marks.astype(jnp.float32), bf_loc, bl_loc], axis=-1),
            axis_name)
        nex = tot[:, 0].astype(jnp.int32) - 2
        bf = _vary(tot[:, 1], both)
        bl = _vary(tot[:, 2], both)
        stop_a = (~done) & (nex < 2)
        stop_b = (~done) & (~stop_a) & over_budget
        cont = (~done) & (~stop_a) & (~stop_b)
        outs = sharded_sift_level_fused(
            base3, pe, ne, off, halo_l, halo_r, fp, rs, bf, bl,
            _vary(stop_a, both), _vary(stop_b, both), _vary(cont, both),
            rot3, pbase3, perr3, comp3, n_loc, n_global,
            endpoint_mode=endpoint_mode, interpret=interpret,
            out_levels=out_rot, level_idx=static_i,
            donate_input=donate_input, fold_emit=fold_emit)
        return outs, (stop_a, stop_b)

    # initial extraction: flags all false -> row/compensation outputs inert
    zero3 = _vary(jnp.zeros_like(x3), both)
    tdone = _vary(jnp.ones((rows,), bool), ("data",))
    (base3, rot3, perr3, _row, _c, *fold_raw), _ = level(
        x3, pe, ne, zero3, zero3, zero3, zero3, None, None,
        tdone, jnp.asarray(False), donate_input=True)  # x3 dies here

    out_rot = _vary(jnp.zeros((levels,) + x3.shape, jnp.float32), both)
    done = _vary(jnp.zeros((rows,), bool), ("data",))
    reason = _vary(jnp.zeros((rows,), jnp.int32), ("data",))
    ncomp = _vary(jnp.zeros((rows,), jnp.int32), ("data",))
    prev_base3 = zero3
    comp3 = zero3

    for i in range(levels):
        pe, ne = _block_edges(base3, nblk)
        over = jnp.broadcast_to(jnp.asarray(i >= max_iteration + 1),
                                done.shape)
        ((new_base, new_rot, new_err, out_rot, comp3, *fold_raw),
         (stop_a, stop_b)) = \
            level(base3, pe, ne, rot3, prev_base3, perr3, comp3,
                  out_rot, i, done, over,
                  fold_raw=fold_raw[0] if fold_emit else None)
        stopping = stop_a | stop_b
        ncomp = jnp.where(stopping, i + 1, ncomp)
        reason = jnp.where(stop_a, 1, jnp.where(stop_b, 2, reason))
        done = done | stopping
        rot3, prev_base3, base3, perr3 = new_rot, base3, new_base, new_err

    def crop(a, lead):
        return a.reshape((lead, rows, npad))[..., :n_loc]

    out = crop(out_rot, levels).reshape((levels,) + batch_shape + (n_loc,))
    correction = crop(comp3[None], 1)[0].reshape(batch_shape + (n_loc,))
    return (out.astype(x.dtype), ncomp.reshape(batch_shape),
            reason.reshape(batch_shape), correction.astype(x.dtype))


def sharded_itd_sift(x, mesh: Mesh, max_iteration: int = 11, *,
                     endpoint_mode: str = "reference", backend: str = "auto"):
    """Batched canonical sift with (data, seq) sharding.

    ``x``: (batch, n) of ANY length n; the 'data' axis size must divide
    batch.  When the 'seq' axis size does not divide n, the time axis is
    edge-padded up to the next multiple (outputs are cropped back; pad
    samples are excluded from extrema/knots by global-position masks, so
    results are identical to the unpadded single-chip sift).
    Returns ``(rotations[levels, batch, n], num_components, stop_reason,
    correction)`` with the same input sharding on the trailing axes;
    ``correction`` is the compensated-reconstruction channel
    (``decomp.itd.SiftResult.correction`` semantics).

    ``backend``: "auto" picks the shard-local Pallas fill/emit kernels on
    TPU for f32 inputs (cross-shard fill state rides as 4 scalars per row
    per direction — see ``ops/pallas_fill_sharded.py``) and the portable
    XLA fills elsewhere; "xla" / "pallas" force one ("pallas" off-TPU runs
    the kernels in interpret mode, for parity tests).

    f32 knot-position ceiling: the Pallas kernels carry global positions
    in f32 channels (exact to 2^24).  Above that, "auto" falls back to
    the XLA fills — which carry positions as i32 bit patterns and are
    exact at any n — and an explicit ``backend="pallas"`` raises.
    """
    n_global = x.shape[-1]
    seq = mesh.shape["seq"]
    over_ceiling = x.dtype == jnp.float32 and n_global > (1 << 24)
    if backend == "auto":
        use_pallas = (jax.default_backend() == "tpu"
                      and x.dtype == jnp.float32 and not over_ceiling)
    elif backend in ("xla", "pallas"):
        use_pallas = backend == "pallas"
        if use_pallas and over_ceiling:
            raise ValueError(
                f"n={n_global} exceeds the f32 knot-position ceiling "
                f"(2^24={1 << 24}) of the sharded Pallas kernels' position "
                "channels; use backend='xla' (exact i32 positions) or "
                "backend='auto'."
            )
    else:
        raise ValueError(f"unknown backend: {backend!r}")

    pad = (-n_global) % seq
    if pad:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (pad,))],
            axis=-1)
    # any batch size: the 'data' axis pads with zero rows (they sift to
    # zeros independently; rows never interact) and outputs are cropped
    data = mesh.shape["data"]
    batch = x.shape[0]
    bpad = (-batch) % data
    if bpad:
        x = jnp.concatenate(
            [x, jnp.zeros((bpad,) + x.shape[1:], x.dtype)], axis=0)
    out_specs = (P(None, "data", "seq"), P("data"), P("data"),
                 P("data", "seq"))

    def smap(local, **extra):
        return shard_map(local, mesh=mesh, in_specs=P("data", "seq"),
                         out_specs=out_specs, **extra)

    fn_xla = smap(partial(_sift_local, axis_name="seq", n_global=n_global,
                          max_iteration=max_iteration,
                          endpoint_mode=endpoint_mode))
    if use_pallas:
        interpret = jax.default_backend() != "tpu"
        extra = {}
        if interpret:
            # PLATFORM-WA(interpret-vma): the Pallas HLO interpreter cannot
            # thread vma through its internal loops; compiled TPU runs keep
            # full vma checking (docs/PLATFORM.md)
            extra["check_vma"] = False
        fn_pallas = smap(partial(
            _sift_local_pallas, axis_name="seq", n_global=n_global,
            max_iteration=max_iteration, endpoint_mode=endpoint_mode,
            interpret=interpret), **extra)

        # the shard-local Pallas kernels have no AD rules; jax.grad
        # through them would crash like the single-chip and cubic tiers
        # did (VERDICT r4 item 3) — the custom VJP recomputes the
        # backward through the differentiable XLA sharded fills (whose
        # collectives all transpose), keeping the sharded sift
        # first-class under AD on every backend
        @jax.custom_vjp
        def run(xx):
            return fn_pallas(xx)

        def fwd(xx):
            return run(xx), xx

        def bwd(xx, ct):
            g_rot, _g_ncomp, _g_reason, g_corr = ct

            def z(g, shape):
                if g is None or getattr(g, "dtype", None) == jax.dtypes.float0:
                    return jnp.zeros(shape, xx.dtype)
                return g

            def f(xi):
                r = fn_xla(xi)
                return r[0], r[3]

            levels = max_iteration + 2
            _, pull = jax.vjp(f, xx)
            return (pull((z(g_rot, (levels,) + xx.shape),
                          z(g_corr, xx.shape)))[0],)

        run.defvjp(fwd, bwd)
        fn = run
    else:
        fn = fn_xla
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
    rot, ncomp, reason, corr = jax.jit(fn)(xs)
    if pad:
        rot = rot[..., :n_global]
        corr = corr[..., :n_global]
    if bpad:
        rot, corr = rot[:, :batch], corr[:batch]
        ncomp, reason = ncomp[:batch], reason[:batch]
    return rot, ncomp, reason, corr


# ---------------------------------------------------------------------------
# sequence-parallel cubic tier: knots are sparse, so each shard contributes
# its compacted knot buffer via one all_gather, every shard solves the
# (small) replicated not-a-knot system, and evaluation stays local
# (SURVEY.md §7 hard part (e): the pragmatic distributed-tridiagonal route)
# ---------------------------------------------------------------------------


def _cubic_local(x, axis_name, n_global, cap, min_extrema):
    from ..ops.tridiag import spline_moments
    from ..ops.cubic_baseline import eval_moment_spline
    from ..ops.extrema import compact_indices

    dtype = x.dtype
    n_loc = x.shape[-1]
    rank = lax.axis_index(axis_name)
    size = lax.axis_size(axis_name)
    gpos = rank * n_loc + lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)

    big = jnp.asarray(jnp.inf, dtype)
    x_m1 = _shift_right(x, axis_name, big)
    x_p1 = _shift_left(x, axis_name, big)
    dxb = jnp.where(jnp.isnan(x - x_m1), jnp.inf, x - x_m1)
    dxf = jnp.where(jnp.isnan(x_p1 - x), jnp.inf, x_p1 - x)
    interior = (gpos > 0) & (gpos < n_global - 1)
    # NaN quarantine, per ops.extrema.extrema_masks (halo fill is +inf)
    near_nan = jnp.isnan(x) | jnp.isnan(x_m1) | jnp.isnan(x_p1)
    mask = ((((dxb <= 0) & (dxf > 0)) | ((dxb >= 0) & (dxf < 0)))
            & interior & ~near_nan)
    nex = lax.psum(jnp.sum(mask, axis=-1).astype(jnp.int32), axis_name)

    knots = mask | (gpos == 0) | (gpos == n_global - 1)
    pos_loc, cnt_loc = compact_indices(knots, cap)  # local indices, padded n_loc-1
    k_loc = lax.broadcasted_iota(jnp.int32, pos_loc.shape, pos_loc.ndim - 1)
    valid_loc = k_loc < cnt_loc[..., None]
    gpos_knots = jnp.where(valid_loc, pos_loc + rank * n_loc, n_global)
    vals_knots = jnp.where(
        valid_loc,
        jnp.take_along_axis(x, jnp.clip(pos_loc, 0, n_loc - 1), axis=-1),
        jnp.zeros_like(x[..., :1]),
    )

    # replicate all shards' knots: (S, ..., cap) -> merged (..., S*cap)
    allp = lax.all_gather(gpos_knots, axis_name)
    allv = lax.all_gather(vals_knots, axis_name)
    allp = jnp.moveaxis(allp, 0, -2).reshape(x.shape[:-1] + (size * cap,))
    allv = jnp.moveaxis(allv, 0, -2).reshape(x.shape[:-1] + (size * cap,))
    # squeeze out padding: shard-ordered positions stay sorted under a
    # stable sort of (position, padding-at-end)
    order = jnp.argsort(allp, axis=-1, stable=True)
    allp = jnp.take_along_axis(allp, order, axis=-1)
    allv = jnp.take_along_axis(allv, order, axis=-1)
    total = lax.psum(jnp.sum(valid_loc, axis=-1).astype(jnp.int32), axis_name)

    kk = lax.broadcasted_iota(jnp.int32, allp.shape, allp.ndim - 1)
    cnt = total[..., None]

    # knot values: odd-reflect ends + Frei-Osorio interior (MEITD tier);
    # end samples by ownership of global positions (pad-safe)
    first2, last2 = _end_samples_at(x, gpos, n_global, axis_name)
    b_first = 0.5 * (3.0 * first2[..., 0] - first2[..., 1])
    b_last = 0.5 * (3.0 * last2[..., -1] - last2[..., -2])

    e_prev = jnp.concatenate([jnp.zeros_like(allp[..., :1]), allp[..., :-1]], axis=-1)
    e_next = jnp.concatenate([allp[..., 1:], jnp.zeros_like(allp[..., :1])], axis=-1)
    v_prev = jnp.concatenate([jnp.zeros_like(allv[..., :1]), allv[..., :-1]], axis=-1)
    v_next = jnp.concatenate([allv[..., 1:], jnp.zeros_like(allv[..., :1])], axis=-1)
    # integer position differences FIRST (exact at any n), one cast each
    span = (e_next - e_prev).astype(dtype)
    w = (allp - e_prev).astype(dtype) / jnp.where(span == 0, jnp.ones_like(span), span)
    kv = 0.5 * (v_prev + w * (v_next - v_prev)) + 0.5 * allv
    kv = jnp.where(kk == 0, b_first[..., None], kv)
    kv = jnp.where(kk == cnt - 1, b_last[..., None], kv)
    kv = jnp.where(kk >= cnt, jnp.zeros_like(kv), kv)

    moments = spline_moments(allp, kv, total, bc="not-a-knot")  # int pos
    h = (e_next - allp).astype(dtype)
    h = jnp.where(kk < cnt - 1, h, jnp.ones_like(h))

    # Gather-free evaluation (same shape as ops.cubic_baseline's
    # eval_moment_spline_scan, with the fills cross-shard): scatter each
    # knot's channels onto its owning shard's local grid, forward-fill the
    # j-side channels from knots 0..count-2, backward-fill the (j+1)-side
    # channels strictly-after from knots 1..count-1, patch the global final
    # sample (no strictly-after knot) with the last knot's channels.
    from ..ops.cubic_baseline import _scatter_channels

    loc = allp - rank * n_loc
    in_shard = (loc >= 0) & (loc < n_loc)
    valid_j = (kk < cnt - 1) & in_shard
    valid_n = (kk >= 1) & (kk < cnt) & in_shard
    # positions ride the fills as dtype-matched BIT PATTERNS (exact at
    # any n; a float VALUE channel would round above the mantissa)
    pos_bits = _bits_f(allp, dtype)

    pj_g, kj_g, mj_g, hj_g, occj = _scatter_channels(
        x, loc, valid_j, (pos_bits, kv, moments, h, jnp.ones_like(kv))
    )
    kn_g, mn_g, occn = _scatter_channels(
        x, loc, valid_n, (kv, moments, jnp.ones_like(kv))
    )

    pos_bits_j, k_j, m_j, h_j = _ffill(
        (pj_g, kj_g, mj_g, hj_g), occj != 0, axis_name,
        (_bits_f(jnp.zeros((), jnp.int32), dtype), jnp.zeros((), dtype),
         jnp.zeros((), dtype), jnp.ones((), dtype)),
    )
    pos_j = _bits_i(pos_bits_j)
    zf = jnp.zeros((), dtype)
    k_j1, m_j1 = _bfill(
        (_shift_left(kn_g, axis_name, zf), _shift_left(mn_g, axis_name, zf)),
        _shift_left(occn != 0, axis_name, jnp.asarray(False)),
        axis_name, (zf, zf),
    )
    last_idx = jnp.maximum(cnt - 1, 0)
    k_last = jnp.take_along_axis(kv, last_idx, axis=-1)
    m_last = jnp.take_along_axis(moments, last_idx, axis=-1)
    is_glast = gpos == n_global - 1
    k_j1 = jnp.where(is_glast, k_last, k_j1)
    m_j1 = jnp.where(is_glast, m_last, m_j1)

    h_safe = jnp.where(h_j == 0, jnp.ones_like(h_j), h_j)
    s = (gpos - pos_j).astype(dtype) / h_safe  # int diff first: exact any n
    omt = 1.0 - s
    baseline = (
        omt * k_j + s * k_j1
        + h_j * h_j / 6.0 * ((omt**3 - omt) * m_j + (s**3 - s) * m_j1)
    )

    passthrough = (nex < min_extrema)[..., None]
    baseline = jnp.where(passthrough, x, baseline)
    return x - baseline, baseline, nex


# ---------------------------------------------------------------------------
# distributed-SPIKE cubic tier: every shard factorizes its local piece of
# the grid-resident chained moment system (ops/chained_pcr.py) with its two
# boundary couplings moved to spike right-hand sides; only TWO scalars per
# shard cross the mesh (u at the shard's last cell, w at its first), so the
# interface all_gather is O(shards), not O(knots) — per-shard work is
# O(n_loc log n_loc) regardless of knot density, unlike the gather method
# whose replicated solve is O(total knots) per shard
# ---------------------------------------------------------------------------


def _cubic_local_spike(x, axis_name, n_global, min_extrema):
    from ..ops.chained_pcr import (
        shard_spike_factors, reduced_interface_solve)

    dtype = x.dtype
    n_loc = x.shape[-1]
    rank = lax.axis_index(axis_name)
    size = lax.axis_size(axis_name)
    gpos = rank * n_loc + lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    zf = jnp.zeros((), dtype)
    fb = jnp.asarray(False)

    def sdiv(num, den):
        return num / jnp.where(den == 0, jnp.ones_like(den), den)

    # interior extrema mask via 1-sample halo exchange
    big = jnp.asarray(jnp.inf, dtype)
    x_m1 = _shift_right(x, axis_name, big)
    x_p1 = _shift_left(x, axis_name, big)
    dxb = jnp.where(jnp.isnan(x - x_m1), jnp.inf, x - x_m1)
    dxf = jnp.where(jnp.isnan(x_p1 - x), jnp.inf, x_p1 - x)
    interior = (gpos > 0) & (gpos < n_global - 1)
    # NaN quarantine, per ops.extrema.extrema_masks (halo fill is +inf)
    near_nan = jnp.isnan(x) | jnp.isnan(x_m1) | jnp.isnan(x_p1)
    mask = ((((dxb <= 0) & (dxf > 0)) | ((dxb >= 0) & (dxf < 0)))
            & interior & ~near_nan)
    nex = lax.psum(jnp.sum(mask, axis=-1).astype(jnp.int32), axis_name)
    knots = mask | (gpos == 0) | (gpos == n_global - 1)

    # exclusive prev/next knot (position, raw value) -> Frei-Osorio
    # values.  Positions ride the fills as dtype-matched BIT PATTERNS
    # (_bits_f: exact at any n; float VALUE channels round above the
    # mantissa) and every span differences integers before ONE cast.
    km1 = _shift_right(knots, axis_name, fb)
    zbits = _bits_f(jnp.zeros((), jnp.int32), dtype)
    prev_bits, prev_x = _ffill(
        (_bits_f(jnp.where(gpos == 0, 0, gpos - 1), dtype),
         _shift_right(x, axis_name, zf)),
        km1, axis_name, (zbits, zf))
    kp1 = _shift_left(knots, axis_name, fb)
    next_bits, next_x = _bfill(
        (_bits_f(jnp.where(gpos == n_global - 1, 0, gpos + 1), dtype),
         _shift_left(x, axis_name, zf)),
        kp1, axis_name, (zbits, zf))
    prev_pos = _bits_i(prev_bits)
    next_pos = _bits_i(next_bits)

    span = (next_pos - prev_pos).astype(dtype)
    wfrac = sdiv((gpos - prev_pos).astype(dtype), span)
    k_site = 0.5 * (prev_x + wfrac * (next_x - prev_x)) + 0.5 * x
    first2, last2 = _end_samples_at(x, gpos, n_global, axis_name)
    b_first = 0.5 * (3.0 * first2[..., 0] - first2[..., 1])
    b_last = 0.5 * (3.0 * last2[..., -1] - last2[..., -2])
    k_site = jnp.where(gpos == 0, b_first[..., None], k_site)
    k_site = jnp.where(gpos == n_global - 1, b_last[..., None], k_site)

    # exclusive prev/next knot k_site values
    (kv_prev,) = _ffill((_shift_right(k_site, axis_name, zf),), km1,
                        axis_name, (zf,))
    (kv_next,) = _bfill((_shift_left(k_site, axis_name, zf),), kp1,
                        axis_name, (zf,))

    # not-a-knot tridiagonal rows at interior knots (shared with the
    # single-device tier, with global boundary conditions)
    from ..ops.chained_pcr import notaknot_rows

    a2, b2, c2, d = notaknot_rows(
        (gpos - prev_pos).astype(dtype), (next_pos - gpos).astype(dtype),
        kv_prev, k_site, kv_next,
        firstrow=prev_pos == 0, lastrow=next_pos == n_global - 1,
    )

    # local SPIKE factorization + O(shards) interface solve
    (xp_u, xp_w), (vl_u, vl_w), (vr_u, vr_w) = shard_spike_factors(
        mask, a2, b2, c2, d)

    # the six per-shard interface scalars ride ONE stacked all_gather
    iface = jnp.stack(
        [-vl_u[..., -1], -vl_w[..., 0], -vr_u[..., -1], -vr_w[..., 0],
         xp_u[..., -1], xp_w[..., 0]], axis=-1)
    iface = jnp.moveaxis(lax.all_gather(iface, axis_name), 0, -1)

    e, f = reduced_interface_solve(
        iface[..., 0, :], iface[..., 1, :], iface[..., 2, :],
        iface[..., 3, :], iface[..., 4, :], iface[..., 5, :],
    )
    e_prev = jnp.where(
        rank == 0, zf,
        jnp.take_along_axis(
            e, jnp.full(e.shape[:-1] + (1,), jnp.maximum(rank - 1, 0)),
            axis=-1)[..., 0],
    )
    f_next = jnp.where(
        rank == size - 1, zf,
        jnp.take_along_axis(
            f, jnp.full(f.shape[:-1] + (1,), jnp.minimum(rank + 1, size - 1)),
            axis=-1)[..., 0],
    )
    u = xp_u + vl_u * e_prev[..., None] + vr_u * f_next[..., None]
    w_sol = xp_w + vl_w * e_prev[..., None] + vr_w * f_next[..., None]
    m_j = u
    m_j1 = _shift_left(w_sol, axis_name, zf)

    # not-a-knot end moments from the global first/last two interior
    # knots.  ONE local 4-channel top-2-positions reduce (both
    # directions, the shared cubic_baseline._end_knot_positions), then
    # tiny scalar collectives — the serialized form (four full local
    # passes, two of them blocked on a pmin/pmax) produced identical
    # ints: the global second = the owner shard's local second, every
    # other shard contributes its local first.
    from ..ops.cubic_baseline import _end_knot_positions

    # i32 positions end to end: the reduce comparators and the pmin/neg
    # trick are dtype-generic, and integer sentinels stay exact at any n
    l_il1, l_il2, l_i1, l_i2 = _end_knot_positions(mask, gpos, n_global)
    # two pmins instead of two pmins + two pmaxes: negation is exact, so
    # pmax(v) == -pmin(-v) bitwise and the max channels ride along
    s1 = lax.pmin(jnp.stack([l_i1, -l_il1], axis=-1), axis_name)
    i1f, il1f = s1[..., 0], -s1[..., 1]
    s2 = lax.pmin(
        jnp.stack([jnp.where(l_i1 == i1f, l_i2, l_i1),
                   -jnp.where(l_il1 == il1f, l_il2, l_il1)], axis=-1),
        axis_name)
    i2f, il2f = s2[..., 0], -s2[..., 1]
    i1 = i1f.astype(jnp.int32)
    i2 = i2f.astype(jnp.int32)
    il1 = il1f.astype(jnp.int32)
    il2 = il2f.astype(jnp.int32)

    # the four end-moment one-hot sums ride ONE stacked psum (only the
    # owning shard contributes a non-zero, so the f32 sums are exact)
    idx4 = jnp.stack([i1, i2, il1, il2], axis=-1)
    m4 = lax.psum(
        jnp.sum(jnp.where(gpos[..., None, :] == idx4[..., None], u[..., None, :],
                          0.0), axis=-1),
        axis_name)
    m1, m2, ml1, ml2 = m4[..., 0], m4[..., 1], m4[..., 2], m4[..., 3]
    # degenerate contract at a single interior knot (pinned to the
    # compact solver, see ops.cubic_baseline._chained_moments): a missing
    # second interior knot keeps its one-hot moment at 0 (no gpos
    # matches the sentinel) and spans to the far END knot
    has_i2 = i2f < n_global
    has_il2 = il2f >= 0
    h0 = i1.astype(dtype)
    h1 = jnp.where(has_i2, i2 - i1, n_global - 1 - i1).astype(dtype)
    hl = (n_global - 1 - il1).astype(dtype)
    hl2 = jnp.where(has_il2, il1 - il2, il1).astype(dtype)
    m0 = m1 + sdiv(h0, h1) * (m1 - m2)
    m_last = ml1 + sdiv(hl, hl2) * (ml1 - ml2)

    # inclusive j-side fill for evaluation
    p1_bits, k_j = _ffill((_bits_f(gpos, dtype), k_site), knots, axis_name,
                          (zbits, zf))
    p1_pos = _bits_i(p1_bits)

    m_j = jnp.where(p1_pos == 0, m0[..., None], m_j)
    m_j1 = jnp.where(next_pos == n_global - 1, m_last[..., None], m_j1)

    is_glast = gpos == n_global - 1
    pos_j = jnp.where(is_glast, prev_pos, p1_pos)
    k_j = jnp.where(is_glast, kv_prev, k_j)
    k_j1 = jnp.where(is_glast, b_last[..., None], kv_next)
    m_j1 = jnp.where(is_glast, m_last[..., None], m_j1)
    right_pos = jnp.where(is_glast, gpos, next_pos)

    h_j = (right_pos - pos_j).astype(dtype)  # int diff: exact at any n
    s = sdiv((gpos - pos_j).astype(dtype), h_j)
    omt = 1.0 - s
    baseline = (
        omt * k_j + s * k_j1
        + h_j * h_j / 6.0 * ((omt**3 - omt) * m_j + (s**3 - s) * m_j1)
    )
    passthrough = (nex < min_extrema)[..., None]
    baseline = jnp.where(passthrough, x, baseline)
    return x - baseline, baseline, nex


@partial(jax.jit, static_argnames=("seq",))
def _max_knots_per_shard(x, seq: int):
    """Exact max over (batch, shards) of per-shard knot-buffer occupancy.

    One elementwise pass + reduction; runs under whatever sharding ``x``
    already has.  Knots = interior extrema plus the global endpoints, and
    every shard may also contribute up to nothing extra — the +2 for the
    end knots is folded in by counting them in their owning shard."""
    from ..ops.extrema import extrema_mask

    n = x.shape[-1]
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    # the canonical mask (incl. the NaN quarantine the sharded evaluators
    # also apply), so the capacity bound matches what they will compact
    knots = extrema_mask(x) | (it == 0) | (it == n - 1)
    per_shard = knots.reshape(x.shape[:-1] + (seq, n // seq)).sum(axis=-1)
    return jnp.max(per_shard)


def sharded_cubic_baseline(x, mesh: Mesh, *, capacity_per_shard: int | None = None,
                           min_extrema: int = 10, method: str = "spike"):
    """Sequence-parallel MEITD-tier cubic baseline over a (data, seq) mesh.

    Matches ``ops.cubic_baseline.cubic_baseline_extract`` on a single device.

    ``method="spike"`` (default): every shard SPIKE-factorizes its piece of
    the grid-resident chained moment system; the only cross-shard traffic
    beyond the fills' boundary summaries is an all_gather of SIX scalars
    per shard (the interface system) — per-shard work stays
    O(n_loc log n_loc) at any knot density.

    ``method="gather"``: each shard compacts its knots and one all_gather
    replicates all knot buffers for a redundant solve — simpler, but the
    replicated solve is O(total knots) per shard, which defeats sequence
    parallelism at noise-level knot densities.  ``capacity_per_shard``
    (gather method only) sets the per-shard buffer; when not given it is
    measured exactly by a cheap jitted counting pass.

    Returns (rotation, baseline, num_extrema)."""
    n_global = x.shape[-1]
    seq = mesh.shape["seq"]
    # no position ceiling: both methods carry knot positions as integers
    # (i32 compact buffers / dtype-matched bit patterns through the fill
    # helpers) and difference them before casting — exact at any n.
    # Any length / any batch: same padding contract as sharded_itd_sift
    # (edge-pad time, zero-pad batch rows; pads excluded from knots by
    # global-position masks; end knots located by ownership; cropped).
    pad = (-n_global) % seq
    if pad:
        x = jnp.concatenate(
            [x, jnp.broadcast_to(x[..., -1:], x.shape[:-1] + (pad,))],
            axis=-1)
    data = mesh.shape["data"]
    batch = x.shape[0]
    bpad = (-batch) % data
    if bpad:
        x = jnp.concatenate(
            [x, jnp.zeros((bpad,) + x.shape[1:], x.dtype)], axis=0)
    n_loc = (n_global + pad) // seq
    if method == "spike":
        local = partial(_cubic_local_spike, axis_name="seq",
                        n_global=n_global, min_extrema=min_extrema)
    elif method == "gather":
        if capacity_per_shard is None:
            measured = int(_max_knots_per_shard(jnp.asarray(x), seq))
            # round up to a multiple of 8 (sublane alignment, fewer recompiles)
            cap = min(max(-(-(measured) // 8) * 8, 8), n_loc + 2)
        else:
            cap = capacity_per_shard
        local = partial(_cubic_local, axis_name="seq", n_global=n_global,
                        cap=cap, min_extrema=min_extrema)
    else:
        raise ValueError(f"unknown method: {method!r}")
    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=P("data", "seq"),
        out_specs=(P("data", "seq"), P("data", "seq"), P("data")),
    )
    xs = jax.device_put(x, NamedSharding(mesh, P("data", "seq")))
    rot, base, nex = jax.jit(fn)(xs)
    if pad:
        rot, base = rot[..., :n_global], base[..., :n_global]
    if bpad:
        rot, base, nex = rot[:batch], base[:batch], nex[:batch]
    return rot, base, nex
