"""Shard-local Pallas ITD level kernels for the sequence-parallel sift.

The single-chip fill/emit kernels (``ops/pallas_fill.py``) assume the whole
signal is resident; the sequence-parallel sift (``parallel/sharded.py``)
shards the time axis over the mesh.  A sharded level is the SAME doubling
-scan fill + fused interpolation epilogue, with three deltas — all injected
through scalar prefetch so the kernels stay one-HBM-pass streams:

* **global positions**: sample positions are ``offset + local`` where
  ``offset = rank * n_loc`` arrives as a dynamic scalar (positions stay
  exact in f32 up to 2^24 samples, same contract as single-chip);
* **halo neighbors**: the extrema test at the shard's first/last sample
  reads the neighbor shard's edge sample (one ``ppermute`` scalar per
  direction, done by the caller);
* **carry injection**: the cross-block SMEM carry is initialized from the
  *cross-shard* fill state — 4 scalars per row per direction, the combined
  "last two knots before this shard" (forward) / "first two knots after"
  (reverse) summaries.  The caller builds these from an ``all_gather`` of
  per-shard knot summaries (the same trick ``shard_spike_factors`` plays
  for the cubic tier: O(shards) interface data, never O(samples)).

With globally-correct fill channels in hand, the fused epilogue
(knot values per ``/root/reference/ITD.py:106-117``, interpolation,
rotation + two-sum residual, sift row/compensation bookkeeping) is
identical to the single-chip emit kernel.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fill import (
    BLK, _LANES, _NO_ALIAS, _NONE, _block_scan, _fused_scans_and_epilogue,
    _mask_outputs, _out_struct, _roll, _roll_next,
)

__all__ = ["sharded_sift_level_fused"]


def _knot_state_sharded(x, blk, n_loc, n_global, offset, prev_scalar,
                        next_scalar, halo_l, halo_r):
    """In-kernel knot mask + sign-encoded fill2 init for one shard block.

    Mirrors ``pallas_fill._knot_state`` with global positions and halo
    patches; padded samples (local position >= n_loc) are never knots.
    The XLA summary mask in ``parallel/sharded.py``
    (``_sift_local_pallas``'s ``block_states``) must stay
    formula-identical to this.
    """
    sub = BLK // _LANES
    row = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 1)
    pos = blk * BLK + row * _LANES + lane     # local position
    gpos = pos + offset                        # global position

    xm1 = _roll(x, 1, 1)
    col_prev = _roll(x[:, _LANES - 1 :], 1, 0)
    xm1 = jnp.where(lane == 0, col_prev, xm1)
    xm1 = jnp.where((lane == 0) & (row == 0), prev_scalar, xm1)
    xm1 = jnp.where(pos == 0, halo_l, xm1)
    xp1 = _roll_next(x, next_scalar, row, lane)
    xp1 = jnp.where(pos == n_loc - 1, halo_r, xp1)

    dxb = x - xm1
    dxf = xp1 - x
    dxb = jnp.where(jnp.isnan(dxb), jnp.inf, dxb)
    dxf = jnp.where(jnp.isnan(dxf), jnp.inf, dxf)
    near_nan = jnp.isnan(x) | jnp.isnan(xm1) | jnp.isnan(xp1)
    valid = pos < n_loc
    interior = (gpos > 0) & (gpos < n_global - 1) & valid
    is_min = (dxb <= 0) & (dxf > 0)
    is_max = (dxb >= 0) & (dxf < 0)
    m = ((is_min | is_max) & interior & ~near_nan) | (
        valid & ((gpos == 0) | (gpos == n_global - 1))
    )

    state = (
        jnp.where(m, gpos.astype(jnp.float32), _NONE),
        x,
        jnp.full_like(x, _NONE),
        x,
    )
    return gpos, row, lane, m, state


@lru_cache(maxsize=None)
def _make_level_fused_sharded_kernel(n_global: int, n_loc: int, nblk: int,
                                     endpoint_mode: str, row_4d: bool,
                                     fold_emit: bool = False):
    """Shard-aware one-kernel fused level: ``_make_level_fused_kernel``
    with global positions and halo patches.  Like the single-chip kernel,
    the grid walks each row's blocks in REVERSE and chains the reverse
    scan's cross-block state through an SMEM carry — seeded at each row's
    first grid step from the CROSS-SHARD suffix (``rs_ref``, the folded
    "first two knots after this shard", (rows, 4)).  Only the forward
    folds ride the per-block prefetch (cross-shard prefix already
    combined in by the caller).

    ``fold_emit``: the sharded twin of the single-chip lever (see
    ``pallas_fill._make_level_fused_kernel``) — emits per block the NEXT
    level's partial fill-state folds of the freshly computed baseline in
    BOTH directions plus the partial mark count (9 lanes: fwd last-two
    sign-encoded, rev first-two big-encoded, count).  The partial fold
    excludes each block's FIRST sample (its mask needs the previous
    block's last baseline value — not yet produced by the reverse walk)
    and the SHARD's last real sample (its mask needs the next shard's
    first baseline value, a cross-shard output of this very trip);
    ``parallel/sharded.py`` resolves both from halos and strided
    slices."""
    nm1 = float(n_global - 1)
    bigf = float(n_global + nblk * BLK + 1)  # matches the driver's big

    def kernel(off_ref, hl_ref, hr_ref, fp_ref, rs_ref, xprev_ref,
               xnext_ref, bfirst_ref, blast_ref, fa_ref, fb_ref, fc_ref,
               *rest):
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
            for i in range(4):
                carry[i] = rs_ref[r, i]
            if fold_emit:
                # next-block-first baseline value: none at the reverse
                # walk's first step; 0.0 is safe — it can only reach the
                # mask of the shard's last real sample (excluded from the
                # partial fold) or padding (never marked)
                carry[4] = 0.0

        blk = nblk - 1 - g  # reverse walk
        x = x_ref[0]
        gpos, row, lane, _, state0 = _knot_state_sharded(
            x, blk, n_loc, n_global, off_ref[0],
            xprev_ref[r, blk], xnext_ref[r, blk], hl_ref[r], hr_ref[r],
        )
        fwd_in = tuple(fp_ref[r, blk * 4 + i] for i in range(4))
        rev_in = tuple(carry[i] for i in range(4))
        carry_out = _fused_scans_and_epilogue(
            x, state0, gpos, row, lane, fwd_in, rev_in, nm1,
            gpos == n_global - 1, bfirst_ref[r], blast_ref[r],
            endpoint_mode, fa_ref[r] != 0, fb_ref[r] != 0, fc_ref[r] != 0,
            rotp_ref, pbase_ref, perr_ref, comp_ref,
            base_ref, rot_ref, err_ref, row_ref, compo_ref, row_4d)
        for i in range(4):
            carry[i] = carry_out[i]

        if fold_emit:
            b = base_ref[0]  # the baseline just written (next level's x)
            nf = carry[4]    # baseline[(blk+1)*BLK], from the previous step
            # same mask formula the next trip will apply; the dummy
            # prev/halo scalars (0.0) only reach the excluded samples
            _, _, _, mb, _ = _knot_state_sharded(
                b, blk, n_loc, n_global, off_ref[0], jnp.float32(0.0), nf,
                jnp.float32(0.0), jnp.float32(0.0))
            lpos = blk * BLK + row * _LANES + lane
            mp = mb & ~((row == 0) & (lane == 0)) & (lpos != n_loc - 1)
            gposf = gpos.astype(jnp.float32)
            mpp = jnp.where(mp, gposf, _NONE)
            p1 = jnp.max(mpp)
            p2 = jnp.max(jnp.where(mpp == p1, _NONE, mpp))
            # one-hot value picks: global positions are unique and the
            # empty sentinels (_NONE / bigf) never match a real position
            v1 = jnp.sum(jnp.where(gposf == p1, b, 0.0))
            v2 = jnp.sum(jnp.where(gposf == p2, b, 0.0))
            mrr = jnp.where(mp, gposf, bigf)
            q1 = jnp.min(mrr)
            q2 = jnp.min(jnp.where(mrr == q1, bigf, mrr))
            w1 = jnp.sum(jnp.where(gposf == q1, b, 0.0))
            w2 = jnp.sum(jnp.where(gposf == q2, b, 0.0))
            cnt = jnp.sum(mp.astype(jnp.float32))
            fr = lax.broadcasted_iota(jnp.int32, (8, _LANES), 0)
            fl = lax.broadcasted_iota(jnp.int32, (8, _LANES), 1)
            vec = jnp.zeros((8, _LANES), jnp.float32)
            for k, s in enumerate((p1, v1, p2, v2, q1, w1, q2, w2, cnt)):
                vec = jnp.where((fr == 0) & (fl == k), s, vec)
            fold_ref[0] = vec
            carry[4] = b[0, 0]

    return kernel


def sharded_sift_level_fused(x3, prev_edge, next_edge, offset, halo_l,
                             halo_r, fwd_prefix, shard_suffix, b_first,
                             b_last, stop_a, stop_b, cont, rot3, pbase3,
                             perr3, comp3, n_loc: int, n_global: int, *,
                             endpoint_mode: str = "reference",
                             interpret: bool = False,
                             out_levels=None, level_idx=None,
                             donate_input: bool = False,
                             fold_emit: bool = False):
    """Sharded counterpart of ``pallas_fill.sift_level_fused_padded``:
    one reverse-walking kernel per trip.  ``fwd_prefix`` is the flattened
    (rows, nblk*4) per-block forward folds with the cross-shard prefix
    already combined in by the caller; ``shard_suffix`` (rows, 4) is the
    cross-shard REVERSE state that seeds the kernel's SMEM carry — the
    per-block reverse folds are never materialized.  With ``fold_emit``,
    appends the raw (rows, nblk*8, 128) partial-fold planes of the NEW
    baseline (9 used lanes: fwd last-two, rev first-two big-encoded,
    count) for the driver's ``states_from_folds`` resolver.

    ``donate_input=True`` donates ``x3`` to the baseline output; only the
    initial extraction (where the input dies) may pass it — the trip loop
    keeps its input live as the next trip's ``pbase3`` (see
    ``pallas_fill.sift_level_fused_padded``)."""
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    sub = BLK // _LANES
    main_map = lambda r, b, *_refs: (r, nblk - 1 - b, np.int32(0))
    rspec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    row_into_levels = out_levels is not None
    operands = [
        offset, halo_l, halo_r, fwd_prefix, shard_suffix, prev_edge,
        next_edge, b_first, b_last,
        stop_a.astype(jnp.float32), stop_b.astype(jnp.float32),
        cont.astype(jnp.float32),
    ]
    tensor_operands = [x3, rot3, pbase3, perr3, comp3]
    if row_into_levels:
        num_prefetch = 13
        operands.append(jnp.asarray(level_idx, jnp.int32).reshape(1))
        operands += tensor_operands + [out_levels]
        in_specs = [rspec] * 5 + [pl.BlockSpec(memory_space=pl.ANY)]
        row_spec = pl.BlockSpec(
            (1, 1, sub, _LANES),
            lambda r, b, *refs: (refs[12][0], r, nblk - 1 - b, np.int32(0)),
            memory_space=pltpu.VMEM,
        )
        row_shape = _out_struct(out_levels.shape, jnp.float32, out_levels,
                                x3)
        # structural aliases only - see pallas_fill.sift_level_fused_padded
        # ({18: 3} is the REQUIRED row pass-through; the x3 donation is
        # caller-gated because the trip loop keeps x3 live)
        aliases = {13: 0, 18: 3} if donate_input else {18: 3}
        required_aliases = {18: 3}
    else:
        num_prefetch = 12
        operands += tensor_operands
        in_specs = [rspec] * 5
        row_spec = rspec
        row_shape = _out_struct(x3.shape, jnp.float32, x3, rot3)
        aliases = {12: 0} if donate_input else {}
        required_aliases = {}
    out_specs = [rspec, rspec, rspec, row_spec, rspec]
    out_shape = [_out_struct(x3.shape, jnp.float32, x3, comp3)] * 3 + [
        row_shape, _out_struct(x3.shape, jnp.float32, x3, comp3)]
    if fold_emit:
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
        _make_level_fused_sharded_kernel(n_global, n_loc, nblk,
                                         endpoint_mode, row_into_levels,
                                         fold_emit=fold_emit),
        grid_spec=rgrid,
        out_shape=out_shape,
        # same PYITD_NO_ALIAS ablation gate as the single-chip kernels:
        # drop donations, keep the required row pass-through alias
        input_output_aliases=required_aliases if _NO_ALIAS else aliases,
        interpret=interpret,
    )(*operands)
