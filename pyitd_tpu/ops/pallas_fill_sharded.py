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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fill import (
    BLK, _LANES, _NONE, _block_scan, _mask_outputs, _out_struct, _roll_next,
)

__all__ = ["sharded_fill2_fwd", "sharded_sift_level_emit"]


def _knot_state_sharded(x, blk, n_loc, n_global, offset, prev_scalar,
                        next_scalar, halo_l, halo_r):
    """In-kernel knot mask + sign-encoded fill2 init for one shard block.

    Mirrors ``pallas_fill._knot_state`` with global positions and halo
    patches; padded samples (local position >= n_loc) are never knots.
    The XLA summary mask in ``parallel/sharded.py`` (``_shard_knot_mask``)
    must stay formula-identical to this.
    """
    sub = BLK // _LANES
    row = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 0)
    lane = lax.broadcasted_iota(jnp.int32, (sub, _LANES), 1)
    pos = blk * BLK + row * _LANES + lane     # local position
    gpos = pos + offset                        # global position

    xm1 = pltpu.roll(x, 1, 1)
    col_prev = pltpu.roll(x[:, _LANES - 1 :], 1, 0)
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
def _make_sharded_fill2_fwd_kernel(n_global: int, n_loc: int, nblk: int):
    sub = BLK // _LANES

    def kernel(off_ref, hl_ref, hr_ref, c0_ref, xprev_ref, xnext_ref,
               x_ref, p1p_ref, p1x_ref, p2p_ref, p2x_ref, carry):
        r = pl.program_id(0)
        g = pl.program_id(1)

        @pl.when(g == 0)
        def _():
            for i in range(4):
                carry[i] = c0_ref[r, i]

        _, _, _, _, state = _knot_state_sharded(
            x_ref[0], g, n_loc, n_global, off_ref[0],
            xprev_ref[r, g], xnext_ref[r, g], hl_ref[r], hr_ref[r],
        )
        carry_in = tuple(carry[i] for i in range(4))
        state, carry_out = _block_scan(state, False, carry_in, sub)
        for i in range(4):
            carry[i] = carry_out[i]

        outs = _mask_outputs(state)
        p1p_ref[0], p1x_ref[0], p2p_ref[0], p2x_ref[0] = outs

    return kernel


def sharded_fill2_fwd(x3, prev_edge, next_edge, offset, halo_l, halo_r,
                      carry0, n_loc: int, n_global: int, *,
                      interpret: bool = False):
    """Forward ITD fill2 over one shard with cross-shard carry injection.

    ``x3``: padded 3-D local signal ``(rows, npad//128, 128)``;
    ``offset``: (1,) int32 global start of this shard; ``halo_l``/``halo_r``:
    (rows,) neighbor-shard edge samples; ``carry0``: (rows, 4) sign-encoded
    forward prefix state (last two knots strictly before this shard,
    ``_NONE`` position = no such knot).  Returns the four fill channels in
    padded 3-D layout with globally-correct values.
    """
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    sub = BLK // _LANES
    spec = pl.BlockSpec((1, sub, _LANES), lambda r, b, *_refs: (r, b, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(rows, nblk),
        in_specs=[spec],
        out_specs=[spec] * 4,
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )
    return pl.pallas_call(
        _make_sharded_fill2_fwd_kernel(n_global, n_loc, nblk),
        grid_spec=grid_spec,
        out_shape=[_out_struct(x3.shape, jnp.float32, x3, carry0)] * 4,
        interpret=interpret,
    )(offset, halo_l, halo_r, carry0, prev_edge, next_edge, x3)


@lru_cache(maxsize=None)
def _make_sharded_emit_kernel(n_global: int, n_loc: int, nblk: int,
                              endpoint_mode: str, row_4d: bool):
    sub = BLK // _LANES
    nm1 = float(n_global - 1)

    def kernel(off_ref, hl_ref, hr_ref, c0_ref, xprev_ref, xnext_ref,
               bfirst_ref, blast_ref, fa_ref, fb_ref, fc_ref, *rest):
        if row_4d:
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
            for i in range(4):
                carry[i] = c0_ref[r, i]

        blk = nblk - 1 - g  # reverse walk
        x = x_ref[0]
        gpos, row, lane, _, state = _knot_state_sharded(
            x, blk, n_loc, n_global, off_ref[0],
            xprev_ref[r, blk], xnext_ref[r, blk], hl_ref[r], hr_ref[r],
        )
        carry_in = tuple(carry[i] for i in range(4))
        state, carry_out = _block_scan(state, reverse=True,
                                       carry_in=carry_in, rows=sub)
        for i in range(4):
            carry[i] = carry_out[i]

        # strictly-after knots: inclusive state of the next sample (the
        # shard's last REAL sample reads the padded samples' pass-through
        # state, which equals the injected cross-shard suffix)
        shifted = tuple(
            _roll_next(s, c, row, lane) for s, c in zip(state, carry_in)
        )
        n1p, n1x, n2p, n2x = _mask_outputs(shifted)
        f1p, f1x, f2p, f2x = f1p_ref[0], f1x_ref[0], f2p_ref[0], f2x_ref[0]
        b_first = bfirst_ref[r]
        b_last = blast_ref[r]

        def knot_value(kpos, kval, lpos, lx, rpos, rx, end_val, is_first):
            span = rpos - lpos
            w = (kpos - lpos) / jnp.where(span == 0, jnp.ones_like(span), span)
            formula = 0.5 * (lx + w * (rx - lx)) + 0.5 * kval
            return jnp.where(is_first, end_val, formula)

        b_l = knot_value(f1p, f1x, f2p, f2x, n1p, n1x, b_first, f1p == 0)
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
            baseline = jnp.where(gpos == n_global - 1,
                                 jnp.zeros_like(baseline), baseline)
        base_ref[0] = baseline

        rot = x - baseline
        bb = rot - x
        err = (x - (rot - bb)) + ((-baseline) - bb)
        rot_ref[0] = rot
        err_ref[0] = err

        # --- sift bookkeeping for the PREVIOUS extraction's outputs ---
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


def sharded_sift_level_emit(x3, fwd3, prev_edge, next_edge, offset, halo_l,
                            halo_r, carry0_rev, b_first, b_last, stop_a,
                            stop_b, cont, rot3, pbase3, perr3, comp3,
                            n_loc: int, n_global: int, *,
                            endpoint_mode: str = "reference",
                            interpret: bool = False,
                            out_levels=None, level_idx=None):
    """Fused reverse fill + interpolation + sift bookkeeping for one shard.

    Shard-aware counterpart of ``pallas_fill.sift_level_emit_padded``'s
    second kernel: ``carry0_rev`` is the (rows, 4) sign-encoded suffix
    state (first two knots strictly after this shard), ``b_first``/
    ``b_last`` the GLOBAL end-knot values.  Stop flags arrive precomputed
    (the sharded driver derives the extrema count from its XLA summary
    mask).  Returns ``(base3, rot3, err3, row, comp3)``.
    """
    rows = x3.shape[0]
    npad = x3.shape[1] * _LANES
    nblk = npad // BLK
    sub = BLK // _LANES
    main_map = lambda r, b, *_refs: (r, nblk - 1 - b, 0)
    rspec = pl.BlockSpec((1, sub, _LANES), main_map, memory_space=pltpu.VMEM)
    row_into_levels = out_levels is not None
    operands = [
        offset, halo_l, halo_r, carry0_rev, prev_edge, next_edge,
        b_first, b_last,
        stop_a.astype(jnp.float32), stop_b.astype(jnp.float32),
        cont.astype(jnp.float32),
    ]
    tensor_operands = [x3, *fwd3, rot3, pbase3, perr3, comp3]
    if row_into_levels:
        num_prefetch = 12
        operands.append(jnp.asarray(level_idx, jnp.int32).reshape(1))
        operands += tensor_operands + [out_levels]
        in_specs = [rspec] * 9 + [pl.BlockSpec(memory_space=pl.ANY)]
        row_spec = pl.BlockSpec(
            (1, 1, sub, _LANES),
            lambda r, b, *refs: (refs[11][0], r, nblk - 1 - b, 0),
            memory_space=pltpu.VMEM,
        )
        row_shape = _out_struct(out_levels.shape, jnp.float32, out_levels,
                                x3)
        aliases = {13: 0, 21: 3, 18: 1, 19: 2, 20: 4}
    else:
        num_prefetch = 11
        operands += tensor_operands
        in_specs = [rspec] * 9
        row_spec = rspec
        row_shape = _out_struct(x3.shape, jnp.float32, x3, rot3)
        aliases = {12: 0, 16: 3, 17: 1, 18: 2, 19: 4}
    rgrid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=num_prefetch,
        grid=(rows, nblk),
        in_specs=in_specs,
        out_specs=[rspec, rspec, rspec, row_spec, rspec],
        scratch_shapes=[pltpu.SMEM((4,), jnp.float32)],
    )
    return pl.pallas_call(
        _make_sharded_emit_kernel(n_global, n_loc, nblk, endpoint_mode,
                                  row_into_levels),
        grid_spec=rgrid,
        out_shape=[_out_struct(x3.shape, jnp.float32, x3, *fwd3)] * 3
        + [row_shape, _out_struct(x3.shape, jnp.float32, x3, comp3)],
        input_output_aliases=aliases,
        interpret=interpret,
    )(*operands)
