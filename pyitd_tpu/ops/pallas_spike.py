"""Pallas TPU SPIKE solver for the chained spline-moment system.

:mod:`.chained_pcr` solves the knot-space tridiagonal system on the signal
grid with full-length block PCR — ``log2(n)`` XLA rounds that each
round-trip every channel through HBM (~65 ms of the cubic tier's time at
8x1M on v5e).  This module replaces it with the classic substructuring
(SPIKE) decomposition, shaped for one HBM pass:

* **local kernel** (Pallas): each 8192-cell block runs the chained
  block-2x2 PCR entirely in VMEM (13 in-register rounds), with the block's
  two boundary couplings moved to extra right-hand sides.  Per cell it
  emits the particular solution and the two "spike" responses — 6 output
  channels from 5 input channels, one read + one write of HBM.
* **reduced system** (XLA, tiny): the chained sparsity
  (``A = [[al,0],[0,0]]``, ``C = [[0,cg],[0,cw]]``) means only TWO scalars
  per block couple across blocks — ``u`` at the block's last cell and
  ``w`` at its first.  The (2 per block) x (n/8192 blocks) dense-2x2
  block-tridiagonal system is solved with a ~128-length PCR in microseconds.
* **back-substitution** (XLA, fused elementwise):
  ``x = x_particular + spike_L * e_{p-1} + spike_R * f_{p+1}``.

Exact (same algebra as the grid PCR, validated against it and the compact
Thomas oracle in ``tests/test_chained_pcr.py``); ~5x less HBM traffic and
no long-range shifts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .chained_pcr import reduced_interface_solve
from .pallas_fill import _out_struct as _pf_out_struct

__all__ = ["chained_block_spike", "spike_factors_padded",
           "spike_backsub_eval", "SPIKE_BLK"]

SPIKE_BLK = 8192
_LANES = 128

def _roll(a, k, axis):
    # i32-pinned pltpu.roll (x64-proof; see pallas_fill._roll)
    return pltpu.roll(a, np.int32(k) if isinstance(k, int) else k, axis)


_SUB = SPIKE_BLK // _LANES  # 64


def _safe_inv(x):
    return 1.0 / jnp.where(x == 0, jnp.ones_like(x), x)


# ---------------------------------------------------------------------------
# local kernel: in-VMEM chained PCR with spike right-hand sides
# ---------------------------------------------------------------------------


def _shift_fwd(x, s, fill, flat):
    """Row-major ``out[k] = x[k - s]`` within a (SUB, 128) tile; flat
    indices < s take ``fill``.  s is static."""
    q, rem = divmod(s, _LANES)
    if rem:
        r = _roll(x, rem, 1)
        a = _roll(r, q, 0) if q else r
        b = _roll(r, q + 1, 0)
        lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        out = jnp.where(lane >= rem, a, b)
    else:
        out = _roll(x, q, 0)
    return jnp.where(flat >= s, out, jnp.full_like(x, fill))


def _shift_bwd(x, s, fill, flat):
    """Row-major ``out[k] = x[k + s]``; flat indices >= L - s take fill."""
    q, rem = divmod(s, _LANES)
    if rem:
        r = _roll(x, _LANES - rem, 1)
        a = _roll(r, (_SUB - q) % _SUB, 0) if q else r
        b = _roll(r, (_SUB - q - 1) % _SUB, 0)
        lane = lax.broadcasted_iota(jnp.int32, x.shape, 1)
        out = jnp.where(lane < _LANES - rem, a, b)
    else:
        out = _roll(x, (_SUB - q) % _SUB, 0) if q else x
    return jnp.where(flat < SPIKE_BLK - s, out, jnp.full_like(x, fill))


def _spike_local_kernel(m_ref, a_ref, b_ref, c_ref, d_ref,
                        xp1_ref, xp2_ref, vl1_ref, vl2_ref, vr1_ref, vr2_ref):
    m = m_ref[0] != 0
    a_in, b_in, c_in, d_in = a_ref[0], b_ref[0], c_ref[0], d_ref[0]

    row = lax.broadcasted_iota(jnp.int32, m.shape, 0)
    lane = lax.broadcasted_iota(jnp.int32, m.shape, 1)
    flat = row * _LANES + lane

    one = jnp.ones_like(a_in)
    zero = jnp.zeros_like(a_in)

    # chain-encoded block state (see chained_pcr.chained_block_pcr)
    al = jnp.where(m, a_in, -one)
    b11 = jnp.where(m, b_in, one)
    b12 = zero
    b21 = jnp.where(m, -one, zero)
    cg = jnp.where(m, c_in, zero)
    cw = jnp.where(m, zero, -one)
    d1 = jnp.where(m, d_in, zero)
    d2 = zero

    # boundary couplings -> spike right-hand sides, then dropped locally
    is_first = flat == 0
    is_last = flat == SPIKE_BLK - 1
    l1 = jnp.where(is_first, -al, zero)
    l2 = zero
    r1 = jnp.where(is_last, -cg, zero)
    r2 = jnp.where(is_last, -cw, zero)
    al = jnp.where(is_first, zero, al)
    cg = jnp.where(is_last, zero, cg)
    cw = jnp.where(is_last, zero, cw)

    rhs = [(d1, d2), (l1, l2), (r1, r2)]

    s = 1
    while s < SPIKE_BLK:
        fm = partial(_shift_fwd, s=s, fill=0.0, flat=flat)
        fp = partial(_shift_bwd, s=s, fill=0.0, flat=flat)
        b11m = _shift_fwd(b11, s, 1.0, flat)
        b12m, b21m = fm(b12), fm(b21)
        alm, cgm, cwm = fm(al), fm(cg), fm(cw)
        b11p = _shift_bwd(b11, s, 1.0, flat)
        b12p, b21p = fp(b12), fp(b21)
        alp, cgp, cwp = fp(al), fp(cg), fp(cw)

        idetm = _safe_inv(b11m - b12m * b21m)
        e11 = -al * idetm
        e12 = al * b12m * idetm
        idetp = _safe_inv(b11p - b12p * b21p)
        f11 = cg * b21p * idetp
        f12 = -cg * b11p * idetp
        f21 = cw * b21p * idetp
        f22 = -cw * b11p * idetp

        b11 = b11 + f11 * alp
        b12 = b12 + e11 * cgm + e12 * cwm
        b21 = b21 + f21 * alp

        new_rhs = []
        for (p1, p2) in rhs:
            p1m, p2m = fm(p1), fm(p2)
            p1p, p2p = fp(p1), fp(p2)
            new_rhs.append((
                p1 + e11 * p1m + e12 * p2m + f11 * p1p + f12 * p2p,
                p2 + f21 * p1p + f22 * p2p,
            ))
        rhs = new_rhs

        al = e11 * alm
        cg = f11 * cgp + f12 * cwp
        cw = f21 * cgp + f22 * cwp
        s <<= 1

    idet = _safe_inv(b11 - b12 * b21)
    (d1, d2), (l1, l2), (r1, r2) = rhs
    xp1_ref[0] = (d1 - b12 * d2) * idet
    xp2_ref[0] = (b11 * d2 - b21 * d1) * idet
    vl1_ref[0] = (l1 - b12 * l2) * idet
    vl2_ref[0] = (b11 * l2 - b21 * l1) * idet
    vr1_ref[0] = (r1 - b12 * r2) * idet
    vr2_ref[0] = (b11 * r2 - b21 * r1) * idet


def spike_factors_padded(m3, a3, b3, c3, d3, *, interpret: bool = False):
    """The SPIKE local kernel on already-padded 3-D channels
    ``(rows, npad//128, 128)``; returns the six factor channels padded
    (xp1, xp2, vl1, vl2, vr1, vr2).  Padding must be unmarked (chain
    rows)."""
    rows = m3.shape[0]
    nblk = (m3.shape[1] * _LANES) // SPIKE_BLK
    spec = pl.BlockSpec((1, _SUB, _LANES), lambda r, p: (r, p, np.int32(0)),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _spike_local_kernel,
        grid=(rows, nblk),
        in_specs=[spec] * 5,
        out_specs=[spec] * 6,
        out_shape=[_pf_out_struct(m3.shape, jnp.float32, m3, d3)] * 6,
        interpret=interpret,
    )(m3, a3, b3, c3, d3)


def _make_spike_eval_kernel(n_real: int):
    """Fused SPIKE back-substitution + moment-spline segment evaluation.

    Per sample: recover the previous/next-knot moments from the spike
    factors (``u = xp1 + vl1 e_prev + vr1 f_next``; ``m_j1`` is the next
    sample's ``w``), apply the end-moment and final-sample patches
    (``cubic_baseline._chained_moments`` / ``_segment_eval`` semantics),
    and evaluate the closed-form moment spline — one HBM read of the 13
    channels and one write of baseline+rotation, replacing the XLA
    back-substitution pass, the ``m_j1`` shift materialization, and the
    separate evaluation pass (~2.7 ms of the 8x1M tier)."""
    def kernel(ep_ref, fn_ref, wn_ref, m0_ref, ml_ref, bl_ref, pass_ref,
               xp1_ref, xp2_ref, vl1_ref, vl2_ref, vr1_ref, vr2_ref,
               p1p_ref, p2p_ref, n1p_ref, kj_ref, kjm1_ref, kj1_ref, x_ref,
               base_ref, rot_ref):
        r = pl.program_id(0)
        blk = pl.program_id(1)
        e_prev = ep_ref[r, blk]
        f_next = fn_ref[r, blk]

        u = xp1_ref[0] + vl1_ref[0] * e_prev + vr1_ref[0] * f_next
        w = xp2_ref[0] + vl2_ref[0] * e_prev + vr2_ref[0] * f_next

        row = lax.broadcasted_iota(jnp.int32, u.shape, 0)
        lane = lax.broadcasted_iota(jnp.int32, u.shape, 1)
        it = blk * SPIKE_BLK + row * _LANES + lane
        iota_f = it.astype(jnp.float32)

        # m_j1 = w at the NEXT sample; the block's last element takes the
        # next block's first w (prefetch scalar)
        from .pallas_fill import _roll_next

        m_j1 = _roll_next(w, wn_ref[r, blk], row, lane)
        m_j = u

        p1p, p2p, n1p = p1p_ref[0], p2p_ref[0], n1p_ref[0]
        k_j, k_jm1, k_j1 = kj_ref[0], kjm1_ref[0], kj1_ref[0]
        x = x_ref[0]
        m0 = m0_ref[r]
        m_last = ml_ref[r]
        b_last = bl_ref[r]

        m_j = jnp.where(p1p == 0, m0, m_j)
        m_j1 = jnp.where(n1p == n_real - 1, m_last, m_j1)

        is_last = it == n_real - 1
        m_j1 = jnp.where(is_last, m_last, m_j1)
        pos_j = jnp.where(is_last, p2p, p1p)
        k_j = jnp.where(is_last, k_jm1, k_j)
        k_j1 = jnp.where(is_last, b_last, k_j1)
        right_pos = jnp.where(is_last, iota_f, n1p)

        h_j = right_pos - pos_j
        h_safe = jnp.where(h_j == 0, jnp.ones_like(h_j), h_j)
        t = (iota_f - pos_j) / h_safe
        omt = 1.0 - t
        baseline = (
            omt * k_j + t * k_j1
            + h_j * h_j / 6.0 * ((omt**3 - omt) * m_j + (t**3 - t) * m_j1)
        )
        baseline = jnp.where(pass_ref[r] != 0, x, baseline)
        base_ref[0] = baseline
        rot_ref[0] = x - baseline

    return kernel


def spike_backsub_eval(factors, e_prev, f_next, w_first_next, m0, m_last,
                       b_last, passthrough, p1p3, p2p3, n1p3, kj3, kjm13,
                       kj13, x3, n_real: int, *, interpret: bool = False):
    """Run the fused back-substitution + evaluation kernel on padded 3-D
    channels; returns padded ``(baseline, rotation)``.

    ``factors``: the 6 outputs of :func:`spike_factors_padded`;
    ``e_prev``/``f_next``/``w_first_next``: (rows, nblk) per-block interface
    scalars; ``m0``/``m_last``/``b_last``/``passthrough``: (rows,) scalars.
    """
    rows = x3.shape[0]
    nblk = (x3.shape[1] * _LANES) // SPIKE_BLK
    spec = pl.BlockSpec((1, _SUB, _LANES), lambda r, p, *_refs: (r, p, np.int32(0)),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=7,
        grid=(rows, nblk),
        in_specs=[spec] * 13,
        out_specs=[spec] * 2,
    )
    return pl.pallas_call(
        _make_spike_eval_kernel(n_real),
        grid_spec=grid_spec,
        out_shape=[_pf_out_struct(x3.shape, jnp.float32, x3, factors[0])] * 2,
        interpret=interpret,
    )(e_prev, f_next, w_first_next, m0, m_last, b_last,
      passthrough.astype(jnp.float32), *factors, p1p3, p2p3, n1p3, kj3,
      kjm13, kj13, x3)


@partial(jax.jit, static_argnames=("interpret",))
def chained_block_spike(mask, a, b, c, d, *, interpret: bool = False):
    """Drop-in twin of :func:`..chained_pcr.chained_block_pcr` (2-D inputs,
    f32) solved via the SPIKE substructuring above.  Returns ``(u, w)``."""
    rows, n = mask.shape
    npad = -(-n // SPIKE_BLK) * SPIKE_BLK
    pad = npad - n
    nblk = npad // SPIKE_BLK

    def prep(x, fill):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate(
                [x, jnp.full((rows, pad), fill, jnp.float32)], axis=-1
            )
        return x.reshape(rows, npad // _LANES, _LANES)

    outs = spike_factors_padded(
        prep(mask, 0.0), prep(a, 0.0), prep(b, 1.0), prep(c, 0.0),
        prep(d, 0.0), interpret=interpret)
    xp1, xp2, vl1, vl2, vr1, vr2 = (
        o.reshape(rows, nblk, SPIKE_BLK) for o in outs
    )

    e, f = reduced_interface_solve(
        -vl1[..., -1], -vl2[..., 0],
        -vr1[..., -1], -vr2[..., 0],
        xp1[..., -1], xp2[..., 0],
    )
    e_prev = jnp.concatenate([jnp.zeros_like(e[..., :1]), e[..., :-1]], -1)
    f_next = jnp.concatenate([f[..., 1:], jnp.zeros_like(f[..., :1])], -1)

    u = xp1 + vl1 * e_prev[..., None] + vr1 * f_next[..., None]
    w = xp2 + vl2 * e_prev[..., None] + vr2 * f_next[..., None]
    return (u.reshape(rows, npad)[:, :n], w.reshape(rows, npad)[:, :n])
