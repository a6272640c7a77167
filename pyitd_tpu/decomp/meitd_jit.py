"""MEITD as one jitted program.

The host-driven ``decomp.meitd`` dispatches several kernels per state-machine
step; over high-latency attachments each dispatch costs ~tens of ms.  This
module compiles the *entire* HILO walk — including the inner
retrieve-proper-rotation loop and the soft-reset digging loop — into a single
``lax.while_loop`` with fixed-capacity output buffers (44 + 44 rows, the
reference caps), using ``lax.cond`` so untaken branches do no work.

Semantics follow ``/root/reference/MEITD.py:344-534`` exactly like the host
version; ``test_meitd_jit`` pins the two implementations against each other.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.cubic_baseline import cubic_baseline_extract
from ..ops.extrema import count_extrema
from ..ops.wpe import weighted_permutation_entropy

__all__ = ["meitd_jit", "meitd_jit_bank", "MeitdResult"]

_MAX_ROWS = 44
_SOFT_CAP = 64     # bound on the reference's unbounded soft_reset digging


class MeitdResult(NamedTuple):
    high: jax.Array       # (44, n); rows beyond high_count are zero
    low: jax.Array        # (44, n)
    residual: jax.Array   # (n,)
    high_count: jax.Array
    low_count: jax.Array


def _gate(sig, wpemax):
    w = weighted_permutation_entropy(sig, 3, normalize=True)
    return (w >= 0.2) & (w < wpemax)


def _extract(sig, capacity):
    res = cubic_baseline_extract(sig, capacity, min_extrema=0)
    return res.rotation, res.baseline


def _first_proper(sig, wpemax, capacity):
    """(rotation, baseline, proper) — MEITD.py:371-392."""
    nex = count_extrema(sig)

    def low(_):
        return sig, jnp.zeros_like(sig), jnp.int32(0)

    def go(_):
        rot, base = _extract(sig, capacity)
        ok = _gate(sig, wpemax)
        return rot, base, jnp.where(ok, 1, 0).astype(jnp.int32)

    return lax.cond(nex < 5, low, go, None)


def _retrieve(rot_in, wpemax, capacity):
    """(rotation, proper) — MEITD.py:344-368 with the gate-constant
    short-circuit (see ``decomp.meitd.retrieve_proper_rotation``): the
    reference's re-sift loop returns either the first extraction (gate
    holds on the input) or the input unchanged (gate fails; the burned
    extractions are unobservable), so no loop is needed."""
    ok = _gate(rot_in, wpemax)
    nex0 = count_extrema(rot_in)

    def low(_):
        return rot_in, jnp.int32(0)

    def go(_):
        rot, _ = _extract(rot_in, capacity)
        return rot, jnp.int32(1)

    return lax.cond((nex0 <= 5) | ~ok, low, go, None)


@partial(jax.jit, static_argnames=("capacity",))
def meitd_jit(data, wpemax: float = 0.6, *, capacity: int | None = None) -> MeitdResult:
    x0 = jnp.asarray(data, jnp.float64)
    n = x0.shape[-1]
    cap = capacity or (n + 2)

    rotation0, baseline0, proper0 = _first_proper(x0, wpemax, cap)
    nex0 = count_extrema(x0)

    class C(NamedTuple):
        x: jax.Array
        rotation: jax.Array
        baseline: jax.Array
        high: jax.Array
        low: jax.Array
        highc: jax.Array
        lowc: jax.Array
        proper: jax.Array
        xchanged: jax.Array
        hilo: jax.Array
        soft_reset: jax.Array
        nex: jax.Array

    init = C(
        x=x0, rotation=rotation0, baseline=baseline0,
        high=jnp.zeros((_MAX_ROWS, n), x0.dtype),
        low=jnp.zeros((_MAX_ROWS, n), x0.dtype),
        highc=jnp.int32(0), lowc=jnp.int32(0),
        proper=proper0, xchanged=jnp.int32(0), hilo=jnp.int32(1),
        soft_reset=jnp.int32(1), nex=nex0,
    )

    def cond(c):
        # PLATFORM-WA(strict-gt): >= / <= forms, see docs/PLATFORM.md
        return (c.nex >= 6) & (c.highc + c.lowc <= 20)

    def body(c):
        # retrieve when the current rotation is improper
        def do_retrieve(c):
            rot, flag = _retrieve(c.rotation, wpemax, cap)
            return c._replace(rotation=rot, proper=flag)

        c = lax.cond(c.proper == 0, do_retrieve, lambda c: c, c)

        # accept: store by HILO, subtract from x
        def accept(c):
            is_high = c.hilo == 1
            high = lax.cond(
                is_high,
                lambda _: lax.dynamic_update_index_in_dim(
                    c.high, c.rotation, c.highc, 0
                ),
                lambda _: c.high, None,
            )
            low = lax.cond(
                is_high,
                lambda _: c.low,
                lambda _: lax.dynamic_update_index_in_dim(
                    c.low, c.rotation, c.lowc, 0
                ), None,
            )
            return c._replace(
                high=high, low=low,
                highc=c.highc + jnp.where(is_high, 1, 0),
                lowc=c.lowc + jnp.where(is_high, 0, 1),
                soft_reset=jnp.int32(0),
                x=c.x - c.rotation,
                xchanged=jnp.int32(1),
            )

        c = lax.cond(c.proper == 1, accept, lambda c: c, c)

        # exactly one continuation branch (MEITD.py:456-515)
        def branch_a(c):  # xchanged & hilo==1: rebase from baseline of x
            nx = count_extrema(c.x)

            def go(c):
                _, base = _extract(c.x, cap)
                rot, _, prop = _first_proper(base, wpemax, cap)
                return c._replace(
                    baseline=base, rotation=rot, proper=prop,
                    xchanged=jnp.int32(0), hilo=jnp.int32(0), nex=nx,
                )

            return lax.cond(nx < 5, lambda c: c._replace(nex=nx), go, c)

        def branch_b(c):  # hilo==1, no accept: dig into the held baseline
            rot, _, prop = _first_proper(c.baseline, wpemax, cap)
            return c._replace(rotation=rot, proper=prop, hilo=jnp.int32(0))

        def branch_c(c):  # xchanged & hilo==0: back to high-frequency side
            nx = count_extrema(c.x)

            def go(c):
                rot, base, prop = _first_proper(c.x, wpemax, cap)
                return c._replace(
                    rotation=rot, baseline=base, proper=prop,
                    xchanged=jnp.int32(0), hilo=jnp.int32(1), nex=nx,
                )

            return lax.cond(nx < 5, lambda c: c._replace(nex=nx), go, c)

        def branch_d(c):  # stuck: soft-reset digging
            def reset(c):
                rot, base = _extract(c.x, cap)
                return c._replace(rotation=rot, baseline=base,
                                  soft_reset=jnp.int32(1))

            c = lax.cond(c.soft_reset == 0, reset, lambda c: c, c)
            nxb = count_extrema(c.baseline)

            def dig(c):
                def dcond(s):
                    rot, base, nx, i = s
                    return (i < jnp.minimum(c.soft_reset, _SOFT_CAP)) & (nx >= 5)

                def dbody(s):
                    _, base, _, i = s
                    rot, base = _extract(base, cap)
                    return rot, base, count_extrema(base), i + 1

                rot, base, nx, _ = lax.while_loop(
                    dcond, dbody,
                    (c.rotation, c.baseline, nxb, jnp.int32(0)),
                )
                # the dig's running extrema count IS the walk's nex (the
                # host driver sets nex from each extract, meitd.py's dig
                # loop): keeping the stale count costs extra no-op trips
                # before the while exits (branch_d never touches
                # high/low/x, so outputs were unaffected)
                return c._replace(rotation=rot, baseline=base, nex=nx,
                                  soft_reset=c.soft_reset + 1)

            return lax.cond(nxb < 5, lambda c: c._replace(nex=nxb), dig, c)

        take_a = (c.xchanged == 1) & (c.hilo == 1)
        take_b = (c.xchanged == 0) & (c.hilo == 1)
        take_c = (c.xchanged == 1) & (c.hilo == 0)
        idx = jnp.where(take_a, 0, jnp.where(take_b, 1, jnp.where(take_c, 2, 3)))
        return lax.switch(idx, [branch_a, branch_b, branch_c, branch_d], c)

    c = lax.while_loop(cond, body, init)
    # reference quirk (MEITD.py:413-414, mirrored by decomp.meitd.meitd):
    # < 4 extrema yields TWO zero components; the buffers are zero-filled,
    # so raising the counts is enough.  4 <= nex <= 5 stays empty.
    degenerate = nex0 < 4
    return MeitdResult(
        high=c.high, low=c.low, residual=c.x,
        high_count=jnp.where(degenerate, 1, c.highc),
        low_count=jnp.where(degenerate, 1, c.lowc),
    )


def meitd_jit_bank(bank, wpemax: float = 0.6, *, capacity: int | None = None) -> MeitdResult:
    """Batched MEITD over a (batch, n) signal bank — the modpool-style
    many-independent-decompositions use case (``/root/reference/modpool.c``)
    expressed as one vmapped program: every signal walks its own HILO state
    machine, the lockstep while_loop runs until the slowest member stops.
    Matches per-signal :func:`meitd_jit` to f64 roundoff (lockstep batching
    reorders a few floating-point reductions)."""
    from functools import partial

    return jax.vmap(partial(meitd_jit, wpemax=wpemax, capacity=capacity))(bank)
