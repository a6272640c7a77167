"""MEITD / XITD — maximal-extraction ensemble ITD with entropy gating.

Behavioral contract (``/root/reference/MEITD.py:344-549``):

* a rotation is "proper" iff the weighted permutation entropy of the signal
  it was extracted from satisfies ``0.2 <= WPE < WPEMAX``
  (``MEITD.py:364,389``) — note the criterion is evaluated on the *input*
  of the retrieval, so it is constant across the retrieval loop;
* ``retrieve_proper_rotation`` re-sifts a rejected rotation through the
  cubic tier until the criterion holds (first extraction, in practice) or
  the running baseline drops to <= 5 extrema (returns the input, flagged
  improper);
* the MEITD main loop alternates high-frequency extractions (from x) and
  low-frequency extractions (from the baseline of x) via the
  HILO / xchanged / soft_reset state machine, subtracting every accepted
  rotation from x; hard caps: 20 accepted components, 44 + 44 output rows;
* ``XITD`` wraps MEITD and sorts all components by ascending WPE.
  Reference quirk preserved: XITD passes its auto-computed WPEMAX
  *positionally into MEITD's (unused) max_iteration slot*
  (``MEITD.py:542``), so the gate that actually applies is the 0.6 default.
  Pass ``use_auto_wpemax=True`` for the evidently intended behavior.

The per-step kernels (cubic extraction, WPE, extrema counts) are jitted
fixed-shape TPU ops; the state machine itself is a host driver in this
round (it is control-flow-dominated and touches ~tens of iterations).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.cubic_baseline import cubic_baseline_extract
from ..ops.extrema import count_extrema
from ..ops.wpe import weighted_permutation_entropy

__all__ = ["meitd", "xitd", "retrieve_proper_rotation", "first_rotation_is_proper"]


@partial(jax.jit, static_argnames=("capacity",))
def _extract(x, capacity):
    res = cubic_baseline_extract(x, capacity, min_extrema=0)
    return res.rotation, res.baseline


@jax.jit
def _wpe(x):
    return weighted_permutation_entropy(x, order=3, normalize=True)


@jax.jit
def _count(x):
    return count_extrema(x)


# --- fused per-trip programs -------------------------------------------------
# The walk is a host state machine over ~tens of dependent device calls;
# every ``int(...)``/``float(...)`` forces a host sync (over a remote
# attachment, a full round trip).  Each state's device work is therefore
# grouped into ONE jitted program per trip — pieces a state may discard
# (e.g. the extraction when the extrema count turns out < 5) are computed
# speculatively, which is unobservable: the ops are fixed-shape and the
# host decisions use exactly the same values as the step-by-step calls.


@partial(jax.jit, static_argnames=("capacity",))
def _fused_gate(x, capacity):
    """count(x), WPE(x), and the first extraction of x in one program
    (the device work of ``first_rotation_is_proper`` +
    ``retrieve_proper_rotation``'s gate, one sync instead of three)."""
    rot, base = _extract_impl(x, capacity)
    return (count_extrema(x),
            weighted_permutation_entropy(x, order=3, normalize=True),
            rot, base)


@partial(jax.jit, static_argnames=("capacity",))
def _fused_hi_trip(x, capacity):
    """The high-frequency trip's full device work: count(x), the baseline
    of x, and the gate pieces of that baseline (count/WPE/extraction) —
    one sync for what was three dependent dispatch rounds."""
    _, baseline = _extract_impl(x, capacity)
    rotb, _ = _extract_impl(baseline, capacity)
    return (count_extrema(x), baseline, count_extrema(baseline),
            weighted_permutation_entropy(baseline, order=3, normalize=True),
            rotb)


@partial(jax.jit, static_argnames=("capacity",))
def _extract_count(x, capacity):
    """One extraction plus the extrema count of its baseline (the dig
    loop's per-iteration device work)."""
    rot, base = _extract_impl(x, capacity)
    return rot, base, count_extrema(base)


def _extract_impl(x, capacity):
    res = cubic_baseline_extract(x, capacity, min_extrema=0)
    return res.rotation, res.baseline


def _cap(n: int) -> int:
    return n + 2  # worst case: an extremum at nearly every sample


def retrieve_proper_rotation(x, wpemax: float):
    """Re-sift ``x`` until its first proper rotation emerges.

    Returns ``(rotation, flag)`` with flag 1 on success, else ``(x, 0)``
    (``MEITD.py:344-368`` semantics).

    Observational short-circuit: the reference evaluates the entropy gate
    once on the *input* (``MEITD.py:345-346``), so its re-sift loop either
    returns the FIRST extraction's rotation (gate holds — the loop exits on
    iteration one) or burns extractions until the running baseline flattens
    and returns the input unchanged (gate fails — nothing from the burn is
    observable).  Both outcomes are computed here without the loop,
    removing MEITD's deepest dependent-extraction chain."""
    x = jnp.asarray(x, jnp.float64)
    cap = _cap(x.shape[-1])
    nex = int(_count(x))
    if nex <= 5:  # reference: nex<5 bails before the loop; nex==5 skips it
        return x, 0
    if not bool(0.2 <= float(_wpe(x)) < wpemax):
        return x, 0
    rotation, _ = _extract(x, cap)
    return rotation, 1


def first_rotation_is_proper(x, wpemax: float):
    """One cubic extraction + the entropy gate.

    Returns ``(rotation, baseline, flag)``; with < 5 extrema returns
    ``(x, zeros, 0)`` (``MEITD.py:371-392``)."""
    x = jnp.asarray(x, jnp.float64)
    cap = _cap(x.shape[-1])
    if int(_count(x)) < 5:
        return x, jnp.zeros_like(x), 0
    rotation, baseline = _extract(x, cap)
    ok = bool(0.2 <= float(_wpe(x)) < wpemax)
    return rotation, baseline, 1 if ok else 0


def meitd(data, max_iteration: int = 40, wpemax: float = 0.6):
    """Maximal-extraction ensemble ITD.

    Returns ``(high_rotations, low_rotations, residual)``; the component
    caps (20 accepted, 44+44 rows) and the HILO/xchanged/soft_reset walk
    follow ``MEITD.py:395-534``.  ``max_iteration`` is accepted for API
    parity; like the reference, the 20-component cap is what binds.
    """
    del max_iteration
    x = jnp.asarray(data, jnp.float64)
    n = x.shape[-1]
    high: list = []
    low: list = []
    cap = _cap(n)

    def gate(w):
        return 1 if 0.2 <= float(w) < wpemax else 0

    # pre-loop: first_rotation_is_proper(x) + count(x), one sync
    nex0, wpe0, rot0, base0 = _fused_gate(x, cap)
    nex = int(nex0)
    if nex < 5:
        rotation, baseline, proper = x, jnp.zeros_like(x), 0
    else:
        rotation, baseline, proper = rot0, base0, gate(wpe0)
    xchanged, hilo, soft_reset = 0, 1, 1
    if nex < 4:
        # reference quirk (MEITD.py:401,413-414): < 4 extrema returns TWO
        # zero components (its 1-D ``zero_sum`` rows, normalized here to
        # the (1, n) row shape the non-degenerate path uses), NOT empty
        # stacks — XITD consumers see 3 rows.  4 <= nex <= 5 still falls
        # through to the while (which it skips) and returns empty stacks.
        return jnp.zeros((1, n)), jnp.zeros((1, n)), x

    while nex > 5:
        if len(high) + len(low) > 20:
            break
        if proper == 0:
            # retrieve_proper_rotation, one sync (gate on the input; the
            # reference's re-sift burn is unobservable — see above)
            rnex, rwpe, rrot, _ = _fused_gate(rotation, cap)
            if int(rnex) > 5 and gate(rwpe):
                rotation, proper = rrot, 1
        if proper == 1:
            (high if hilo == 1 else low).append(np.asarray(rotation))
            soft_reset = 0
            x = x - rotation
            xchanged = 1

        if xchanged == 1 and hilo == 1:
            nex_x, base_c, nexb, wpeb, rotb = _fused_hi_trip(x, cap)
            nex = int(nex_x)
            if nex < 5:
                continue
            baseline = base_c
            if int(nexb) < 5:
                rotation, proper = baseline, 0
            else:
                rotation, proper = rotb, gate(wpeb)
            xchanged, hilo = 0, 0
            continue
        elif hilo == 1:
            nexb, wpeb, rotb, _ = _fused_gate(baseline, cap)
            if int(nexb) < 5:
                rotation, proper = baseline, 0
            else:
                rotation, proper = rotb, gate(wpeb)
            hilo = 0
            continue

        if xchanged == 1 and hilo == 0:
            nex_x, wpe_x, rot_x, base_x = _fused_gate(x, cap)
            nex = int(nex_x)
            if nex < 5:
                continue
            rotation, baseline, proper = rot_x, base_x, gate(wpe_x)
            xchanged, hilo = 0, 1
            continue

        if xchanged == 0 and hilo == 0:
            # dig: decompose successively deeper baselines
            if soft_reset == 0:
                rotation, baseline, nexb = _extract_count(x, cap)
                soft_reset = 1
                nex = int(nexb)
            else:
                nex = int(_count(baseline))
            if nex < 5:
                continue
            for _ in range(soft_reset):
                rotation, baseline, nexb = _extract_count(baseline, cap)
                nex = int(nexb)
                if nex < 5:
                    break
            soft_reset += 1
            continue

    hi = jnp.asarray(np.stack(high)) if high else jnp.zeros((0, n))
    lo = jnp.asarray(np.stack(low)) if low else jnp.zeros((0, n))
    return hi, lo, x


def xitd(data, *, use_auto_wpemax: bool = False):
    """Auto-parameter MEITD returning all components sorted by ascending WPE
    (``MEITD.py:536-549``)."""
    x = jnp.asarray(data, jnp.float64)
    if use_auto_wpemax:
        m = float(jnp.mean(x))
        sd = float(jnp.std(x))
        snr = 0.0 if sd == 0 else m / sd
        wpemax = float(np.log(abs(20 * np.log10(abs(snr))))) if snr != 0 else 0.6
        hi, lo, resid = meitd(x, wpemax=wpemax)
    else:
        # reference behavior: the auto WPEMAX lands in the unused slot
        hi, lo, resid = meitd(x)
    rows = jnp.concatenate([hi, lo, resid[None, :]], axis=0)
    ent = jax.vmap(lambda r: weighted_permutation_entropy(r, 3, normalize=True))(rows)
    order = jnp.argsort(ent)
    return rows[order]
