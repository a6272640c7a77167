"""Tridiagonal solvers and cubic-spline moment systems on padded knot buffers.

All vectorized over arbitrary batch axes on fixed-capacity knot buffers:

* :func:`reference_spline_moments` — bit-for-bit the recurrence the
  reference's native tier runs (``/root/reference/itd.cpp:117-137`` and its
  numba port ``itd_fourier_decomposition.py:86-107``).  Note this recurrence
  is *not* a mathematically exact Thomas elimination (the superdiagonal is
  never normalized by the pivot); it is reproduced deliberately because the
  reference's outputs depend on it.  Sequential scan — only used at the
  template tier's tiny knot counts.
* :func:`thomas_solve` — the exact Thomas algorithm as a masked
  ``lax.scan``: the right shape when knot counts are small and the batch is
  wide.
* :func:`pcr_solve` — parallel cyclic reduction: log-depth full-vector
  rounds, the right shape when knot counts are large (noise-driven extrema
  densities reach ~2n/3).
* :func:`spline_moments` — second-derivative (moment) system of an
  interpolating cubic spline with ``natural`` or ``not-a-knot`` boundary
  conditions; ``not-a-knot`` matches scipy's ``splrep(k=3, s=0)`` behavior
  that the reference's MEITD/2-D tiers rely on
  (``/root/reference/MEITD.py:131-146``).  Picks Thomas or PCR by capacity.

Buffers are fixed-capacity with a per-batch-element ``count``; lanes at or
beyond ``count`` are inert (identity scan steps, guarded denominators).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

# truncation depth of reference_spline_moments' "banded" method: a
# 2^6 = 64-knot exact window (see _affine_scan_banded's decay argument)
_BANDED_ROUNDS = 6

__all__ = ["reference_spline_moments", "thomas_solve", "pcr_solve",
           "spline_moments"]

# above this capacity the sequential Thomas scan (O(cap) dependent steps)
# loses to log-depth parallel cyclic reduction on full vectors on CPU.
# On TPU a compiled scan still serializes cap dependent steps while PCR
# is log-depth full-vector work, so PCR is preferred at ANY capacity
# there (measured neutral at tiny caps — other per-row overheads
# dominate — and strictly better from mid-size caps up).
_PCR_MIN_CAP = 1024


def _prefer_pcr(cap: int) -> bool:
    return cap >= _PCR_MIN_CAP or jax.default_backend() == "tpu"


def _arange_like(x: jax.Array) -> jax.Array:
    return lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)


def _safe_div(a, b):
    return a / jnp.where(b == 0, jnp.ones_like(b), b)


def _affine_scan(A, B, reverse=False):
    """Log-depth evaluation of ``c_i = A_i + B_i * c_{i-1}`` (zero init)
    along the last axis via ``lax.associative_scan`` of affine-map
    composition.  Matches the sequential recurrence up to reassociation
    roundoff (products of the B factors are reassociated)."""
    def comp(f, g):
        # g after f: g(f(x)) = (gA + gB * fA) + (gB * fB) * x
        fA, fB = f
        gA, gB = g
        return gA + gB * fA, gB * fB

    outA, _ = lax.associative_scan(comp, (A, B), axis=A.ndim - 1,
                                   reverse=reverse)
    return outA


def _affine_scan_banded(A, B, rounds, reverse=False):
    """:func:`_affine_scan` TRUNCATED to ``rounds`` doubling steps: exact
    for all contributions within a ``2^rounds``-element window; older
    terms are weighted by products of ``2^rounds`` consecutive ``B``
    factors, which for the spline recurrences (|B| ~ h-ratio-bounded,
    ~0.5 at uniform spacings) decay below even f64 roundoff at
    ``rounds=6`` (0.5^64 ~ 5e-20; measured 2e-7 = f32-roundoff-limited
    across every sine-template comb entry).  ``rounds`` < ceil(log2(cap))
    is the whole point — each skipped round saves one full-vector pass."""
    axis = A.ndim - 1
    size = A.shape[axis]
    c, Bp = A, B

    def shift(arr, sh, fill):
        pad_shape = arr.shape[:axis] + (sh,) + arr.shape[axis + 1:]
        pad = jnp.full(pad_shape, fill, arr.dtype)
        if reverse:
            sl = lax.slice_in_dim(arr, sh, size, axis=axis)
            return jnp.concatenate([sl, pad], axis=axis)
        sl = lax.slice_in_dim(arr, 0, size - sh, axis=axis)
        return jnp.concatenate([pad, sl], axis=axis)

    for s in range(rounds):
        sh = 1 << s
        if sh >= size:
            break
        c = c + Bp * shift(c, sh, 0.0)
        Bp = Bp * shift(Bp, sh, 0.0)
    return c


def reference_spline_moments(knots: jax.Array, h: jax.Array, count: jax.Array,
                             method: str = "auto") -> jax.Array:
    """Moment vector ``b`` exactly as the reference native tier computes it.

    ``knots[..., c]``: knot values (slot ``count`` participates — the
    reference reads one slot past the valid range, which in its zero-padded
    buffers resolves to ``x[0]``; callers prepare that slot accordingly).
    ``h[..., c]``: knot spacings ``pos[k+1] - pos[k]``.
    ``count``: number of valid knots (the reference's ``idx``).

    Active index range is ``1 <= i <= count-1`` for the forward pass and
    ``count-2 >= i >= 0`` for the backward pass; afterwards ``b[0]`` and
    ``b[count-1]`` are forced to zero (the numba port's natural-end fix,
    ``itd_fourier_decomposition.py:104-107``).

    ``method``: "scan" — the sequential recurrence, bit-for-bit the
    reference's arithmetic order; "affine" — both passes are first-order
    AFFINE recurrences (their denominators never touch the carry), so
    they run as log-depth ``lax.associative_scan``s of affine-map
    composition — same recurrence, reassociation-level roundoff deltas
    only (pinned in tests); "banded" — the affine doubling truncated to
    ``_BANDED_ROUNDS`` rounds (the recurrence's propagator decays
    exponentially, so contributions beyond a 64-knot window sit below
    f64 roundoff — see ``_affine_scan_banded``; pinned vs "affine" in
    tests), ~3x fewer full-vector passes at template-comb knot counts;
    "auto" — affine on TPU (a sequential scan over ~1M template knots
    serializes ~1M dependent steps there), scan elsewhere.
    """
    cap = knots.shape[-1]
    idx = _arange_like(knots)
    cnt = count[..., None] if count.ndim == knots.ndim - 1 else count

    h_im1 = jnp.concatenate([jnp.zeros_like(h[..., :1]), h[..., :-1]], axis=-1)
    k_ip1 = jnp.concatenate([knots[..., 1:], jnp.zeros_like(knots[..., :1])], axis=-1)
    k_im1 = jnp.concatenate([jnp.zeros_like(knots[..., :1]), knots[..., :-1]], axis=-1)

    u = _safe_div(h_im1, h_im1 + h)
    v = 1.0 - u
    rhs = 6.0 * _safe_div(
        _safe_div(k_ip1 - knots, h) - _safe_div(knots - k_im1, h_im1), h_im1 + h
    )
    active = (idx >= 1) & (idx < cnt)
    u = jnp.where(active, u, jnp.zeros_like(u))
    v = jnp.where(active, v, jnp.zeros_like(v))
    b0 = jnp.where(active, rhs, jnp.zeros_like(rhs))

    # Forward pass: b[i] = (b[i] - u[i]*b[i-1]) / (2 - u[i]*v[i-1]).
    # v enters UN-normalized — that is the reference's recurrence.
    v_im1 = jnp.concatenate([jnp.zeros_like(v[..., :1]), v[..., :-1]], axis=-1)

    if method == "auto":
        method = "affine" if jax.default_backend() == "tpu" else "scan"
    if method not in ("scan", "affine", "banded"):
        raise ValueError(f"unknown method: {method!r}")

    mv = lambda a: jnp.moveaxis(a, -1, 0)

    def rev(a):
        return jnp.flip(a, axis=-1)

    if method in ("affine", "banded"):
        fscan = (_affine_scan if method == "affine" else
                 partial(_affine_scan_banded, rounds=_BANDED_ROUNDS))
        # the forward carry is affine in its predecessor:
        #   active:   c' = b0/d + (-u/d) * c      (d is carry-free)
        #   inactive: c' = c                       (A=0, B=1)
        d = 2.0 - u * v_im1
        A = jnp.where(active, _safe_div(b0, d), jnp.zeros_like(b0))
        B = jnp.where(active, _safe_div(-u, d), jnp.ones_like(u))
        c = fscan(A, B)
        b_f = jnp.where(active, c, b0)

        # backward carry (reverse order) is also affine:
        #   active (i <= count-2): c' = b_f[i] - v[i] * c
        #   inactive:              c' = b_f[i]  (B=0); output = carry
        act_bwd = idx <= (cnt - 2)
        A2 = b_f
        B2 = jnp.where(act_bwd, -v, jnp.zeros_like(v))
        b = fscan(A2, B2, reverse=True)
    else:
        def fwd(carry, xs):
            b_i, u_i, v_prev, act = xs
            d = 2.0 - u_i * v_prev
            new = _safe_div(b_i - u_i * carry, d)
            b_out = jnp.where(act, new, b_i)
            return jnp.where(act, b_out, carry), b_out

        _, b_f = lax.scan(
            fwd,
            jnp.zeros_like(knots[..., 0]),
            (mv(b0), mv(u), mv(v_im1), mv(active)),
        )
        b_f = jnp.moveaxis(b_f, 0, -1)

        # Backward pass: b[i] -= v[i] * b[i+1], active for i <= count-2.
        act_bwd = idx <= (cnt - 2)

        init = jnp.zeros_like(knots[..., 0])
        # walk from the top; inactive steps pass b[i] through as the
        # carry so the first active step (i = count-2) sees b[count-1]
        # from the forward pass, exactly like the reference's
        # back-substitution seed.
        def bwd_seed(carry, xs):
            b_i, v_i, act = xs
            new = b_i - v_i * carry
            b_out = jnp.where(act, new, b_i)
            return b_out, b_out

        _, b_b = lax.scan(
            bwd_seed,
            init,
            (mv(rev(b_f)), mv(rev(v)), mv(rev(act_bwd))),
        )
        b = rev(jnp.moveaxis(b_b, 0, -1))

    # force natural ends (b[0] = b[count-1] = 0)
    b = jnp.where((idx == 0) | (idx == cnt - 1), jnp.zeros_like(b), b)
    del cap
    return b


def thomas_solve(lower: jax.Array, diag: jax.Array, upper: jax.Array, rhs: jax.Array,
                 count: jax.Array | None = None) -> jax.Array:
    """Exact Thomas elimination for batched tridiagonal systems.

    Solves ``lower[i]*x[i-1] + diag[i]*x[i] + upper[i]*x[i+1] = rhs[i]`` for
    ``i < count`` (full capacity if ``count`` is None).  Lanes >= count are
    inert and return 0.
    """
    cap = diag.shape[-1]
    idx = _arange_like(diag)
    if count is None:
        cnt = jnp.full(diag.shape[:-1] + (1,), cap, jnp.int32)
    else:
        cnt = count[..., None] if count.ndim == diag.ndim - 1 else count
    active = idx < cnt

    mv = lambda a: jnp.moveaxis(a, -1, 0)

    def fwd(carry, xs):
        cp, dp = carry  # c'[i-1], d'[i-1]
        a, b, c, d, act = xs
        denom = b - a * cp
        denom = jnp.where(denom == 0, jnp.ones_like(denom), denom)
        cp_new = c / denom
        dp_new = (d - a * dp) / denom
        cp_new = jnp.where(act, cp_new, jnp.zeros_like(cp_new))
        dp_new = jnp.where(act, dp_new, jnp.zeros_like(dp_new))
        return (cp_new, dp_new), (cp_new, dp_new)

    zero = jnp.zeros_like(diag[..., 0])
    _, (cps, dps) = lax.scan(
        fwd, (zero, zero), (mv(lower), mv(diag), mv(upper), mv(rhs), mv(active))
    )
    cps = jnp.moveaxis(cps, 0, -1)
    dps = jnp.moveaxis(dps, 0, -1)

    last = idx == (cnt - 1)

    def bwd(carry, xs):
        cp, dp, is_last, act = xs
        x_i = dp - cp * carry
        x_i = jnp.where(is_last, dp, x_i)
        x_i = jnp.where(act, x_i, jnp.zeros_like(x_i))
        return jnp.where(act, x_i, carry), x_i

    def rev(a):
        return jnp.flip(a, axis=-1)

    _, xs = lax.scan(bwd, zero, (mv(rev(cps)), mv(rev(dps)), mv(rev(last)), mv(rev(active))))
    return rev(jnp.moveaxis(xs, 0, -1))


def pcr_solve(lower: jax.Array, diag: jax.Array, upper: jax.Array,
              rhs: jax.Array) -> jax.Array:
    """Parallel cyclic reduction for batched tridiagonal systems — the
    log-depth, full-vector TPU shape (a ``lax.scan`` Thomas elimination is
    a sequential dependence chain over the knot axis; at the MEITD tier's
    noise-driven knot counts that chain reaches ~1M steps).

    Inactive lanes must already be identity rows (``lower=upper=rhs=0,
    diag=1``) — exactly how :func:`spline_moments` masks its systems, which
    also keeps independent per-batch blocks decoupled.  Requires diagonal
    dominance for stability; spline moment systems are strictly dominant
    (diag = 2(h_{i-1}+h_i) vs off-diagonals h).

    Each round eliminates couplings at distance ``2^k`` by absorbing the
    neighbor rows; after ``ceil(log2(cap))`` rounds the system is diagonal.
    """
    cap = diag.shape[-1]
    a, b, c, d = lower, diag, upper, rhs

    def shift_r(x, s, fill):
        pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
        return jnp.concatenate([pad, x[..., :-s]], axis=-1)

    def shift_l(x, s, fill):
        pad = jnp.full(x.shape[:-1] + (s,), fill, x.dtype)
        return jnp.concatenate([x[..., s:], pad], axis=-1)

    steps = max(1, int(cap - 1).bit_length())
    for k in range(steps):
        s = 1 << k
        if s >= cap:
            break
        b_m = shift_r(b, s, 1.0)
        c_m = shift_r(c, s, 0.0)
        d_m = shift_r(d, s, 0.0)
        a_m = shift_r(a, s, 0.0)
        b_p = shift_l(b, s, 1.0)
        a_p = shift_l(a, s, 0.0)
        d_p = shift_l(d, s, 0.0)
        c_p = shift_l(c, s, 0.0)
        alpha = -_safe_div(a, b_m)
        beta = -_safe_div(c, b_p)
        b = b + alpha * c_m + beta * a_p
        d = d + alpha * d_m + beta * d_p
        a = alpha * a_m
        c = beta * c_p
    return _safe_div(d, b)


def spline_moments(pos: jax.Array, val: jax.Array, count: jax.Array, *,
                   bc: str = "natural") -> jax.Array:
    """Second derivatives M of the cubic interpolant through
    ``(pos[k], val[k])`` for ``k < count``, with the requested boundary
    condition.  ``pos`` is float (or int; cast internally).

    not-a-knot folds the third-derivative-continuity end rows into the
    interior tridiagonal system by eliminating M[0] and M[count-1]:
        M0 = M1 + (h0/h1)(M1 - M2),   M_last analogously.
    """
    if bc not in ("natural", "not-a-knot"):
        raise ValueError(bc)
    # integer positions: difference FIRST (exact at any n), cast once —
    # casting each position individually would round above 2^24 in f32
    if jnp.issubdtype(pos.dtype, jnp.integer):
        h = jnp.concatenate(
            [(pos[..., 1:] - pos[..., :-1]).astype(val.dtype),
             jnp.ones_like(val[..., :1])], axis=-1)
    else:
        pos = pos.astype(val.dtype)
        h = jnp.concatenate(
            [pos[..., 1:] - pos[..., :-1], jnp.ones_like(pos[..., :1])],
            axis=-1)
    idx = _arange_like(val)
    cnt = count[..., None] if count.ndim == val.ndim - 1 else count

    h = jnp.where(idx < cnt - 1, h, jnp.ones_like(h))  # guard padded spacings
    h_im1 = jnp.concatenate([jnp.ones_like(h[..., :1]), h[..., :-1]], axis=-1)

    v_ip1 = jnp.concatenate([val[..., 1:], jnp.zeros_like(val[..., :1])], axis=-1)
    v_im1 = jnp.concatenate([jnp.zeros_like(val[..., :1]), val[..., :-1]], axis=-1)
    rhs = 6.0 * (_safe_div(v_ip1 - val, h) - _safe_div(val - v_im1, h_im1))

    lower = h_im1
    diag = 2.0 * (h_im1 + h)
    upper = h

    interior = (idx >= 1) & (idx < cnt - 1)

    if bc == "natural":
        # M[0] = M[count-1] = 0: plain interior system.
        lower_s = jnp.where(interior, lower, jnp.zeros_like(lower))
        diag_s = jnp.where(interior, diag, jnp.ones_like(diag))
        upper_s = jnp.where(interior, upper, jnp.zeros_like(upper))
        rhs_s = jnp.where(interior, rhs, jnp.zeros_like(rhs))
        # kill the couplings that reach M[0]/M[count-1]
        lower_s = jnp.where(idx == 1, jnp.zeros_like(lower_s), lower_s)
        upper_s = jnp.where(idx == cnt - 2, jnp.zeros_like(upper_s), upper_s)
        solve = pcr_solve if _prefer_pcr(diag.shape[-1]) else thomas_solve
        m = solve(lower_s, diag_s, upper_s, rhs_s)
        return jnp.where(interior, m, jnp.zeros_like(m))

    # not-a-knot: eliminate M0 = ((h0+h1) M1 - h0 M2) / h1 into row i=1 and
    # the mirrored relation into row i = count-2.
    h0 = jnp.take_along_axis(h, jnp.zeros_like(cnt), axis=-1)
    h1 = jnp.take_along_axis(h, jnp.ones_like(cnt), axis=-1)
    hl = jnp.take_along_axis(h, jnp.maximum(cnt - 2, 0), axis=-1)   # last interval
    hl2 = jnp.take_along_axis(h, jnp.maximum(cnt - 3, 0), axis=-1)  # second-to-last

    # (accurate for count >= 5; MEITD's drivers guarantee > 5 extrema)
    # row 1: lower*M0 -> substitute
    diag_s = jnp.where(idx == 1, diag + lower * _safe_div(h0 + h1, h1), diag)
    upper_s = jnp.where(idx == 1, upper - lower * _safe_div(h0, h1), upper)
    lower_s = jnp.where(idx == 1, jnp.zeros_like(lower), lower)
    # row count-2: upper*M_{cnt-1} -> substitute
    # M_{cnt-1} = M_{cnt-2} + (hl/hl2)(M_{cnt-2} - M_{cnt-3})
    diag_s = jnp.where(idx == cnt - 2, diag_s + upper_s * _safe_div(hl + hl2, hl2), diag_s)
    lower_s = jnp.where(idx == cnt - 2, lower_s - upper_s * _safe_div(hl, hl2), lower_s)
    upper_s = jnp.where(idx == cnt - 2, jnp.zeros_like(upper_s), upper_s)

    lower_s = jnp.where(interior, lower_s, jnp.zeros_like(lower_s))
    diag_s = jnp.where(interior, diag_s, jnp.ones_like(diag_s))
    upper_s = jnp.where(interior, upper_s, jnp.zeros_like(upper_s))
    rhs_s = jnp.where(interior, rhs, jnp.zeros_like(rhs))
    solve = pcr_solve if _prefer_pcr(diag.shape[-1]) else thomas_solve
    m = solve(lower_s, diag_s, upper_s, rhs_s)
    m = jnp.where(interior, m, jnp.zeros_like(m))

    m1 = jnp.take_along_axis(m, jnp.ones_like(cnt), axis=-1)
    m2 = jnp.take_along_axis(m, 2 * jnp.ones_like(cnt), axis=-1)
    m0 = m1 + _safe_div(h0, h1) * (m1 - m2)
    ml1 = jnp.take_along_axis(m, jnp.maximum(cnt - 2, 0), axis=-1)
    ml2 = jnp.take_along_axis(m, jnp.maximum(cnt - 3, 0), axis=-1)
    ml = ml1 + _safe_div(hl, hl2) * (ml1 - ml2)
    m = jnp.where(idx == 0, m0, m)
    m = jnp.where(idx == cnt - 1, ml, m)
    return m
