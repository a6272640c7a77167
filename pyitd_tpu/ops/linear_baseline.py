"""Canonical ITD baseline extraction — linear-in-value interpolation tier.

Behavioral contract (from ``/root/reference/ITD.py:79-121``, the tier used by
the canonical sift and the PyITD.ipynb demo):

* knot set = {0} ∪ interior extrema ∪ {N-1};
* end knots: ``B_first = mean(x[:2])``, ``B_last = mean(x[-2:])``
  (``ITD.py:100-102``);
* interior knots use the Frei-Osorio formula with α = 0.5
  (``ITD.py:106-110``)::

      B_k = α·(x[τ_{k-1}] + (τ_k − τ_{k-1})/(τ_{k+1} − τ_{k-1})
                 · (x[τ_{k+1}] − x[τ_{k-1}]))  +  α·x[τ_k]

  where neighbor positions τ_{k±1} include the 0 / N-1 end knots;
* between knots the baseline is linear **in the signal's value**, not in
  time (``ITD.py:114-117``)::

      B[t] = B_k + (B_{k+1} − B_k)/(x[τ_{k+1}] − x[τ_k]) · (x[t] − x[τ_k])

  for t ∈ [τ_k, τ_{k+1});
* quirk preserved by default: the reference's segment loop never writes the
  final sample, so ``B[N-1] == 0`` and the rotation ends at ``x[N-1]``
  (``ITD.py:114-117`` — slices exclude the right endpoint).  Pass
  ``endpoint_mode="natural"`` to instead evaluate the last segment's formula
  at N-1.
* deliberate guard (SURVEY.md §7 hard-part b): where adjacent knot values are
  equal the reference divides by zero; we emit a flat segment (slope 0)
  instead.  Generic signals never hit this; tests document the delta.

Two numerically identical backends:

* ``"gather"`` — cummax/cummin knot indices + per-sample gathers.  Fast on
  CPU; on TPU the million-element gathers along the lane axis are
  pathologically slow.
* ``"scan"`` — gather-free: every per-sample knot quantity comes from
  multi-channel masked fills via ``lax.associative_scan`` (elementwise
  log-passes).  ~40x faster per level on TPU v5e.

``backend="auto"`` picks by platform.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .extrema import extrema_mask, count_extrema
from .fill import (
    prev_index,
    next_index,
    take_last_axis,
    forward_fill2_scan,
    backward_fill2_scan,
    backward_fill_scan,
)

__all__ = ["linear_baseline_extract", "LinearBaselineResult"]


class LinearBaselineResult(NamedTuple):
    rotation: jax.Array
    baseline: jax.Array
    num_extrema: jax.Array  # interior extrema count (int32), per batch elem
    sub_err: jax.Array      # exact residual of rotation = fl(x - baseline)


def two_sum_err(a: jax.Array, b: jax.Array, s: jax.Array) -> jax.Array:
    """Exact rounding residual of ``s = fl(a + b)`` (Knuth two-sum,
    branchless).  The single shared definition — the compensation
    channels of the sift drivers (``decomp/itd.py``,
    ``parallel/sharded.py``) import it from here; its correctness
    depends on XLA not reassociating the cancellation pattern."""
    bb = s - a
    return (a - (s - bb)) + (b - bb)


_two_sum_err = two_sum_err  # backward-compat private alias


def _knot_mask(x: jax.Array) -> jax.Array:
    n = x.shape[-1]
    mask = extrema_mask(x)
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    return mask | (it == 0) | (it == n - 1)


def _interp(x, it, n, b_l, x_l, b_r, x_r, endpoint_mode):
    den = x_r - x_l
    slope = jnp.where(
        den == 0,
        jnp.zeros_like(den),
        (b_r - b_l) / jnp.where(den == 0, jnp.ones_like(den), den),
    )
    baseline = b_l + slope * (x - x_l)
    if endpoint_mode == "reference":
        baseline = jnp.where(it == n - 1, jnp.zeros_like(baseline), baseline)
    return baseline


def _knot_values(x, it, n, prev_x, next_x, prev_pos, next_pos):
    # positions are i32 indices: difference FIRST (exact at any n), cast
    # once — casting each position individually would round above 2^24
    # in f32 and skew the weight
    span = (next_pos - prev_pos).astype(x.dtype)
    w = (it - prev_pos).astype(x.dtype) / jnp.where(
        span == 0, jnp.ones_like(span), span
    )
    knot_val = 0.5 * (prev_x + w * (next_x - prev_x)) + 0.5 * x
    b_first = 0.5 * (x[..., 0] + x[..., 1])
    b_last = 0.5 * (x[..., n - 2] + x[..., n - 1])
    knot_val = jnp.where(it == 0, b_first[..., None], knot_val)
    knot_val = jnp.where(it == n - 1, b_last[..., None], knot_val)
    return knot_val


def _baseline_gather(x, knots, it, n, endpoint_mode):
    prev_excl = prev_index(knots, inclusive=False)
    next_excl = next_index(knots, inclusive=False)
    knot_val = _knot_values(
        x, it, n,
        take_last_axis(x, prev_excl), take_last_axis(x, next_excl),
        prev_excl, next_excl,
    )
    seg_l = prev_index(knots, inclusive=True)
    seg_r = next_excl
    return _interp(
        x, it, n,
        take_last_axis(knot_val, seg_l), take_last_axis(x, seg_l),
        take_last_axis(knot_val, seg_r), take_last_axis(x, seg_r),
        endpoint_mode,
    )


def _shift_left(a, fill):
    tail = jnp.full_like(a[..., :1], fill)
    return jnp.concatenate([a[..., 1:], tail], axis=-1)


def _baseline_scan(x, knots, it, n, endpoint_mode):
    """Two fill2 scans deliver, per sample, the four knots surrounding its
    segment: (p2, p1) at-or-before via a forward fill2, (n1, n2) strictly
    after via a backward fill2 over one-shifted inputs.  The knot-value
    formula then needs no further propagation:

        B(p1) from neighbors (p2, n1);  B(n1) from neighbors (p1, n2).
    """
    dtype = x.dtype
    posf = it.astype(dtype)

    (p1_pos, p1_x), (p2_pos, p2_x), _ = forward_fill2_scan(
        (posf, x), knots, (0.0, 0.0)
    )
    (n1_pos, n1_x), (n2_pos, n2_x), _ = backward_fill2_scan(
        (_shift_left(posf, 0.0), _shift_left(x, 0.0)),
        _shift_left(knots, False),
        (0.0, 0.0),
    )

    def knot_value(pos, val, left_pos, left_x, right_pos, right_x, end_val, is_first):
        span = right_pos - left_pos
        w = (pos - left_pos) / jnp.where(span == 0, jnp.ones_like(span), span)
        formula = 0.5 * (left_x + w * (right_x - left_x)) + 0.5 * val
        return jnp.where(is_first, end_val[..., None], formula)

    b_first = 0.5 * (x[..., 0] + x[..., 1])
    b_last = 0.5 * (x[..., n - 2] + x[..., n - 1])

    b_l = knot_value(p1_pos, p1_x, p2_pos, p2_x, n1_pos, n1_x, b_first, p1_pos == 0)
    b_l = jnp.where(p1_pos == n - 1, b_last[..., None], b_l)
    b_r = knot_value(n1_pos, n1_x, p1_pos, p1_x, n2_pos, n2_x, b_last, n1_pos == n - 1)
    return _interp(x, it, n, b_l, p1_x, b_r, n1_x, endpoint_mode)


def _baseline_pallas(x, knots, it, n, endpoint_mode):
    """Fused Pallas path (f32, TPU): a forward fill2 kernel, then one
    reverse kernel that runs the backward fill *and* the knot-value +
    interpolation epilogue in-VMEM (math identical to
    :func:`_baseline_scan`).  The knot mask and positions are derived
    in-kernel; block-edge neighbors arrive as SMEM scalars so every index
    map stays affine and the DMA pipeline keeps double-buffering.  HBM per
    level: x + 4 forward channels read, baseline written."""
    from .pallas_fill import linear_level_pallas

    del knots, it
    lead = x.shape[:-1]
    x2 = x.reshape(-1, n)

    # off-TPU the Mosaic kernel can't compile; interpret mode keeps the
    # backend selectable (and CI-testable) everywhere.  Above 2^24 the
    # kernels switch to i32 bit-pattern position channels (exact at any
    # n — ops/pallas_fill.py `_enc_pos`).
    import os as _os

    encode = n > (1 << 24) or bool(_os.environ.get("PYITD_FORCE_POS_BITS"))
    interp = jax.default_backend() != "tpu"
    baseline, rotation, err, nex = linear_level_pallas(
        x2, endpoint_mode=endpoint_mode, interpret=interp, encode=encode
    )

    def unflat(a):
        return a.reshape(lead + (n,))

    if x.dtype == jnp.float32:
        return LinearBaselineResult(
            rotation=unflat(rotation), baseline=unflat(baseline),
            num_extrema=nex.reshape(lead), sub_err=unflat(err),
        )
    # non-f32 inputs (forced-pallas tests): keep the f32 baseline but make
    # rotation/err exact in the input precision, as the telescoping
    # reconstruction requires
    baseline = unflat(baseline).astype(x.dtype)
    rotation = x - baseline
    err = _two_sum_err(x, -baseline, rotation)
    return LinearBaselineResult(
        rotation=rotation, baseline=baseline,
        num_extrema=nex.reshape(lead), sub_err=err,
    )


def linear_baseline_extract(
    x: jax.Array, *, endpoint_mode: str = "reference", backend: str = "auto"
) -> LinearBaselineResult:
    """One level of canonical ITD: returns (rotation, baseline, num_extrema,
    sub_err) — sub_err is the exact rounding residual of the stored
    rotation, consumed by the sift's compensated reconstruction."""
    if endpoint_mode not in ("reference", "natural"):
        raise ValueError(f"unknown endpoint_mode: {endpoint_mode!r}")
    n = x.shape[-1]
    if backend == "auto":
        if jax.default_backend() == "cpu":
            backend = "gather"
        elif (jax.default_backend() == "tpu"
              and x.dtype == jnp.float32 and n >= 4096):
            # only TPU runs the Mosaic kernel compiled; elsewhere the
            # pallas path would fall back to interpret mode — far slower
            # than the scan backend
            backend = "pallas"
        else:
            backend = "scan"
    if backend not in ("gather", "scan", "pallas"):
        raise ValueError(f"unknown backend: {backend!r}")
    # Position exactness: the scan backend (for f32 inputs) carries knot
    # positions in f32 value channels — exact only to 2^24, aliasing
    # silently past it, so refuse.  The pallas backend switches to i32
    # bit-pattern position channels above 2^24 (exact to POS_BITS_MAX_N);
    # the gather backend selects by integer index and is exact at any n.
    if n > (1 << 24) and backend == "scan" and x.dtype == jnp.float32:
        raise ValueError(
            f"n={n} exceeds the f32 knot-position ceiling (2^24={1 << 24}) "
            f"of the {backend!r} backend; use backend='gather' or a "
            "float64 input with backend='scan'."
        )
    if backend == "pallas":
        from .pallas_fill import POS_BITS_MAX_N

        if n > POS_BITS_MAX_N:
            raise ValueError(
                f"n={n} exceeds the bit-pattern position ceiling "
                f"({POS_BITS_MAX_N}) of the pallas backend; use "
                "backend='gather'."
            )

    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)

    if backend == "pallas":
        return _baseline_pallas(x, None, it, n, endpoint_mode)

    knots = _knot_mask(x)
    fn = {"gather": _baseline_gather, "scan": _baseline_scan}[backend]
    baseline = fn(x, knots, it, n, endpoint_mode)

    nex = count_extrema(x)
    rotation = x - baseline
    return LinearBaselineResult(
        rotation=rotation, baseline=baseline, num_extrema=nex,
        sub_err=_two_sum_err(x, -baseline, rotation),
    )


# ---------------------------------------------------------------------------
# structural VJP: a hand-written backward for one linear-baseline level.
# jax.grad THROUGH the level otherwise differentiates the fill scans
# (AD-of-associative-scan), which measured 66x the fused forward for the
# full sift at 8x1M on v5e.  The level is linear in x except the
# segment-slope quotient, so its exact adjoint is: per-sample cotangent
# products, segment sums into the knot sites (scatter-add), and the
# Frei-Osorio knot-value coefficients pushed to the knot neighbors —
# O(n) with no scan differentiation.  The knot STRUCTURE (masks/indices)
# is x-a.e.-constant and treated as such, exactly like AD of the
# where/select formulation.
# ---------------------------------------------------------------------------


def _shift_right(a, fill):
    head = jnp.full_like(a[..., :1], fill)
    return jnp.concatenate([head, a[..., :-1]], axis=-1)


def _zs4(z_bl, z_xl, z_br, z_xr):
    """Exclusive running sums Zs[t] = sum(z[:t]) of four channels plus
    their totals — the scan route's segment-sum substrate (segment sums
    are then differences of these read back at the neighbor knots).  One
    batched cumsum: four separate 8x1M cumsums measured ~1.8 ms each on
    v5e; one 4x8x1M call amortizes the pass overhead."""
    z = jnp.stack([z_bl, z_xl, z_br, z_xr], axis=0)
    c = jnp.cumsum(z, axis=-1)
    excl = jnp.concatenate(
        [jnp.zeros_like(c[..., :1]), c[..., :-1]], axis=-1)
    return excl, c[..., -1:]


def _structural_level_bwd(x, g_rot, g_base, g_err, endpoint_mode,
                          fills="auto"):
    """Adjoint of ``(rotation, baseline, sub_err) = level(x)`` given
    output cotangents; returns the x cotangent.  Matches AD of the
    gather/scan formulation (pinned in tests against ``jax.vjp`` of the
    scan backend).

    Entirely gather/scatter-free: per-sample structure comes from the
    same fill2 scans as the forward; segment sums land on knot sites
    either as direct segmented running sums (``fills="pallas"``:
    ``ops.pallas_fill.segsum_pallas``, one streaming pass per direction
    with the channels riding the scan state) or as differences of global
    cumulative sums read back through fills (``fills="scan"``); the
    knot-neighbor pushes are received by one strictly-after /
    strictly-before knot read each (every knot is the exclusive-previous
    of exactly its next knot).  A first version used per-sample
    scatter-adds, which measured 13.3 s for the full sift backward at
    8x1M on v5e — worse than AD of the scans (2.1 s).

    ``fills`` selects the primitive: ``"scan"`` (XLA associative scans +
    cumsums, any platform/dtype) or ``"pallas"`` (the streaming
    fill2/segsum kernels — the forward's own kernel economics applied to
    the adjoint).  The two routes agree to segment-sum rounding, NOT
    bitwise: the direct segmented sums round per segment while the scan
    route's cumsum differences cancel O(n)-mass partial sums, so where
    they differ the pallas route is the tighter one (pinned in
    tests/test_pallas_fill.py against an f64 ground truth).  ``"auto"``
    mirrors the forward's platform heuristic (TPU, f32, 4096 <= n <=
    2^24 — the plain-f32 position-channel form of ``fill2_pallas``)."""
    n = x.shape[-1]
    if fills == "auto":
        # PYITD_STRUCTURAL_FILLS: probe/testing override (read at trace
        # time) — tools/ab_structural_bwd.py uses it for on-chip A/Bs
        import os as _os

        fills = _os.environ.get("PYITD_STRUCTURAL_FILLS") or (
            "pallas" if (jax.default_backend() == "tpu"
                         and x.dtype == jnp.float32
                         and 4096 <= n <= (1 << 24))
            else "scan")
    if fills not in ("scan", "pallas"):
        raise ValueError(f"unknown fills: {fills!r}")
    if fills == "pallas":
        if x.dtype != jnp.float32:
            raise ValueError("fills='pallas' is f32-only")
        if n > (1 << 24):
            raise ValueError(
                f"n={n} exceeds the f32 position ceiling (2^24) of the "
                "plain fill2 kernel; use fills='scan'")
        # the kernels want flat (rows, n); everything below is batched
        lead = x.shape[:-1]
        gx = _structural_level_bwd_impl(
            x.reshape(-1, n), g_rot.reshape(-1, n), g_base.reshape(-1, n),
            g_err.reshape(-1, n), endpoint_mode, True)
        return gx.reshape(lead + (n,))
    return _structural_level_bwd_impl(
        x, g_rot, g_base, g_err, endpoint_mode, False)


def _structural_level_bwd_impl(x, g_rot, g_base, g_err, endpoint_mode,
                               use_pallas):
    dtype = x.dtype
    n = x.shape[-1]
    it = lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    knots = _knot_mask(x)
    posf = it.astype(dtype)

    if use_pallas:
        from .pallas_fill import fill2_pallas, segsum_pallas

        interp = jax.default_backend() != "tpu"

        def struct_fwd():
            return fill2_pallas(posf, x, knots, interpret=interp)

        def struct_bwd():
            return fill2_pallas(
                _shift_left(posf, 0.0), _shift_left(x, 0.0),
                _shift_left(knots, False), reverse=True, interpret=interp)

        # flags for the segmented sums: a segment boundary sits BETWEEN a
        # knot and its neighbor, so the reverse sums reset where the NEXT
        # sample is a knot and the forward sums where the PREVIOUS is
        f_next = _shift_left(knots, False)
        f_prev = _shift_right(knots, False)

        def seg_reads(a_bl, a_xl, a_br, a_xr):
            # DIRECT segment sums (one streaming pass per direction,
            # channels in the scan state): segA_*[t] = sum over
            # [t, nextknot(t)), segE_*[t] = sum over [prevknot(t), t).
            # The scan route reconstructs the same sums as differences of
            # a global cumsum — O(n)-mass cancellation the direct form
            # avoids, so the two routes agree to segment-sum rounding,
            # not bitwise (the direct form is the more accurate one).
            segA = segsum_pallas((a_bl, a_xl), f_next, reverse=True,
                                 interpret=interp)
            segE = segsum_pallas(
                (_shift_right(a_br, 0.0), _shift_right(a_xr, 0.0)),
                f_prev, reverse=False, interpret=interp)
            return segA[0], segA[1], segE[0], segE[1]

        def knot_next(v):
            # v at the strictly-next knot (0 if none): v is nonzero only
            # at knots, so the segmented sum over (t, nextknot(t)] IS
            # that single value — bit-identical to the fillv read-back
            return segsum_pallas(_shift_left(v, 0.0), f_next,
                                 reverse=True, interpret=interp)

        def knot_prev(v):
            return segsum_pallas(_shift_right(v, 0.0), f_prev,
                                 reverse=False, interpret=interp)
    else:
        def struct_fwd():
            (a, b), (c, d), _ = forward_fill2_scan(
                (posf, x), knots, (0.0, 0.0))
            return a, b, c, d

        def struct_bwd():
            (a, b), (c, d), _ = backward_fill2_scan(
                (_shift_left(posf, 0.0), _shift_left(x, 0.0)),
                _shift_left(knots, False), (0.0, 0.0))
            return a, b, c, d

        def fills_after(vals):
            return backward_fill_scan(
                tuple(_shift_left(v, 0.0) for v in vals),
                _shift_left(knots, False), (0.0,) * len(vals))

        def fills_before(vals):
            _v1, v2, _ = forward_fill2_scan(vals, knots, (0.0,) * len(vals))
            return v2

        def seg_reads(a_bl, a_xl, a_br, a_xr):
            # segment sums reconstructed as differences of exclusive
            # global cumsums read back at the neighbor knots (the
            # round-4 formulation, kept bit-stable for this route)
            excl, tots = _zs4(a_bl, a_xl, a_br, a_xr)
            zs_bl, zs_xl, zs_br, zs_xr = excl[0], excl[1], excl[2], excl[3]
            tot_bl, tot_xl = tots[0], tots[1]
            # "running sum at my NEXT knot" (strictly after); patched at
            # the last sample (a knot) with the total
            nxt_bl, nxt_xl = fills_after((zs_bl, zs_xl))
            is_last = it == n - 1
            nxt_bl = jnp.where(is_last, tot_bl, nxt_bl)
            nxt_xl = jnp.where(is_last, tot_xl, nxt_xl)
            # "running sum at my PREVIOUS knot" (strictly before)
            prv_br, prv_xr = fills_before((zs_br, zs_xr))
            return (nxt_bl - zs_bl, nxt_xl - zs_xl,
                    zs_br - prv_br, zs_xr - prv_xr)

        def knot_next(v):
            return fills_after((v,))[0]

        def knot_prev(v):
            return fills_before((v,))[0]

    # per-sample knot structure, exactly the forward scan's channels
    p1p, p1x, p2p, p2x = struct_fwd()
    n1p, n1x, n2p, n2x = struct_bwd()

    def knot_value(kpos, kval, lpos, lx, rpos, rx, end_val, is_first):
        span = rpos - lpos
        w = (kpos - lpos) / jnp.where(span == 0, jnp.ones_like(span), span)
        formula = 0.5 * (lx + w * (rx - lx)) + 0.5 * kval
        return jnp.where(is_first, end_val[..., None], formula)

    b_first = 0.5 * (x[..., 0] + x[..., 1])
    b_last = 0.5 * (x[..., n - 2] + x[..., n - 1])
    bl = knot_value(p1p, p1x, p2p, p2x, n1p, n1x, b_first, p1p == 0)
    bl = jnp.where(p1p == n - 1, b_last[..., None], bl)
    br = knot_value(n1p, n1x, p1p, p1x, n2p, n2x, b_last, n1p == n - 1)

    xl, xr = p1x, n1x
    d = xr - xl
    dz = d == 0
    safe = jnp.where(dz, jnp.ones_like(d), d)
    s = jnp.where(dz, jnp.zeros_like(d), (br - bl) / safe)

    # err's AD coefficients are exactly (+x, -rot, -baseline)
    geff_rot = g_rot - g_err
    geff_base = g_base - g_err
    gB = geff_base - geff_rot
    if endpoint_mode == "reference":
        gB = jnp.where(it == n - 1, jnp.zeros_like(gB), gB)

    q = jnp.where(dz, jnp.zeros_like(d), (x - xl) / safe)
    coef = jnp.where(dz, jnp.zeros_like(d), (br - bl) / (safe * safe))
    a_bl = gB * jnp.where(dz, jnp.ones_like(q), 1.0 - q)
    a_br = gB * q
    a_xl = gB * coef * (x - xr)
    a_xr = -gB * coef * (x - xl)

    gx = geff_rot + g_err + gB * s  # direct dB/dx[t] = slope

    # Non-finite contributions (possible only within a NaN quarantine
    # zone, where gradients are undefined anyway) are dropped: a running
    # sum would otherwise poison every position after the NaN, while AD
    # localizes the NaN to the directly involved samples — documented
    # deviation (the direct per-sample terms still carry their NaNs).
    a_bl, a_xl, a_br, a_xr = (
        jnp.where(jnp.isfinite(z), z, jnp.zeros_like(z))
        for z in (a_bl, a_xl, a_br, a_xr))

    # segment sums landing on knot sites: over [t, nextknot) for the *_l
    # channels, over [prevknot, t) for the *_r — direct segmented-sum
    # kernels on the pallas route, cumsum differences on the scan route
    segA_bl, segA_xl, segE_br, segE_xr = seg_reads(a_bl, a_xl, a_br, a_xr)
    gkv = jnp.where(knots, segA_bl + segE_br, 0.0)
    gx = gx + jnp.where(knots, segA_xl + segE_xr, 0.0)

    # knot-value adjoint.  Interior knots: kv = 0.5*(x[pe] + w*(x[nx] -
    # x[pe])) + 0.5*x[t]; at a knot site pe = p2p, nx = n1p.
    span = n1p - p2p
    w = (posf - p2p) / jnp.where(span == 0, jnp.ones_like(span), span)
    interior = knots & (it != 0) & (it != n - 1)
    gkv_int = jnp.where(interior, gkv, jnp.zeros_like(gkv))
    gx = gx + 0.5 * gkv_int

    # pushes: x[pe(k)] += c_p(k); x[nx(k)] += c_n(k).  Every knot is the
    # exclusive-previous of exactly its next knot (and vice versa), so
    # the receive is one strictly-after / strictly-before fill
    c_p = gkv_int * (0.5 * (1.0 - w))
    c_n = gkv_int * (0.5 * w)
    recv_p = knot_next(c_p)
    # previous knot's c_n: the strictly-before read
    recv_n = knot_prev(c_n)
    gx = gx + jnp.where(knots, recv_p + recv_n, 0.0)

    # end knots: kv[0] = 0.5*(x[0]+x[1]); kv[n-1] = 0.5*(x[n-2]+x[n-1])
    g0 = 0.5 * gkv[..., 0]
    gl = 0.5 * gkv[..., n - 1]
    gx = gx.at[..., 0].add(g0).at[..., 1].add(g0)
    gx = gx.at[..., n - 2].add(gl).at[..., n - 1].add(gl)
    return gx


def linear_baseline_extract_structural(
    x: jax.Array, *, endpoint_mode: str = "reference",
    backend: str = "auto", bwd_fills: str = "auto") -> LinearBaselineResult:
    """:func:`linear_baseline_extract` with the structural custom VJP
    (forward may run ANY backend — including the non-differentiable
    Pallas kernels — since the backward never differentiates it).
    ``bwd_fills`` selects the adjoint's fill primitive (see
    :func:`_structural_level_bwd`)."""

    @jax.custom_vjp
    def level(xx):
        return linear_baseline_extract(
            xx, endpoint_mode=endpoint_mode, backend=backend)

    def fwd(xx):
        return level(xx), xx

    def bwd(xx, ct):
        g_rot, g_base, _g_nex, g_err = ct

        def z(g, like):
            # float0 / symbolic-zero cotangents arrive for unused outputs
            if g is None or getattr(g, "dtype", None) == jax.dtypes.float0:
                return jnp.zeros_like(like)
            return g

        gx = _structural_level_bwd(
            xx, z(g_rot, xx), z(g_base, xx), z(g_err, xx), endpoint_mode,
            fills=bwd_fills)
        return (gx,)

    level.defvjp(fwd, bwd)
    return level(x)
