"""Interpret-mode parity tests for the Pallas fill kernels.

The Pallas kernels (``ops/pallas_fill.py``) produce the headline TPU number;
these tests pin them to the associative-scan backend (``ops/fill.py``) in
``interpret=True`` mode so the CPU suite covers the TPU hot path: the
``_combine`` semigroup, the lane/sublane doubling scans, and — most
regression-prone — the cross-block SMEM carry.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pyitd_tpu.ops.pallas_fill import fill2_pallas, linear_fill2_pallas, BLK
from pyitd_tpu.ops.fill import forward_fill2_scan, backward_fill2_scan
from pyitd_tpu.ops.linear_baseline import _knot_mask, linear_baseline_extract


def _scan_ref(pos, x, mask, reverse):
    fn = backward_fill2_scan if reverse else forward_fill2_scan
    (p1, x1), (p2, x2), _ = fn((pos, x), mask, (0.0, 0.0))
    return p1, x1, p2, x2


def _check(pos, x, mask, reverse):
    got = fill2_pallas(pos, x, mask, reverse=reverse, interpret=True)
    want = _scan_ref(pos, x, mask, reverse)
    for g, w, name in zip(got, want, ("p1_pos", "p1_x", "p2_pos", "p2_x")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(w), err_msg=f"{name} reverse={reverse}"
        )


def _inputs(rows, n, density, seed=0):
    rng = np.random.default_rng(seed)
    pos = jnp.asarray(
        np.broadcast_to(np.arange(n, dtype=np.float32), (rows, n)).copy()
    )
    x = jnp.asarray(rng.normal(size=(rows, n)).astype(np.float32))
    mask = jnp.asarray(rng.random((rows, n)) < density)
    return pos, x, mask


# forward-direction interpret runs are ~5-10x slower than reverse on this
# host; the fast tier keeps reverse coverage (same combine/shift/carry code)
_FWD_SLOW = pytest.param(False, marks=pytest.mark.slow)


@pytest.mark.parametrize("reverse", [_FWD_SLOW, True])
@pytest.mark.parametrize(
    "n",
    [BLK, pytest.param(2 * BLK, marks=pytest.mark.slow), BLK + 517,
     pytest.param(3 * BLK - 1, marks=pytest.mark.slow)],
)
def test_fill2_parity_random(reverse, n):
    pos, x, mask = _inputs(rows=2, n=n, density=0.01, seed=n)
    _check(pos, x, mask, reverse)


@pytest.mark.parametrize("reverse", [_FWD_SLOW, True])
def test_fill2_block_boundary_marks(reverse):
    """Marks exactly at block edges exercise the SMEM carry hand-off."""
    n = 3 * BLK
    pos, x, _ = _inputs(rows=1, n=n, density=0.0)
    idx = [0, BLK - 1, BLK, BLK + 1, 2 * BLK - 1, 2 * BLK, n - 1]
    mask = jnp.zeros((1, n), bool)
    for i in idx:
        mask = mask.at[0, i].set(True)
    _check(pos, x, mask, reverse)


@pytest.mark.parametrize("reverse", [False, True])
def test_fill2_carry_across_empty_blocks(reverse):
    """Marks only in the first (last) block: every later (earlier) sample's
    fill must come purely from the cross-block carry."""
    n = 3 * BLK
    pos, x, _ = _inputs(rows=1, n=n, density=0.0, seed=1)
    mask = jnp.zeros((1, n), bool)
    if reverse:
        mask = mask.at[0, n - 100].set(True).at[0, n - 50].set(True)
    else:
        mask = mask.at[0, 100].set(True).at[0, 200].set(True)
    _check(pos, x, mask, reverse)


@pytest.mark.parametrize("reverse", [_FWD_SLOW, True])
def test_fill2_degenerate_masks(reverse):
    """Empty mask (defaults everywhere), full mask, and single-mark rows,
    stacked so row independence is also checked."""
    n = BLK + 130
    pos, x, _ = _inputs(rows=4, n=n, density=0.0, seed=2)
    mask = jnp.zeros((4, n), bool)
    mask = mask.at[1].set(True)                      # all marked
    mask = mask.at[2, n // 2].set(True)              # one mark mid-signal
    mask = mask.at[3, 0].set(True).at[3, n - 1].set(True)
    _check(pos, x, mask, reverse)


@pytest.mark.parametrize("reverse", [_FWD_SLOW, True])
def test_linear_fill2_parity(reverse):
    """The ITD-specialized kernel derives the knot mask in-kernel; it must
    match the XLA mask + scan fill bit-for-bit (pure selection, no FP)."""
    rng = np.random.default_rng(3)
    n = 2 * BLK + 300
    x = jnp.asarray(rng.normal(size=(3, n)).astype(np.float32))
    got = linear_fill2_pallas(x, reverse=reverse, interpret=True)
    knots = _knot_mask(x)
    posf = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.float32), x.shape
    )
    want = _scan_ref(posf, x, knots, reverse)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
def test_linear_fill2_nan_quarantine():
    """NaN samples and their neighbors are excluded from the knot mask
    in-kernel, matching extrema_mask's quarantine."""
    rng = np.random.default_rng(4)
    n = BLK
    xa = rng.normal(size=(1, n)).astype(np.float32)
    xa[0, 1000] = np.nan
    xa[0, 5000] = np.nan
    x = jnp.asarray(xa)
    got = linear_fill2_pallas(x, interpret=True)
    knots = _knot_mask(x)
    posf = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32), x.shape)
    want = _scan_ref(posf, x, knots, False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.mark.slow
@pytest.mark.parametrize("endpoint_mode", ["reference", "natural"])
def test_fused_baseline_kernel_parity(endpoint_mode):
    """linear_baseline_pallas (reverse fill + epilogue fused in-kernel)
    matches the scan backend to f32 roundoff across block boundaries and
    under NaN contamination."""
    from pyitd_tpu.ops.pallas_fill import (
        linear_fill2_pallas, linear_baseline_pallas,
    )

    rng = np.random.default_rng(6)
    n = 2 * BLK + 515
    xa = rng.normal(size=(2, n)).astype(np.float32)
    xa[0, BLK] = np.nan          # block-boundary NaN
    xa[1, 77] = np.nan
    x = jnp.asarray(xa)
    fwd = linear_fill2_pallas(x, interpret=True)
    got = linear_baseline_pallas(x, *fwd, endpoint_mode=endpoint_mode,
                                 interpret=True)
    want = linear_baseline_extract(x, endpoint_mode=endpoint_mode,
                                   backend="scan").baseline
    g, w = np.asarray(got), np.asarray(want)
    assert np.isnan(g).sum() == np.isnan(w).sum()
    ok = ~np.isnan(w)
    np.testing.assert_allclose(g[ok], w[ok], rtol=0, atol=5e-6)


@pytest.mark.parametrize(
    "endpoint_mode",
    [pytest.param("reference", marks=pytest.mark.slow), "natural"],
)
def test_pallas_backend_full_level(endpoint_mode):
    """backend='pallas' (interpret on CPU) matches backend='scan' on a full
    linear-baseline level, f32, to f32 roundoff."""
    rng = np.random.default_rng(5)
    t = np.linspace(0, 6 * np.pi, BLK + 700)
    sig = np.sin(3 * t) + 0.3 * rng.normal(size=t.size)
    x = jnp.asarray(np.stack([sig, sig[::-1]]), dtype=jnp.float32)
    got = linear_baseline_extract(x, endpoint_mode=endpoint_mode,
                                  backend="pallas")
    want = linear_baseline_extract(x, endpoint_mode=endpoint_mode,
                                   backend="scan")
    np.testing.assert_allclose(
        np.asarray(got.baseline), np.asarray(want.baseline),
        rtol=0, atol=5e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(got.num_extrema), np.asarray(want.num_extrema)
    )


def test_block_fill_summaries_cnt_matches_two_pass():
    """The fused 9-channel reduce (fwd top-2 + rev top-2 + count in one
    input pass, used by the sharded sift's block_states) is bitwise the
    separate fwd/rev ``block_fill_summaries`` reductions plus a mask sum —
    including all-empty blocks, single-mark blocks, and full blocks."""
    from pyitd_tpu.ops.pallas_fill import (
        block_fill_summaries, block_fill_summaries_cnt)

    rng = np.random.default_rng(11)
    rows, nblk, blk = 3, 5, 64
    pf = jnp.asarray(
        np.broadcast_to(
            np.arange(nblk * blk, dtype=np.float32).reshape(1, nblk, blk),
            (rows, nblk, blk),
        ).copy()
    )
    xb = jnp.asarray(rng.normal(size=(rows, nblk, blk)).astype(np.float32))
    m = rng.random((rows, nblk, blk)) < 0.05
    m[0, 2] = False          # an all-empty block
    m[1, 3] = True           # a full block
    m[2, 4] = False
    m[2, 4, 17] = True       # a single-mark block
    mb = jnp.asarray(m)
    big = nblk * blk + 7

    fwd, rev_enc, cnt = block_fill_summaries_cnt(mb, pf, xb, big)
    fwd_ref, rev_ref = block_fill_summaries(mb, pf, xb, big)

    for g, w in zip(fwd, fwd_ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    # rev_enc is big-encoded; decode empties like block_fill_summaries does
    bigf = np.float32(big)
    r = [np.asarray(c) for c in rev_enc]
    dec = (np.where(r[0] >= bigf, -1.0, r[0]),
           np.where(r[0] >= bigf, 0.0, r[1]),
           np.where(r[2] >= bigf, -1.0, r[2]),
           np.where(r[2] >= bigf, 0.0, r[3]))
    for g, w in zip(dec, rev_ref):
        np.testing.assert_array_equal(g, np.asarray(w))
    np.testing.assert_array_equal(
        np.asarray(cnt), m.sum(axis=-1).astype(np.float32))


def test_fold_emit_states_matches_full_pass():
    """The fused kernel's in-kernel partial folds (fold_emit=True), once
    resolved by ``fold_emit_states`` (one block-first sample per block
    from strided edge slices), are bitwise ``level_block_states_fwd`` on
    the baseline the kernel produced — including engineered extrema AT
    block-first samples, NaN quarantine across a block boundary, and
    non-BLK-multiple padding."""
    from pyitd_tpu.ops.pallas_fill import (
        _knot_mask_flat, _pad_edges, block_edge_scalars, fold_emit_states,
        level_block_states_fwd, sift_level_fused_padded)

    rng = np.random.default_rng(7)
    n = 2 * BLK + 513  # 3 blocks, padded tail
    x = 0.05 * rng.normal(size=(2, n)).astype(np.float32)
    x[0] += np.sin(np.linspace(0, 40 * np.pi, n)).astype(np.float32)
    # a tall spike exactly at a block-first sample: the baseline keeps a
    # local max there, so the resolver's one-excluded-sample path must
    # mark it
    x[0, BLK] = 10.0
    x[1, 2 * BLK] = -8.0
    x[1, BLK + 1] = np.nan  # quarantines the block-first sample at BLK

    x3, pe, ne, npad, nblk = _pad_edges(jnp.asarray(x))
    bf = 0.5 * (x[:, 0] + x[:, 1])
    bl = 0.5 * (x[:, n - 2] + x[:, n - 1])
    _, fp0 = level_block_states_fwd(x3, n)
    zero3 = x3 * 0
    ffalse = (x3[:, 0, 0] * 0) != 0
    base3, _rot, _err, _row, _c, fold_raw = sift_level_fused_padded(
        x3, pe, ne, jnp.asarray(bf), jnp.asarray(bl), fp0,
        ffalse, ffalse, ffalse, zero3, zero3, zero3, zero3, n,
        interpret=True, fold_emit=True)

    # the engineered spike really does land a baseline knot at pos BLK
    m, _ = _knot_mask_flat(base3.reshape(2, npad), n)
    assert bool(m[0, BLK])

    want_nex, want_fp = level_block_states_fwd(base3, n)
    pe2, _ = block_edge_scalars(base3, nblk)
    got_nex, got_fp = fold_emit_states(fold_raw, base3, pe2, n)
    np.testing.assert_array_equal(np.asarray(got_nex), np.asarray(want_nex))
    np.testing.assert_array_equal(np.asarray(got_fp), np.asarray(want_fp))


# ---------------------------------------------------------------------------
# i32 bit-pattern position channels (VERDICT r4 item 6): above 2^24 the
# sift kernels switch position channels from f32 values to offset bit
# patterns (exact to POS_BITS_MAX_N).  Forced at small n here, the encoded
# kernels must be BITWISE identical to value mode — the suite-protected
# proxy for any-n exactness (the 16.7M-sample check runs on-chip).
# ---------------------------------------------------------------------------


def test_position_bits_level_bitwise():
    from pyitd_tpu.ops.pallas_fill import linear_level_pallas

    rng = np.random.default_rng(23)
    x = jnp.asarray(rng.standard_normal((3, 1000)), jnp.float32)
    a = linear_level_pallas(x, interpret=True, encode=False)
    b = linear_level_pallas(x, interpret=True, encode=True)
    for name, u, v in zip(("baseline", "rotation", "err", "nex"), a, b):
        np.testing.assert_array_equal(
            np.asarray(u), np.asarray(v),
            err_msg=f"{name}: bits mode diverges from value mode")


@pytest.mark.parametrize("fused", [False, True])
def test_position_bits_sift_bitwise(fused):
    from pyitd_tpu.decomp.itd import _itd_sift_emit

    rng = np.random.default_rng(29)
    t = np.linspace(0, 6 * np.pi, 1500)
    x = jnp.asarray(
        np.stack([np.sin(9 * t) + 0.3 * rng.standard_normal(1500),
                  rng.standard_normal(1500)]), jnp.float32)
    a = _itd_sift_emit(x, 6, "reference", True, fused=fused,
                       position_encoding="value")
    b = _itd_sift_emit(x, 6, "reference", True, fused=fused,
                       position_encoding="bits")
    for name in ("rotations", "baselines", "correction", "num_components",
                 "stop_reason"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)),
            err_msg=f"{name}: bits mode diverges ({'fused' if fused else 'emit'})")


@pytest.mark.parametrize("reverse", [False, True])
def test_fillv_parity_random(reverse):
    """fillv_pallas (single-value-channel fill) vs the XLA fill scans —
    the structural sift backward streams its cumulative-sum read-backs
    through this kernel (VERDICT r4 item 4)."""
    from pyitd_tpu.ops.fill import backward_fill_scan, forward_fill_scan
    from pyitd_tpu.ops.pallas_fill import fillv_pallas

    rng = np.random.default_rng(7)
    rows, n = 3, BLK + 517
    v = jnp.asarray(rng.normal(size=(rows, n)).astype(np.float32))
    mask = jnp.asarray(rng.random((rows, n)) < 0.01)
    # row 2: no marks at all (carry must stay NONE -> default 0)
    mask = mask.at[2].set(False)
    got = fillv_pallas(v, mask, reverse=reverse, interpret=True)
    fn = backward_fill_scan if reverse else forward_fill_scan
    (want,) = fn((v,), mask, (0.0,))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def _segsum_oracle(v, flags, reverse):
    """Sequential numpy reference: inclusive running sums resetting AT
    flagged samples (forward: out[t] = v[t] + (flags[t] ? 0 : out[t-1]);
    reverse mirrors with t+1)."""
    out = np.zeros_like(v)
    rows, n = v.shape
    order = range(n - 1, -1, -1) if reverse else range(n)
    for r in range(rows):
        acc = 0.0
        for t in order:
            acc = v[r, t] + (0.0 if flags[r, t] else acc)
            out[r, t] = acc
    return out


@pytest.mark.parametrize("reverse", [False, True])
@pytest.mark.parametrize("nch", [1, 2])
def test_segsum_parity_random(reverse, nch):
    """segsum_pallas (interpret) vs a sequential numpy oracle.  Inputs
    are integer-valued f32 with segment sums far below 2^24, so the sums
    are exact under ANY association order and the comparison is bitwise
    — this pins the kernel's hierarchy (lane doubling, row summaries,
    cross-block SMEM carry) structurally, not just to tolerance."""
    from pyitd_tpu.ops.pallas_fill import segsum_pallas

    rng = np.random.default_rng(23)
    rows, n = 3, BLK + 517
    vals = tuple(
        jnp.asarray(rng.integers(-8, 9, size=(rows, n)).astype(np.float32))
        for _ in range(nch))
    flags = rng.random((rows, n)) < 0.01
    flags[2] = False  # one row with no resets: pure running sum
    got = segsum_pallas(vals, jnp.asarray(flags), reverse=reverse,
                        interpret=True)
    for g, v in zip(got, vals):
        want = _segsum_oracle(np.asarray(v), flags, reverse)
        np.testing.assert_array_equal(np.asarray(g), want)


def test_structural_bwd_pallas_matches_scan():
    """The structural level adjoint with fills='pallas' (interpret) vs
    fills='scan'.  The routes are NOT bitwise equal (round 5): the pallas
    route sums each knot segment directly (segsum_pallas) while the scan
    route differences a global cumsum — so they agree to segment-sum
    rounding, and against an f64 ground truth the direct form must be at
    least as accurate as the cancellation-prone cumsum form."""
    from pyitd_tpu.ops.linear_baseline import _structural_level_bwd

    rng = np.random.default_rng(11)
    n = BLK + 130
    t = np.linspace(0, 4 * np.pi, n)
    sig = np.stack([np.sin(9 * t) + 0.2 * rng.standard_normal(n),
                    rng.standard_normal(n)])
    x = jnp.asarray(sig, jnp.float32)
    cts_np = tuple(rng.normal(size=x.shape).astype(np.float32)
                   for _ in range(3))
    cts = tuple(jnp.asarray(c) for c in cts_np)
    g_scan = np.asarray(
        _structural_level_bwd(x, *cts, "reference", fills="scan"))
    g_pal = np.asarray(
        _structural_level_bwd(x, *cts, "reference", fills="pallas"))
    np.testing.assert_allclose(g_pal, g_scan, rtol=2e-4, atol=2e-4)

    # f64 ground truth through the scan route (the pallas kernels are
    # f32-only); the f32 pallas adjoint must not be looser than f32 scan
    x64 = jnp.asarray(sig, jnp.float64)
    cts64 = tuple(jnp.asarray(c, jnp.float64) for c in cts_np)
    g_true = np.asarray(
        _structural_level_bwd(x64, *cts64, "reference", fills="scan"))
    err_pal = np.abs(g_pal - g_true).max()
    err_scan = np.abs(g_scan - g_true).max()
    assert err_pal <= err_scan * 1.5 + 1e-6, (err_pal, err_scan)
