import pytest
import numpy as np
import jax
import jax.numpy as jnp

from pyitd_tpu.ops.cubic_baseline import template_fast_baseline
from pyitd_tpu.decomp.itd_fourier import (
    sine_template_positions,
    itd_sine_sift,
    fourier_mode_any,
    itd_fourier_decomposition,
)
from reference.cubic_ref import fast_baseline, sine_template_knots


def test_template_positions_match_oracle():
    sr, n = 1000, 1000
    pos, counts, freqs = sine_template_positions(sr, n)
    # oracle: comb arange(2, sr/2-1, 96)[::-1], loop from index 1
    comb = np.arange(2, sr // 2 - 1, 96)[::-1]
    assert list(freqs) == list(comb[1:])
    for i, f in enumerate(freqs):
        want_pos, want_cnt = sine_template_knots(float(f), sr, n / sr)
        assert int(counts[i]) == want_cnt
        np.testing.assert_array_equal(np.asarray(pos[i])[:want_cnt], want_pos)


def test_sine_sift_matches_oracle():
    rng = np.random.default_rng(0)
    sr, n = 1000, 1000
    x = np.sin(2 * np.pi * 12 * np.arange(n) / sr) + 0.3 * rng.normal(size=n)
    rotations, residual = itd_sine_sift(jnp.asarray(x), sr)

    problem = x.copy()
    _, counts, freqs = sine_template_positions(sr, n)
    for i, f in enumerate(freqs):
        p, c = sine_template_knots(float(f), sr, n / sr)
        baseline = fast_baseline(problem, p, c)
        rot = problem - baseline
        np.testing.assert_allclose(np.asarray(rotations[i]), rot, atol=1e-9)
        problem = baseline
    np.testing.assert_allclose(np.asarray(residual), problem, atol=1e-9)


def test_sine_sift_reconstructs():
    rng = np.random.default_rng(1)
    x = rng.normal(size=800)
    rotations, residual = itd_sine_sift(jnp.asarray(x), 800)
    total = np.asarray(rotations).sum(0) + np.asarray(residual)
    np.testing.assert_allclose(total, x, atol=1e-9)


def test_fourier_mode_any_isolates_band():
    # a clean 3-tone signal: the extracted mode must contain the dominant tone
    n = 512
    t = np.arange(n) / n
    x = (
        np.sin(2 * np.pi * 20 * t)
        + 0.5 * np.sin(2 * np.pi * 60 * t)
        + 0.3 * np.sin(2 * np.pi * 120 * t)
    )
    mode = np.asarray(fourier_mode_any(jnp.asarray(x)))
    assert not np.allclose(mode, 0)
    spec = np.abs(np.fft.fft(mode))
    assert np.argmax(spec[: n // 2]) == 20


def _valid_mode_oracle(rotation):
    """Sequential numpy twin of the reference's strict variant
    (itd_fourier_decomposition.py:131-168), full precision (the repo
    widens the complex64 buffer — documented delta)."""
    x = np.fft.fft(rotation)
    a = np.abs(x)
    half = len(a) // 2
    peaks = [i for i in range(1, half - 1) if a[i] > a[i - 1] and a[i] > a[i + 1]]
    if len(peaks) < 3:
        return np.zeros(rotation.size)
    peak_max = max(peaks, key=lambda i: a[i])
    before = [i for i in peaks if i < peak_max - 1]
    after = [i for i in peaks if i > peak_max + 1]
    if not before or not after:
        return np.zeros(rotation.size)
    first_peak, last_peak = max(before), min(after)
    mina = first_peak + np.argmin(a[first_peak:peak_max + 1])
    minb = peak_max + np.argmin(a[peak_max:last_peak + 1])
    xn = np.zeros(len(a), dtype=complex)
    xn[mina:minb] = x[mina:minb]
    xn[-minb:-mina] = x[-minb:-mina]
    return np.fft.ifft(xn).real


def test_fourier_mode_valid_matches_oracle():
    """Regression: the round-4 rfft rewrite dropped the ``n`` argument in
    fourier_mode_valid's _band_isolate call — the function crashed on ANY
    input and nothing covered it.  Pin exact oracle parity on signals that
    exercise both the extraction and every degenerate early-out."""
    from pyitd_tpu.decomp.itd_fourier import fourier_mode_valid

    rng = np.random.default_rng(7)
    n = 512
    t = np.arange(n) / n
    cases = [
        np.sin(2 * np.pi * 20 * t) + 0.5 * np.sin(2 * np.pi * 60 * t)
        + 0.3 * np.sin(2 * np.pi * 120 * t) + 0.05 * rng.normal(size=n),
        rng.normal(size=n),                      # many peaks
        np.sin(2 * np.pi * 1 * t),               # <3 peaks -> zeros
        np.sin(2 * np.pi * 20 * t),              # isolated single peak
    ]
    for i, x in enumerate(cases):
        got = np.asarray(fourier_mode_valid(jnp.asarray(x, jnp.float64)))
        np.testing.assert_allclose(got, _valid_mode_oracle(x), atol=1e-9,
                                   err_msg=f"case {i}")


def test_fourier_mode_degenerate_returns_zeros():
    # spectrum peak at bin 1 -> conditions fail -> zeros
    n = 256
    x = np.sin(2 * np.pi * 1 * np.arange(n) / n)
    mode = np.asarray(fourier_mode_any(jnp.asarray(x)))
    np.testing.assert_allclose(mode, 0.0)


def test_cascade_reconstructs():
    rng = np.random.default_rng(2)
    n, sr = 600, 600
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 25 * t) + 0.4 * np.sin(2 * np.pi * 80 * t) + 0.05 * rng.normal(size=n)
    comps = itd_fourier_decomposition(x, sr, max_outer=30)
    total = np.sum(np.stack(comps), axis=0)
    np.testing.assert_allclose(total, x, atol=1e-8)


def test_cascade_iteration_matches_unfused_body():
    """The fused single-irfft iteration (cascade_iteration) must agree
    with the reference-shaped body — per-rotation modes, subtract where
    kept, re-sum — to reassociation roundoff, and make the identical
    keep decision, for both extraction variants."""
    from pyitd_tpu.decomp.itd_fourier import (cascade_iteration,
                                              fourier_mode_valid)

    rng = np.random.default_rng(9)
    n, sr = 1000, 1000
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * 25 * t) + 0.4 * np.sin(2 * np.pi * 80 * t)
         + 0.05 * rng.normal(size=n))
    cur = jnp.asarray(x)
    for mode, fn in (("any", fourier_mode_any), ("valid", fourier_mode_valid)):
        rot, res = itd_sine_sift(cur, sr)
        modes = jax.vmap(fn)(rot)
        is_mode_old = ~jnp.all(jnp.isclose(modes, 0.0), axis=-1)
        rot2 = jnp.where(is_mode_old[..., None], rot - modes, rot)
        cur_old = jnp.sum(rot2, axis=0) + res

        cur_new, is_mode_new, spectra, rot_new, res_new = cascade_iteration(
            cur, sr, mode=mode)
        np.testing.assert_array_equal(np.asarray(is_mode_old),
                                      np.asarray(is_mode_new))
        np.testing.assert_allclose(np.asarray(cur_new), np.asarray(cur_old),
                                   atol=1e-12)
        # the stored spectra materialize to exactly the per-rotation modes
        np.testing.assert_allclose(
            np.asarray(jnp.fft.irfft(spectra, n=n)), np.asarray(modes),
            atol=1e-12)
        np.testing.assert_allclose(np.asarray(rot_new), np.asarray(rot),
                                   atol=0)
        np.testing.assert_allclose(np.asarray(res_new), np.asarray(res),
                                   atol=0)


def test_lean_cascade_reconstructs():
    from pyitd_tpu.decomp.itd_fourier import itd_fourier_decomposition_lean

    rng = np.random.default_rng(3)
    n, sr = 600, 600
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 25 * t) + 0.4 * np.sin(2 * np.pi * 80 * t) + 0.05 * rng.normal(size=n)
    comps = itd_fourier_decomposition_lean(x, sr, max_outer=30)
    # alternating [mode, rotation] pairs + residual
    assert len(comps) % 2 == 1
    total = np.sum(np.stack(comps), axis=0)
    np.testing.assert_allclose(total, x, atol=1e-8)


def test_sine_template_no_crossings_degenerate_knot():
    """A comb frequency whose template has no interior zero crossing gets
    the reference's degenerate [0, 0] knot pair (find_extrema extrapolates
    on a zero-filled buffer, wrapping idx-2 to a trailing zero) instead of
    crashing."""
    from pyitd_tpu.decomp.itd_fourier import sine_template_positions

    # n << sample_rate/4: the 2 Hz template never crosses zero interior
    pos, counts, freqs = sine_template_positions(1000, 200)
    assert int(freqs[-1]) == 2
    row = np.asarray(pos)[-1]
    assert int(counts[-1]) == 2
    np.testing.assert_array_equal(row[:2], [0, 0])


def test_reference_moments_affine_matches_scan():
    # the affine (associative-scan) evaluation of the reference's
    # not-quite-Thomas recurrence must match the sequential scan to
    # reassociation roundoff at every knot count, including degenerate
    import numpy as np
    from pyitd_tpu.ops.tridiag import reference_spline_moments

    rng = np.random.default_rng(0)
    for cap, cnt in [(16, 13), (64, 64), (33, 2), (8, 3), (128, 97)]:
        knots = jnp.asarray(rng.normal(size=(3, cap)))
        h = jnp.asarray(rng.integers(1, 9, size=(3, cap)).astype(np.float64))
        count = jnp.asarray([cnt, max(cnt - 1, 2), min(cnt + 1, cap)],
                            jnp.int32)
        a = reference_spline_moments(knots, h, count, method="scan")
        b = reference_spline_moments(knots, h, count, method="affine")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-9)


def test_sine_sift_batched_layout():
    """ADVICE r4: the batched output layout is (F, batch, n) — frequency
    axis leading, matching the documented (F, ..., n) contract — and each
    batch row equals the 1-D result."""
    rng = np.random.default_rng(5)
    sr, n = 256, 1000
    x2 = rng.standard_normal((3, n))
    rot2, res2 = itd_sine_sift(jnp.asarray(x2), sr)
    rot0, res0 = itd_sine_sift(jnp.asarray(x2[1]), sr)
    assert rot2.shape == (rot0.shape[0], 3, n)
    assert res2.shape == (3, n)
    np.testing.assert_allclose(np.asarray(rot2[:, 1]), np.asarray(rot0),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(res2[1]), np.asarray(res0),
                               atol=1e-12)


def test_template_fast_baseline_f32_ceiling():
    """ADVICE r4: the template tier's float sample grid aliases past 2^24
    for f32 inputs — must refuse loudly (f64 stays open)."""
    import pytest as _pytest

    n_big = (1 << 24) + 8
    pos = np.zeros(16, np.int64)
    pos[:8] = np.arange(8) * (n_big // 8)
    with _pytest.raises(ValueError, match="f32 sample-grid ceiling"):
        jax.eval_shape(
            lambda a: template_fast_baseline(a, pos, 8),
            jax.ShapeDtypeStruct((n_big,), jnp.float32))
    res = jax.eval_shape(
        lambda a: template_fast_baseline(a, pos, 8),
        jax.ShapeDtypeStruct((n_big,), jnp.float64))
    assert res.shape == (n_big,)


def test_template_periodic_matches_generic():
    """The periodic matmul path (one-hot compaction + two-matmul eval,
    VERDICT r5 / config 5b perf thread) must agree with the generic
    gather path wherever the period plan verifies — including the
    majority-pattern grids whose deviant crossings ride the patch lists."""
    from pyitd_tpu.decomp.itd_fourier import _sine_template_static
    from pyitd_tpu.ops.cubic_baseline import _template_fast_baseline_static

    sr, n = 400, 65536
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    x = np.sin(2 * np.pi * 50 * t) + 0.2 * rng.normal(size=n)
    engaged = 0
    for pos_np, cnt, hint in _sine_template_static(sr, n):
        for dt, tol in ((np.float64, 1e-12), (np.float32, 1e-6)):
            xx = jnp.asarray(np.stack([x, -0.5 * x]).astype(dt))
            a = _template_fast_baseline_static(xx, pos_np, cnt,
                                               period_hint=hint)
            b = _template_fast_baseline_static(xx, pos_np, cnt,
                                               period_hint=None)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=0, atol=tol)
        engaged += 1
    assert engaged >= 1  # the comb exists at this (sr, n)


@pytest.mark.slow
def test_template_periodic_bench_shape():
    """The exact shape bench.py times (config 5b: sr=2048, n=2^20) — the
    densest comb entry's periodic path vs the generic gather path, f32.
    Suite protection for the bench-only path (VERDICT r4 item 7)."""
    from pyitd_tpu.decomp.itd_fourier import _sine_template_static
    from pyitd_tpu.ops.cubic_baseline import (_template_fast_baseline_static,
                                              _template_period_plan)

    sr, n = 2048, 1 << 20
    rng = np.random.default_rng(4)
    t = np.arange(n) / sr
    x = (np.sin(2 * np.pi * 50 * t) + 0.6 * np.sin(2 * np.pi * 220 * t)
         + 0.2 * rng.normal(size=n))
    pos_np, cnt, hint = _sine_template_static(sr, n)[0]  # densest: 886785

    # the plan must engage (majority grid + patch lists)
    pos = np.zeros(cnt + 2, np.int64)
    pos[:cnt] = pos_np[:cnt]
    k = np.arange(cnt + 2)
    e_next = np.concatenate([pos[1:], [0]])
    h64 = np.where(k < cnt, (e_next - pos).astype(np.float64), 0.0)
    seg = np.searchsorted(pos[1:cnt], np.arange(n),
                          side="right").astype(np.int32)
    plan = _template_period_plan(pos, cnt, n, hint, h64, seg)
    assert plan is not None and plan.q0 == 433 and plan.span == 512

    xx = jnp.asarray(x, jnp.float32)
    a = _template_fast_baseline_static(xx, pos_np, cnt, period_hint=hint)
    b = _template_fast_baseline_static(xx, pos_np, cnt, period_hint=None)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=2e-6)
