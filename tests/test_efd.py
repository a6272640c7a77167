import numpy as np
import jax.numpy as jnp
import pytest

from pyitd_tpu.decomp.efd import efd, efd_real, iterative_max, efd_slice_max
from reference.efd_ref import efd as ref_efd


def three_cosines(n=1024):
    t = np.arange(n) / n
    return (
        np.cos(2 * np.pi * 30 * t)
        + 0.7 * np.cos(2 * np.pi * 90 * t)
        + 0.4 * np.cos(2 * np.pi * 200 * t)
    )


def test_efd_matches_oracle():
    x = three_cosines()
    want_bands, want_cerf, want_bn, m = ref_efd(x, 3)
    res = efd(jnp.asarray(x), 3)
    cnt = int(res.count)
    assert cnt == m + 2 == want_bands.shape[0]
    np.testing.assert_allclose(np.asarray(res.bands)[:cnt], want_bands, atol=1e-9)
    np.testing.assert_allclose(np.asarray(res.cerf)[:m], want_cerf, atol=1e-12)


def test_efd_fewer_peaks_than_requested():
    x = np.cos(2 * np.pi * 10 * np.arange(512) / 512)
    want_bands, _, _, m = ref_efd(x, 6)
    res = efd(jnp.asarray(x), 6)
    cnt = int(res.count)
    assert cnt == m + 2
    np.testing.assert_allclose(np.asarray(res.bands)[:cnt], want_bands, atol=1e-9)
    # padded rows are zero
    assert np.allclose(np.asarray(res.bands)[cnt:], 0.0)


def test_efd_noisy_signal():
    rng = np.random.default_rng(0)
    x = three_cosines() + 0.05 * rng.normal(size=1024)
    want_bands, _, _, m = ref_efd(x, 5)
    res = efd(jnp.asarray(x), 5)
    cnt = int(res.count)
    assert cnt == m + 2
    np.testing.assert_allclose(np.asarray(res.bands)[:cnt], want_bands, atol=1e-9)


def test_iterative_max_extracts_and_reconstructs():
    # flipped-domain greedy extraction: components + residual sum to input
    rng = np.random.default_rng(1)
    spec_row = rng.normal(size=257)  # an rfft-length row
    out = iterative_max(jnp.asarray(spec_row), elem=3, comb_size=4)
    assert out.shape == (4, 257)
    np.testing.assert_allclose(np.asarray(out).sum(0), spec_row, atol=1e-9)


def test_efd_real_band_count():
    rng = np.random.default_rng(2)
    row = rng.normal(size=129)
    bands, count, sort = efd_real(jnp.asarray(row), 4)
    assert bands.shape[0] == 6
    assert 0 <= int(count) <= 4


def test_efd_passthrough_below_two_raw_maxima():
    """EFD.py:29+81: a half-spectrum with < 2 raw maxima makes the
    reference return the input unchanged; fixed-shape encoding here is
    band row 0 == x, count == 1, all other rows zero."""
    x = np.exp(-5 * np.linspace(0, 1, 512))  # monotone |rfft|: 0 raw peaks
    want_bands, _, _, m = ref_efd(x, 3)
    assert m is None and want_bands.shape == (1, 512)
    np.testing.assert_array_equal(want_bands[0], x)
    res = efd(jnp.asarray(x), 3)
    assert int(res.count) == 1
    np.testing.assert_allclose(np.asarray(res.bands)[0], x, atol=1e-12)
    assert np.allclose(np.asarray(res.bands)[1:], 0.0)


def test_efd_real_matches_modified_oracle():
    """Band contents of the flipped-domain family pinned against an
    independent numpy port of modified_efd.py — including band 0's
    EMPTY lo==0 mirror (the reference's z[-hi:-0] slice)."""
    from reference.modified_efd_ref import (
        efd_real as ref_real, efd_slice_max as ref_max)

    rng = np.random.default_rng(5)
    row = rng.normal(size=257)
    want_bands, want_count, want_sort = ref_real(row, 4)
    bands, count, sort = efd_real(jnp.asarray(row), 4)
    assert int(count) == want_count
    for i in range(want_count + 2):
        np.testing.assert_allclose(np.asarray(bands)[i], want_bands[i],
                                   atol=1e-9)
    np.testing.assert_array_equal(np.asarray(sort)[:want_count], want_sort)
    np.testing.assert_allclose(
        np.asarray(efd_slice_max(jnp.asarray(row), 4)), ref_max(row, 4),
        atol=1e-9)


def test_efd_real_fewer_than_four_maxima_yields_no_bands():
    """modified_efd.py:65: < 4 maxima in the flipped half-signal -> zero
    bounds, count 0, zero bands; efd_slice_max passes the row through."""
    from reference.modified_efd_ref import segm_tec as ref_segm

    t = np.linspace(0, 1, 64)
    # choose a row whose irfft half-signal has 1-3 interior maxima
    row = np.fft.rfft(np.sin(2 * np.pi * 3 * t) + 0.2 * t).real
    robust = np.fft.irfft(row)
    _, want_count, _ = ref_segm(robust[: robust.size // 2], 4)
    assert want_count == 0  # the guard case, by construction
    nmax = len(
        [i for i in range(1, robust.size // 2 - 1)
         if robust[i] >= robust[i - 1] and robust[i] > robust[i + 1]]
    )
    assert 1 <= nmax < 4
    bands, count, _ = efd_real(jnp.asarray(row), 4)
    assert int(count) == 0
    assert np.allclose(np.asarray(bands), 0.0)
    np.testing.assert_allclose(
        np.asarray(efd_slice_max(jnp.asarray(row), 4)), row, atol=1e-12)


@pytest.mark.slow
def test_efd_bench_scale_matches_oracle():
    """VERDICT r4 item 7: exercise the exact per-row shape bench.py times
    (1M points, 12 bands, batched) against the sequential numpy oracle,
    so a correctness regression on the radix-sensitive 1M FFT path
    surfaces as a test failure, not a bench failure.  Two rows keep the
    1-core oracle runtime sane; rows are independent, so per-row parity
    covers the batch-8 bench shape."""
    rng = np.random.default_rng(3)
    batch, n, bands = 2, 1 << 20, 12
    t = np.linspace(0, 2 * np.pi, n)
    sigs = (np.cos(40 * t[None]) + 0.7 * np.cos(250 * t[None])
            + 0.4 * np.cos(1200 * t[None])
            + 0.1 * rng.normal(size=(batch, n)))
    res = efd(jnp.asarray(sigs, jnp.float64), bands)
    assert res.bands.shape == (batch, bands, n)
    for b in range(batch):
        want_bands, want_cerf, _, m = ref_efd(sigs[b], bands)
        cnt = int(res.count[b])
        assert cnt == want_bands.shape[0], b
        np.testing.assert_allclose(np.asarray(res.bands[b])[:cnt],
                                   want_bands, atol=1e-8, err_msg=f"row {b}")
        np.testing.assert_allclose(np.asarray(res.cerf[b])[:m], want_cerf,
                                   atol=1e-10, err_msg=f"row {b}")
