import numpy as np
import jax.numpy as jnp

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
