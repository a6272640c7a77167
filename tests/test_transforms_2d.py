import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyitd_tpu.decomp.itd2d import mad, crossways_baseline, totalextract2d
from pyitd_tpu.decomp.serial2d import sconcatenate, sdeconcatenate
from pyitd_tpu.decomp.stirft import compute_synthesis_window, stirft, istirft
from pyitd_tpu.decomp.lindeberg import recursive_filter, time_causal_stft
from pyitd_tpu.decomp.trend import custom_filter_engine, decompose_signal
from pyitd_tpu.utils.stats import fingerprint, sorted_median_index


def toy_image(n=48):
    xx, yy = np.meshgrid(np.linspace(0, 4 * np.pi, n), np.linspace(0, 3 * np.pi, n))
    rng = np.random.default_rng(0)
    return 20 * np.sin(xx) * np.cos(yy) + yy * 3 + rng.normal(size=(n, n))


def test_mad():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(30, 30))
    med = np.median(a)
    want = np.median(np.abs(a - med))
    assert abs(float(mad(jnp.asarray(a))) - want) < 1e-12


def test_crossways_smooths():
    img = toy_image()
    base = np.asarray(crossways_baseline(jnp.asarray(img)))
    assert base.shape == img.shape
    # a baseline is smoother than the input
    assert np.var(np.diff(base, axis=1)) < np.var(np.diff(img, axis=1))


def test_totalextract2d_reconstructs():
    img = toy_image(32)
    out = np.asarray(totalextract2d(jnp.asarray(img), jax.random.PRNGKey(0), iterations=4))
    assert out.shape == (2, 32, 32)
    np.testing.assert_allclose(out.sum(0), img, atol=1e-9)


def test_serialization_roundtrip():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(40, 12))
    ser = np.asarray(sconcatenate(jnp.asarray(img), 5)).reshape(-1)
    assert ser.size == (40 + 5) * 12 - 5
    # fake a 3-mode decomposition whose sum is the serial signal
    modes = np.stack([0.5 * ser, 0.3 * ser, 0.2 * ser], axis=1)
    imfs = np.asarray(sdeconcatenate(jnp.asarray(modes), 5, 12))
    assert imfs.shape == (40, 3, 12)
    np.testing.assert_allclose(imfs.sum(1), img, atol=1e-12)


def ref_stirft(x, window):
    n_fft, hop = 512, 128
    xp = np.zeros(x.size + 4 * hop - 1)
    xp[2 * hop : -(2 * hop - 1)] = x
    xp[: 2 * hop] = xp[2 * hop + 1 : 4 * hop + 1][::-1]
    xp[-(2 * hop - 1) :] = xp[-(2 * hop - 1) * 2 - 1 : -(2 * hop)][::-1]
    n_segs = (xp.size - n_fft) // hop + 1
    sx = np.stack([xp[i * hop : i * hop + n_fft] for i in range(n_segs)], axis=1)
    sx = sx * window[:, None]
    return np.fft.irfft(sx, axis=0)[:n_fft]


def test_stirft_matches_oracle():
    rng = np.random.default_rng(3)
    x = rng.normal(size=4000)
    win = compute_synthesis_window(np.hanning(512), 128)
    got = np.asarray(stirft(jnp.asarray(x), jnp.asarray(win)))
    want = ref_stirft(x, win)
    np.testing.assert_allclose(got, want, atol=1e-10)


def ref_istirft(sx, buf, window):
    n_fft, hop = 512, 128
    xbuf = np.fft.rfft(sx, n=n_fft * 2 - 2, axis=0).real
    x = np.zeros(sx.shape[1] * hop)
    n = 0
    for i in range(xbuf.shape[1]):
        processing = xbuf[:, i] * window
        out = processing[:hop].copy()
        out += buf[:hop]
        buf[:-hop] = buf[hop:]
        buf[-hop:] = 0.0
        buf += processing[-384:]
        x[n : n + hop] = out
        n += hop
    return x, buf


def test_istirft_matches_oracle():
    rng = np.random.default_rng(4)
    x = np.sin(np.linspace(0, 120, 6000)) + 0.1 * rng.normal(size=6000)
    msewin = compute_synthesis_window(np.hanning(512), 128)
    s = np.asarray(stirft(jnp.asarray(x), jnp.asarray(msewin)))
    want, want_buf = ref_istirft(s, np.zeros(384), np.hanning(512) * 2)
    got, got_buf = istirft(jnp.asarray(s), jnp.zeros(384), jnp.asarray(np.hanning(512) * 2))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)
    np.testing.assert_allclose(np.asarray(got_buf), want_buf, atol=1e-10)


def test_stirft_roundtrip_fidelity():
    # the reference pair is an approximate synthesis convention (~2% rms);
    # check the documented alignment y[384:] ~ x[128:] at high correlation
    rng = np.random.default_rng(4)
    x = np.sin(np.linspace(0, 120, 6000)) + 0.1 * rng.normal(size=6000)
    msewin = compute_synthesis_window(np.hanning(512), 128)
    s = stirft(jnp.asarray(x), jnp.asarray(msewin))
    y, _ = istirft(s, jnp.zeros(384), jnp.asarray(np.hanning(512) * 2))
    got = np.asarray(y)[384:]
    want = x[128 : 128 + got.size]
    m = min(got.size, want.size) - 512
    corr = np.corrcoef(got[:m], want[:m])[0, 1]
    assert corr > 0.999, corr


def test_recursive_filter_matches_sequential():
    rng = np.random.default_rng(5)
    x = rng.normal(size=300)
    mu = 1.7
    y = np.zeros_like(x)
    y[0] = x[0]
    for i in range(1, x.size):
        y[i] = y[i - 1] + (x[i] - y[i - 1]) / (1 + mu)
    got = np.asarray(recursive_filter(jnp.asarray(x), mu))
    np.testing.assert_allclose(got, y, atol=1e-12)


@pytest.mark.slow
def test_time_causal_stft_shapes():
    x = np.sin(np.linspace(0, 200, 4000))
    s = time_causal_stft(jnp.asarray(x), n_fft=256, hop_len=64, tau_max=0.1, c=2.0, k=4)
    assert s.shape[0] == 256 // 2 + 1
    assert np.all(np.asarray(s) >= 0)


def test_trend_decomposition_reconstructs():
    x = np.linspace(-10, 10, 2000)
    sig = np.sin(x) + 0.44 * np.cos(7 * x)
    comps, resid = decompose_signal(jnp.asarray(sig))
    total = np.sum(np.stack([np.asarray(c) for c in comps]), axis=0) + np.asarray(resid)
    np.testing.assert_allclose(total, sig, atol=1e-8)
    filtered = np.asarray(custom_filter_engine(jnp.asarray(sig)))
    assert filtered.shape == sig.shape


def test_fingerprint_and_median_index():
    rng = np.random.default_rng(6)
    vals = jnp.asarray(rng.normal(size=64))
    fp = float(fingerprint(vals))
    assert np.isfinite(fp)
    idx, completeness = sorted_median_index(vals)
    assert 0 <= int(idx) < 64
    assert -1.0 <= float(completeness) <= 1.0


def test_2d_ensemble_fixed_noise_parity_with_reference():
    """Exact same-noise parity: the JAX 2-D ensemble with injected noise
    realizations vs an independent numpy/scipy port of siftED2D cell 1's
    crossways + paired-noise loops (tests/reference/sifted2d_ref.py).
    This replaces RNG-incompatible statistical comparisons with a
    deterministic one (VERDICT r2 item 8)."""
    import jax
    from pyitd_tpu.decomp.itd2d import statistical_component
    from reference.sifted2d_ref import (
        statistical_component as ref_statistical_component)

    rng = np.random.default_rng(7)
    h = w = 48
    yy, xx = np.mgrid[0:h, 0:w]
    img = (np.sin(0.7 * xx) * np.cos(0.5 * yy)
           + 0.3 * rng.normal(size=(h, w)) + 0.01 * (xx + yy))
    noise = rng.normal(0, 0.2, size=(2, h, w))

    want = ref_statistical_component(img, noise)
    got = statistical_component(
        jnp.asarray(img), jax.random.PRNGKey(0), 4,
        noise=jnp.asarray(noise))
    atol = 5e-8 if jax.config.jax_enable_x64 else 5e-3
    np.testing.assert_allclose(np.asarray(got, np.float64), want, atol=atol)


def test_stirft_batched_matches_per_row():
    """The forward transform is batch-generic: a (channels, n) input must
    equal per-row 1-D transforms (the frame axis is second-to-last; the
    old axis=0 irfft transformed across channels)."""
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 4096))
    win = compute_synthesis_window(np.hanning(512), 128)
    got = np.asarray(stirft(jnp.asarray(x), jnp.asarray(win)))
    for c in range(3):
        want = np.asarray(stirft(jnp.asarray(x[c]), jnp.asarray(win)))
        np.testing.assert_allclose(got[c], want, atol=1e-12)


def test_dft_centered_stft_batched_matches_per_row():
    from pyitd_tpu.decomp.lindeberg import dft_centered_stft

    rng = np.random.default_rng(8)
    x = rng.normal(size=(2, 2048))
    win = jnp.ones(256)
    got = np.asarray(dft_centered_stft(jnp.asarray(x), 256, 64, win))
    for c in range(2):
        want = np.asarray(dft_centered_stft(jnp.asarray(x[c]), 256, 64, win))
        np.testing.assert_allclose(got[c], want, atol=1e-12)


def test_fingerprint_2d_matches_pywt_band_order():
    """2-D fingerprint concatenates subbands in pywt.dwtn key order
    (aa, ad, da, dd — first letter is axis 0); the DCT-then-sum is not
    permutation invariant, so a swapped middle pair changes the scalar."""
    from scipy import fftpack

    def np_haar(x, axis):
        x = np.moveaxis(x, axis, -1)
        if x.shape[-1] % 2:
            x = np.concatenate([x, x[..., -1:]], axis=-1)
        a = (x[..., 0::2] + x[..., 1::2]) / np.sqrt(2.0)
        d = (x[..., 0::2] - x[..., 1::2]) / np.sqrt(2.0)
        return np.moveaxis(a, -1, axis), np.moveaxis(d, -1, axis)

    rng = np.random.default_rng(3)
    x = rng.normal(size=(17, 23))
    a0, d0 = np_haar(x, 0)
    aa, ad = np_haar(a0, 1)
    da, dd = np_haar(d0, 1)
    coeff = np.concatenate([c.ravel() for c in (aa, ad, da, dd)])
    want = np.sum(fftpack.dct(coeff, axis=0)) / 0.6616518484657332
    got = float(fingerprint(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-9)
    # the swap was observable: the wrong order gives a different scalar
    wrong = np.concatenate([c.ravel() for c in (aa, da, ad, dd)])
    assert not np.isclose(
        np.sum(fftpack.dct(wrong, axis=0)) / 0.6616518484657332, want)


def test_sorted_median_completeness_large_ensemble():
    """helperfunctions.getsortedindex replaces only the logit ramp's
    +-inf ENDPOINTS with +-6; interior values beyond |6| (n >= ~406) are
    kept, and the completeness is the plain correlation coefficient."""
    from scipy.special import logit as np_logit

    rng = np.random.default_rng(4)
    data = rng.normal(size=500)
    a = np.sort(data)
    scaled = np.interp(a, (a.min(), a.max()), (-6, 6))
    y = np_logit(np.linspace(0, 1, data.size))
    y[np.isneginf(y)] = -6
    y[np.isposinf(y)] = 6
    want = np.corrcoef(scaled, y)[0, 1]
    idx, got = sorted_median_index(jnp.asarray(data))
    np.testing.assert_allclose(float(got), want, rtol=1e-12)
    sort = np.argsort(data)
    want_idx = sort[np.searchsorted(a, np.mean(a), side="left")]
    assert int(idx) == int(want_idx)
