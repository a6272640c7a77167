"""MXU four-step FFT (`ops/mxu_fft.py`) vs jnp.fft / a numpy f64 oracle.

The module replaces the XLA VPU FFT on the FFT-floor-bound configs
(EFD, ITD-Fourier); parity here is what licenses that swap."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyitd_tpu.ops.mxu_fft import fft_mxu, ifft_mxu, rfft_mxu, irfft_mxu


@pytest.mark.parametrize("n", [64, 1024, 4096, 1 << 16])
def test_fft_matches_f64_oracle(n):
    rng = np.random.default_rng(0)
    z = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    truth = np.fft.fft(z.astype(np.complex128))
    scale = np.max(np.abs(truth))
    got = np.asarray(fft_mxu(jnp.asarray(z)))
    assert got.dtype == np.complex64
    # f32-roundoff class: same order as XLA's own f32 FFT (~2e-7 at 64k)
    assert np.max(np.abs(got - truth)) / scale < 3e-6


@pytest.mark.parametrize("n", [256, 4096, 1 << 16])
def test_rfft_irfft_match_jnp(n):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, n)).astype(np.float32)
    truth = np.fft.rfft(x.astype(np.float64))
    scale = np.max(np.abs(truth))
    got = np.asarray(rfft_mxu(jnp.asarray(x)))
    assert got.shape == (3, n // 2 + 1)
    assert np.max(np.abs(got - truth)) / scale < 3e-6

    spec = truth.astype(np.complex64)
    back = np.asarray(irfft_mxu(jnp.asarray(spec), n))
    want = np.fft.irfft(truth, n=n)
    assert back.shape == (3, n)
    assert np.max(np.abs(back - want)) / np.max(np.abs(want)) < 3e-6


def test_ifft_roundtrip():
    rng = np.random.default_rng(2)
    n = 4096
    z = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
         ).astype(np.complex64)
    back = np.asarray(ifft_mxu(fft_mxu(jnp.asarray(z))))
    assert np.max(np.abs(back - z)) / np.max(np.abs(z)) < 3e-6


def test_band_filter_roundtrip_matches_xla():
    """The exact shape the decomposition tiers use: rfft -> real per-bin
    weights -> irfft, vs the jnp.fft route."""
    rng = np.random.default_rng(3)
    n = 1 << 14
    x = rng.standard_normal(n).astype(np.float32)
    w = np.zeros(n // 2 + 1, np.float32)
    w[100:900] = 0.5
    w[0] = 1.0
    want = np.asarray(jnp.fft.irfft(jnp.fft.rfft(jnp.asarray(x))
                                    * jnp.asarray(w), n=n))
    got = np.asarray(irfft_mxu(rfft_mxu(jnp.asarray(x)) * jnp.asarray(w), n))
    assert np.max(np.abs(got - want)) < 2e-5 * np.max(np.abs(x))


def test_decomposition_wiring_parity(monkeypatch):
    """EFD and the fused cascade iteration produce the same results (to
    f32 roundoff) whether their FFTs ride XLA or the MXU four-step —
    the dispatch gate (`use_mxu_fft`) must be transparent."""
    from pyitd_tpu.decomp.efd import efd
    from pyitd_tpu.decomp.itd_fourier import cascade_iteration

    rng = np.random.default_rng(5)
    n = 1 << 14
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(np.cos(40 * t) + 0.7 * np.cos(250 * t)
                    + 0.1 * rng.normal(size=n), jnp.float32)
    sr, n2 = 2048, 1 << 16
    t2 = np.arange(n2) / sr
    y = jnp.asarray(np.sin(2 * np.pi * 50 * t2)
                    + 0.6 * np.sin(2 * np.pi * 220 * t2)
                    + 0.2 * rng.normal(size=n2), jnp.float32)

    def run():
        jax.clear_caches()
        r = efd(x, 4)
        cur, is_mode, _, _, _ = cascade_iteration(y, sr)
        return (np.asarray(r.bands), np.asarray(r.count),
                np.asarray(cur), np.asarray(is_mode))

    monkeypatch.setenv("PYITD_MXU_FFT", "0")
    b0, c0, u0, m0 = run()
    monkeypatch.setenv("PYITD_MXU_FFT", "1")
    b1, c1, u1, m1 = run()
    jax.clear_caches()

    np.testing.assert_array_equal(c0, c1)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(b1, b0, atol=5e-6 * np.max(np.abs(b0)))
    np.testing.assert_allclose(u1, u0, atol=5e-6 * np.max(np.abs(u0)))


def test_rejects_bad_shapes():
    with pytest.raises(ValueError, match="power-of-two"):
        fft_mxu(jnp.zeros(48, jnp.complex64))
    with pytest.raises(ValueError, match="real array"):
        rfft_mxu(jnp.zeros(64, jnp.complex64))
    with pytest.raises(ValueError, match="bins"):
        irfft_mxu(jnp.zeros(64, jnp.complex64), 64)
