import numpy as np
import jax.numpy as jnp
import scipy.stats as stats

from pyitd_tpu.decomp.fabada import fabada, pfabada, auto_sigma, psnr


def ref_fabada(data, data_variance, max_iter=3000):
    """Numpy oracle for the canonical FABADA (PFABADA.ipynb cell 1)."""
    data = np.array(data, float)
    dv = np.broadcast_to(np.array(data_variance, float), data.shape).copy()
    data[np.isnan(data)] = 0
    dv[np.isnan(data)] = 1e-15

    def running_mean(dat):
        mean = np.array(dat)
        if mean.ndim == 1:
            mean[:-1] += dat[1:]
            mean[1:] += dat[:-1]
            mean[1:-1] /= 3
            mean[0] /= 2
            mean[-1] /= 2
        else:
            mean[:-1, :] += dat[1:, :]
            mean[1:, :] += dat[:-1, :]
            mean[:, :-1] += dat[:, 1:]
            mean[:, 1:] += dat[:, :-1]
            mean[1:-1, 1:-1] /= 5
            mean[0, 1:-1] /= 4
            mean[-1, 1:-1] /= 4
            mean[1:-1, 0] /= 4
            mean[1:-1, -1] /= 4
            mean[0, 0] /= 3
            mean[-1, -1] /= 3
            mean[0, -1] /= 3
            mean[-1, 0] /= 3
        return mean

    def ev(mu1, mu2, v1, v2):
        return np.exp(-((mu1 - mu2) ** 2) / (2 * (v1 + v2))) / np.sqrt(
            2 * np.pi * (v1 + v2)
        )

    pm, pv = data, dv
    evid = ev(0, np.sqrt(dv), 0, dv)
    ev0 = evid
    chi2_pdf, chi2_pdf_deriv, chi2_min = 0.0, 0.0, data.size
    bw, bm = 0.0, 0.0
    it = 0
    while True:
        chi2_pdf_prev = chi2_pdf
        chi2_pdf_deriv_prev = chi2_pdf_deriv
        ev_prev = np.mean(evid)
        it += 1
        prm = running_mean(pm)
        prv = pv
        pv = 1 / (1 / prv + 1 / dv)
        pm = (prm / prv + data / dv) * pv
        evid = ev(prm, data, prv, dv)
        ev_deriv = np.mean(evid) - ev_prev
        chi2 = np.sum((data - pm) ** 2 / dv)
        chi2_pdf = stats.chi2.pdf(chi2, df=data.size)
        chi2_pdf_deriv = chi2_pdf - chi2_pdf_prev
        chi2_pdf_snd = chi2_pdf_deriv - chi2_pdf_deriv_prev
        mw = evid * chi2
        bw = bw + mw
        bm = bm + mw * pm
        if it == 1:
            chi2_min = chi2
        if ((chi2 > data.size and chi2_pdf_snd >= 0) and ev_deriv < 0) or it > max_iter:
            mw = ev0 * chi2_min
            bw = bw + mw
            bm = bm + mw * data
            break
    return bm / bw


def noisy_arp(n=256, sigma=10.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n)
    clean = 80 * np.exp(-((t - 0.3) ** 2) / 0.002) + 50 * np.exp(
        -((t - 0.6) ** 2) / 0.005
    )
    return clean, clean + sigma * rng.normal(size=n)


def test_fabada_matches_oracle_1d():
    clean, noisy = noisy_arp()
    want = ref_fabada(noisy, 10.0**2)
    got = np.asarray(fabada(jnp.asarray(noisy), 10.0**2))
    np.testing.assert_allclose(got, want, atol=1e-8, rtol=1e-8)


def test_fabada_improves_psnr():
    clean, noisy = noisy_arp()
    rec = np.asarray(fabada(jnp.asarray(noisy), 100.0))
    assert float(psnr(rec, clean)) > float(psnr(noisy, clean)) + 3.0


def test_fabada_2d():
    rng = np.random.default_rng(1)
    xx, yy = np.meshgrid(np.linspace(-1, 1, 48), np.linspace(-1, 1, 48))
    clean = 100 * np.exp(-(xx**2 + yy**2) / 0.2)
    noisy = clean + 8.0 * rng.normal(size=clean.shape)
    want = ref_fabada(noisy, 64.0)
    got = np.asarray(fabada(jnp.asarray(noisy), 64.0))
    np.testing.assert_allclose(got, want, atol=1e-8, rtol=1e-8)
    assert float(psnr(got, clean)) > float(psnr(noisy, clean))


def test_pfabada_runs_and_denoises():
    clean, noisy = noisy_arp(sigma=8.0, seed=2)
    rec = np.asarray(pfabada(jnp.asarray(noisy), 8.0))
    assert np.all(np.isfinite(rec))
    assert float(psnr(rec, clean)) > float(psnr(noisy, clean))


def test_auto_sigma_estimates_noise():
    rng = np.random.default_rng(3)
    noise = rng.normal(size=4096) * 7.0
    est = float(auto_sigma(jnp.asarray(noise)))
    assert 5.5 < est < 8.5
    # smooth signal + noise: estimate still tracks the noise floor
    t = np.linspace(0, 1, 4096)
    est2 = float(auto_sigma(jnp.asarray(100 * np.sin(2 * np.pi * 3 * t) + 7.0 * rng.normal(size=4096))))
    assert 5.5 < est2 < 9.0


def test_fabada_nan_keeps_caller_variance():
    """Canonical-cell NaN semantics: NaNs are zeroed in the data BEFORE
    the reference's `data_variance[np.isnan(data)] = 1e-15` line, so that
    substitution is a no-op — NaN positions keep the caller's variance.
    (The numba tier, pfabada, substitutes for real; it works on a copy.)"""
    clean, noisy = noisy_arp()
    noisy = noisy.copy()
    noisy[40:43] = np.nan
    want = ref_fabada(noisy, 10.0**2)
    got = np.asarray(fabada(jnp.asarray(noisy), 10.0**2))
    np.testing.assert_allclose(got, want, atol=1e-8, rtol=1e-8)
    assert np.isfinite(got).all()
