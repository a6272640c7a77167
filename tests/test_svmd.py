import numpy as np
import jax.numpy as jnp
from scipy.signal import savgol_filter

from pyitd_tpu.decomp.svmd import svmd, savgol_filter_matrix


def test_savgol_matrix_matches_scipy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=200)
    M = savgol_filter_matrix(200, 25, 8)
    want = savgol_filter(x, 25, 8)  # default mode='interp'
    # scipy's edge polyfit is ill-conditioned (~1e-5 relative noise); the
    # centered projection here is the same operator computed more stably
    np.testing.assert_allclose(M @ x, want, atol=2e-4)


def two_tone(n=512):
    t = np.arange(n) / n
    lo = np.cos(2 * np.pi * 11 * t)
    hi = 0.6 * np.cos(2 * np.pi * 97 * t)
    return lo, hi, lo + hi


def test_svmd_separates_two_tones():
    lo, hi, x = two_tone()
    u, u_hat, omega = svmd(x, max_modes=6)
    assert u.shape[1] == x.size
    assert list(omega) == sorted(omega)
    # each ground-truth tone should be well captured by one extracted mode
    for truth in (lo, hi):
        best = max(
            abs(np.corrcoef(u[k], truth)[0, 1]) for k in range(u.shape[0])
        )
        assert best > 0.95, best

    # the mode sum approximates the signal
    rel = np.linalg.norm(u.sum(0) - x) / np.linalg.norm(x)
    assert rel < 0.2, rel


def test_svmd_odd_length_drops_first_sample():
    _, _, x = two_tone(511 + 1)
    u, _, _ = svmd(np.concatenate([[5.0], x]), max_modes=3)
    assert u.shape[1] == x.size


def test_svmd_noisy_stop1():
    rng = np.random.default_rng(1)
    _, _, x = two_tone()
    noisy = x + 0.1 * rng.normal(size=x.size)
    u, _, omega = svmd(noisy, stopc=1, max_modes=8)
    assert 1 <= u.shape[0] <= 8
    assert np.all(np.isfinite(u))


def test_svmd_scalar_coupling_matches_reference_oracle():
    """The fidelity tier (coupling="scalar") reproduces an independent
    numpy implementation of the reference translation, quirks included:
    scalar whole-matrix coupling sums, the alpha bit-flag walk, the
    one-step-behind saved omega, the exit-alpha filter row, and the
    reset-alpha power criterion (tests/reference/svmd_ref.py)."""
    from tests.reference.svmd_ref import svmd_ref

    lo, hi, sig = two_tone(256)

    for stopc in (4, 2, 3):
        u_r, _, om_r = svmd_ref(sig, stopc=stopc)
        u_j, _, om_j = svmd(sig, stopc=stopc, coupling="scalar")
        assert u_j.shape == u_r.shape, (stopc, u_j.shape, u_r.shape)
        np.testing.assert_allclose(om_j, om_r, rtol=0, atol=1e-8)
        np.testing.assert_allclose(u_j, u_r, rtol=0, atol=1e-6)
