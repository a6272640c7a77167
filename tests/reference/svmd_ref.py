"""Independent numpy oracle for the reference SVMD translation.

A from-scratch numpy implementation of the exact behavioral contract of
``/root/reference/svmd.py`` (the Nazari & Sakhaei successive-VMD port),
including its quirks: the *scalar* whole-matrix ``sum`` couplings to
previously extracted modes, the alpha-annealing bit-flag walk
(10 -> e^m ramp -> maxAlpha-1 -> maxAlpha -> exit at maxAlpha+1, where
the maxAlpha stage inherits a converged udiff and so runs no inner
iterations), the center frequency saved one inner step behind the mode
spectrum, the filter row built from the *exit* alpha (maxAlpha+1), and
the power-of-last-mode criterion evaluated with the *reset* alpha
(minAlpha).  Used by tests/test_svmd.py to pin the fidelity tier
(``pyitd_tpu.decomp.svmd.svmd(coupling="scalar")``).

Structured as a per-mode extraction function plus a driver; written in
plain vectorized numpy with scipy's savgol (independent of both the
reference's inline translation style and the package's jax kernels).
"""
import numpy as np
from scipy.signal import savgol_filter

N_INNER = 300


def _extract_mode_ref(f1, omega_freqs, h_sum, u_sum, max_alpha, tau, tol):
    """One mode at scalar couplings; returns (u, omega_saved, alpha_exit)."""
    T = omega_freqs.size
    eps = np.finfo(float).eps

    u = np.zeros(T, complex)       # u_hat_L[n]
    lam = np.zeros(T, complex)
    omega = 0.0                    # omega_L[n]; index 0 is never written
    omega_prev = 0.0               # omega_L[n-1]
    udiff = tol + eps
    n = 0
    alpha, m, bf = 10.0, 0.0, 0

    while alpha < max_alpha + 1 and np.isfinite(alpha):
        while udiff > tol and n + 1 < N_INNER:
            inter1 = alpha**2 * (omega_freqs - omega) ** 4
            u_new = (f1 + inter1 * u + lam / 2.0) / (
                (1.0 + inter1) * (1.0 + 2.0 * alpha * (omega_freqs - omega) ** 2)
                + h_sum
            )
            inter2 = np.abs(u_new[T // 2 :]) ** 2
            omega_prev = omega
            omega = np.dot(omega_freqs[T // 2 :], inter2) / np.sum(inter2)
            lam = lam + tau * (
                f1
                - (u_new + (inter1 * (f1 - u_new - u_sum + lam / 2.0) - u_sum)
                   / (1.0 + inter1))
                + u_sum
            )
            du = u_new - u
            with np.errstate(divide="ignore", invalid="ignore"):
                # first pass divides by |u|^2 = 0 -> inf; the reference
                # relies on that to CONTINUE (see decomp/svmd.py)
                udiff = abs(eps + (np.vdot(du, du) / T) / ((np.vdot(u, u) / T)))
            u = u_new
            n += 1

        if abs(m - np.log(max_alpha)) > 1:
            m += 1.0
        else:
            m += 0.05
            bf += 1
        if bf >= 2:
            alpha += 1.0
        if alpha <= max_alpha - 1:
            alpha = max_alpha - 1.0 if bf == 1 else np.exp(m)
            udiff = tol + eps
            n = 0
            lam = np.zeros(T, complex)
            omega = 0.0  # restart reads the never-written omega_L[0]

    return u, max(omega_prev, 0.0), alpha


def svmd_ref(signal, max_alpha=200.0, tau=0.5, tol=1e-6, stopc=4,
             max_modes=30):
    """Reference-translation SVMD (scalar couplings, init_omega=0).

    Returns ``(u, u_hat, omega)``: modes (L, T_in), spectra (T_in, L),
    ascending center frequencies.
    """
    x = np.asarray(signal, float)
    if x.size % 2 != 0:
        x = x[1:]
    save_T = x.size

    noise = x - savgol_filter(x, 25, 8)
    half = save_T // 2
    f = np.concatenate([x[half - 1 :: -1], x, x[save_T : half - 1 : -1]])
    fn = np.concatenate([noise[half - 1 :: -1], noise,
                         noise[save_T : half - 1 : -1]])
    T = f.size
    t = np.arange(1, T + 1) / T
    omega_freqs = t - 0.5 - 1.0 / T

    f1 = np.fft.fftshift(np.fft.fft(f))
    f1[: T // 2] = 0.0
    fn1 = np.fft.fftshift(np.fft.fft(fn))
    fn1[: T // 2] = 0.0
    noisepe = np.linalg.norm(fn1) ** 2

    modes, omegas = [], []
    h_sum = 0.0
    u_sum = 0.0 + 0.0j
    u_vec_sum = np.zeros(T, complex)
    bic, polm = [], []
    polm_temp = None
    min_alpha = 10.0

    done = False
    while not done and len(modes) < max_modes:
        u, omega_d, alpha_exit = _extract_mode_ref(
            f1, omega_freqs, h_sum, u_sum, max_alpha, tau, tol)
        modes.append(u)
        omegas.append(omega_d)

        h_sum += np.sum(1.0 / (alpha_exit**2 * (omega_freqs - omega_d) ** 4))
        u_sum += np.sum(u)
        u_vec_sum += u

        l = len(modes) - 1
        if stopc == 1:
            err = np.linalg.norm(f1 - u_vec_sum) ** 2
            done = err <= round(noisepe)
        elif stopc == 2:
            val = (np.linalg.norm(u_vec_sum - f1) ** 2 / T) / (
                np.linalg.norm(f1) ** 2 / T)
            done = val < 0.005
        elif stopc == 3:
            err = np.linalg.norm(f1 - u_vec_sum) ** 2
            bic.append(2 * T * np.log(err) + (3 * l) * np.log(2 * T))
            done = l > 0 and bic[l] > bic[l - 1]
        else:
            dom = omega_freqs - omega_d
            val = np.linalg.norm(
                (4.0 * min_alpha * u / (1.0 + 2.0 * min_alpha * dom**2))
                * np.conj(u))
            if polm_temp is None:
                polm_temp = val
                polm.append(1.0)
            else:
                polm.append(val / polm_temp)
                done = abs(polm[l] - polm[l - 1]) < tol

    L = len(modes)
    full = np.zeros((L, T), complex)
    for l in range(L):
        full[l, T // 2 :] = modes[l][T // 2 :]
        full[l, T // 2 : 0 : -1] = np.conj(modes[l][T // 2 :])
        full[l, 0] = np.conj(full[l, -1])
    u_time = np.real(np.fft.ifft(np.fft.ifftshift(full, axes=(1,)), axis=1))

    order = np.argsort(omegas)
    u_time = u_time[order][:, T // 4 : 3 * T // 4]
    omega_sorted = np.asarray(omegas)[order]
    u_hat = np.conj(np.fft.fftshift(np.fft.fft(u_time, axis=1), axes=(1,))).T
    return u_time, u_hat, omega_sorted
