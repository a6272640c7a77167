"""Successive Variational Mode Decomposition.

Behavioral contract (``/root/reference/svmd.py``, itself a translation of
Nazari & Sakhaei's MATLAB):

* odd-length inputs drop their first sample; the signal and a
  savgol(25, 8)-residual noise estimate are mirror-extended to 2T;
* spectral domain: ``omega = t - 0.5 - 1/T`` over the extended length, the
  one-sided ``fftshift(fft(.))`` with the lower half zeroed;
* per mode: an ADMM inner loop (mode update / center-frequency update /
  dual ascent — including the reference's *scalar* ``sum(h_hat)`` and
  ``sum(u_hat_i)`` couplings) inside an alpha-annealing schedule
  (m / bf bit-flag walk, Alpha = 10 -> e^m -> maxAlpha-1 -> maxAlpha+1);
* four stopping criteria: noise power, exact reconstruction, BIC, power of
  the last mode (default); the power criterion is evaluated with the
  *reset* Alpha (= minAlpha), as the reference does;
* reconstruction: conjugate-symmetric spectrum completion, ifft, de-mirror
  crop to the center half, modes sorted by center frequency.

TPU design: the inner ADMM and the annealing schedule are nested
``lax.while_loop``s over whole-spectrum vectors (one jitted kernel per
mode); the outer per-mode loop is a host loop (mode count is small and
data-dependent).  ``max_modes`` bounds runaway extraction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["svmd", "savgol_filter_matrix"]


def savgol_filter_matrix(n: int, window: int = 25, poly: int = 8) -> np.ndarray:
    """Dense (n, n) linear map equal to scipy.signal.savgol_filter(window,
    poly, mode='interp') — interior convolution + polynomial-fit edges.
    Precomputed host-side; n is static."""
    half = window // 2
    # centered abscissa: the polynomial projection operator is basis
    # independent, and centering keeps the Vandermonde well conditioned
    # (scipy's own edge polyfit is ~1e-5 noisier; the estimate feeds a
    # noise-floor measurement, where that is immaterial)
    A = np.vander(np.arange(window, dtype=float) - half, poly + 1, increasing=True)
    proj = A @ np.linalg.pinv(A)  # (window, window): fit-and-evaluate
    center_row = proj[half]  # interior FIR taps
    M = np.zeros((n, n))
    for i in range(half, n - half):
        M[i, i - half : i + half + 1] = center_row
    M[:half, :window] = proj[:half]
    M[n - half :, n - window :] = proj[half + 1 :]
    return M


def _mode_kernel(f_hat_onesided, omega_freqs, h_coup, u_coup,
                 omega_init, max_alpha, tau, tol, n_inner):
    """Extract one mode: returns (u_mode, omega_saved, alpha_saved).

    ``h_coup`` / ``u_coup`` are the couplings to previously extracted modes,
    per frequency bin.  With ``coupling="scalar"`` the caller passes
    constant vectors equal to the reference's whole-matrix ``np.sum``
    scalars; with ``coupling="vector"`` they are the published algorithm's
    per-frequency filter sum and mode sum."""
    T = omega_freqs.shape[0]
    eps = float(np.finfo(np.float64).eps)
    czero = jnp.zeros_like(f_hat_onesided)

    def inner_cond(s):
        return (s["udiff"] > tol) & (s["n"] + 1 < n_inner)

    def inner_body(s):
        alpha = s["alpha"]
        dom = omega_freqs - s["omega"]
        inter1 = (alpha**2) * dom**4
        denom = (1.0 + inter1) * (1.0 + 2.0 * alpha * dom**2) + h_coup
        u_new = (f_hat_onesided + inter1 * s["u"] + s["lam"] / 2.0) / denom

        inter2 = jnp.abs(u_new[T // 2 : T]) ** 2
        omega_new = jnp.dot(omega_freqs[T // 2 : T], inter2) / jnp.sum(inter2)

        lam_new = s["lam"] + tau * (
            f_hat_onesided
            - (
                u_new
                + (
                    inter1 * (f_hat_onesided - u_new - u_coup + s["lam"] / 2.0)
                    - u_coup
                )
                / (1.0 + inter1)
            )
            + u_coup
        )

        du = u_new - s["u"]
        # the reference's convergence ratio is a complex division whose
        # denominator is exactly 0+0j on the first pass (u starts at 0);
        # numpy yields inf+nanj there and |eps + inf+nanj| = inf, so the
        # loop CONTINUES.  vdot(z, z) has exactly-zero imaginary part, so
        # real division reproduces that semantics (x/0 = inf, 0/0 = nan)
        # where a complex-typed division would produce nan and stop early.
        num = jnp.real(jnp.vdot(du, du)) / T
        den = jnp.real(jnp.vdot(s["u"], s["u"])) / T
        udiff = jnp.abs(eps + num / den)
        return {
            **s,
            "u": u_new,
            "lam": lam_new,
            "omega_prev": s["omega"],
            "omega": omega_new,
            "udiff": udiff,
            "n": s["n"] + 1,
        }

    def mid_cond(s):
        return (s["alpha"] < max_alpha + 1) & jnp.isfinite(s["alpha"])

    def mid_body(s):
        s = lax.while_loop(inner_cond, inner_body, s)
        # alpha schedule (svmd.py:197-219)
        near = jnp.abs(s["m"] - jnp.log(max_alpha)) <= 1.0
        m = jnp.where(near, s["m"] + 0.05, s["m"] + 1.0)
        bf = jnp.where(near, s["bf"] + 1, s["bf"])
        alpha = jnp.where(bf >= 2, s["alpha"] + 1.0, s["alpha"])

        do_reset = alpha <= max_alpha - 1.0
        alpha = jnp.where(
            do_reset, jnp.where(bf == 1, max_alpha - 1.0, jnp.exp(m)), alpha
        )
        # on reset the current mode spectrum carries over as u[0]
        u = s["u"]
        lam = jnp.where(do_reset, czero, s["lam"])
        udiff = jnp.where(do_reset, tol + eps, s["udiff"])
        n = jnp.where(do_reset, 0, s["n"])
        omega = jnp.where(do_reset, omega_init, s["omega"])
        return {
            "u": u, "lam": lam, "omega": omega, "omega_prev": s["omega_prev"],
            "udiff": udiff, "n": n, "alpha": alpha, "m": m, "bf": bf,
        }

    init = {
        "u": czero,
        "lam": czero,
        "omega": jnp.asarray(omega_init, jnp.float64),
        "omega_prev": jnp.asarray(omega_init, jnp.float64),
        "udiff": jnp.asarray(tol + eps, jnp.float64),
        "n": jnp.asarray(0, jnp.int32),
        "alpha": jnp.asarray(10.0, jnp.float64),
        "m": jnp.asarray(0.0, jnp.float64),
        "bf": jnp.asarray(0, jnp.int32),
    }
    s = lax.while_loop(mid_cond, mid_body, init)
    omega_saved = jnp.maximum(s["omega_prev"], 0.0)  # omega_L[omega_L<0]=0
    return s["u"], omega_saved, s["alpha"]


@partial(jax.jit, static_argnames=("max_alpha", "tau", "tol", "n_inner"))
def _extract_mode(f_hat_onesided, omega_freqs, h_coup, u_coup,
                  omega_init, max_alpha, tau, tol, n_inner=300):
    return _mode_kernel(
        f_hat_onesided, omega_freqs, h_coup, u_coup,
        omega_init, max_alpha, tau, tol, n_inner,
    )


def svmd(signal, max_alpha: float = 200.0, tau: float = 0.5, tol: float = 1e-6,
         stopc: int = 4, init_omega: int = 0, *, max_modes: int = 30, seed: int = 0,
         coupling: str = "vector"):
    """Successive VMD.  Returns ``(u, u_hat, omega)`` like the reference:
    modes (L, T_in), their spectra (T_in, L), center frequencies (L,).

    ``coupling="vector"`` (default) uses the published algorithm's
    per-frequency couplings to previously extracted modes.
    ``coupling="scalar"`` reproduces the reference translation, which
    collapses those couplings with whole-matrix ``np.sum`` calls
    (``svmd.py:162,176-179``) — the huge scalar filter sum suppresses every
    mode after the first, so this tier is a fidelity mode, not a useful one.
    """
    x = np.asarray(signal, np.float64)
    if x.size % 2 != 0:
        x = x[1:]
    save_T = x.size
    fs = 1.0 / save_T

    sg = savgol_filter_matrix(save_T)
    y = sg @ x
    noise = x - y

    def mirror(v):
        T = v.size
        return np.concatenate([v[T // 2 - 1 :: -1], v, v[T : T // 2 - 1 : -1]])

    f = jnp.asarray(mirror(x))
    fn = jnp.asarray(mirror(noise))
    T = int(f.shape[0])
    t = np.arange(1, T + 1) / T
    omega_freqs = jnp.asarray(t - 0.5 - 1.0 / T)

    f_hat = jnp.fft.fftshift(jnp.fft.fft(f))
    f_hat_onesided = f_hat.at[: T // 2].set(0.0)
    f_hat_n = jnp.fft.fftshift(jnp.fft.fft(fn))
    f_hat_n_onesided = f_hat_n.at[: T // 2].set(0.0)
    noisepe = float(jnp.linalg.norm(f_hat_n_onesided) ** 2)

    rng = np.random.default_rng(seed)

    modes_u = []       # per-mode one-sided spectra (vectors)
    omegas = []
    alphas = []
    if coupling not in ("vector", "scalar"):
        raise ValueError(coupling)
    h_sum = 0.0        # scalar whole-matrix sum (coupling="scalar")
    u_scalar_sum = 0.0 + 0.0j
    h_vec = jnp.zeros_like(omega_freqs)          # per-frequency filter sum
    u_modes_sum = jnp.zeros_like(f_hat_onesided)  # per-frequency mode sum

    sigerror = []
    bic = []
    polm = []
    polm_temp = None
    min_alpha = 10.0
    done = False
    n2 = 0

    while not done and len(modes_u) < max_modes:
        if init_omega == 0:
            omega_init = 0.0
        else:
            omega_init, n2 = _draw_omega(rng, fs, np.asarray(omegas), n2)

        if coupling == "vector":
            h_coup = h_vec
            u_coup = u_modes_sum
        else:
            h_coup = jnp.full_like(omega_freqs, h_sum)
            u_coup = jnp.full_like(f_hat_onesided, u_scalar_sum)
        u, omega_d, alpha_exit = _extract_mode(
            f_hat_onesided, omega_freqs, h_coup, u_coup,
            float(omega_init), float(max_alpha), float(tau), float(tol),
        )
        modes_u.append(u)
        omegas.append(float(omega_d))
        alphas.append(float(alpha_exit))

        gamma = 1.0
        h_row = gamma / ((float(alpha_exit) ** 2) * np.asarray(omega_freqs - omega_d) ** 4)
        h_sum = h_sum + float(np.sum(h_row))
        h_vec = h_vec + jnp.asarray(h_row)
        u_scalar_sum = u_scalar_sum + complex(jnp.sum(u))
        u_modes_sum = u_modes_sum + u

        l = len(modes_u) - 1
        if stopc == 1:
            err = float(jnp.linalg.norm(f_hat_onesided - u_modes_sum) ** 2)
            sigerror.append(err)
            if n2 >= 300 or err <= round(noisepe):
                done = True
        elif stopc == 2:
            val = float(
                (jnp.linalg.norm(u_modes_sum - f_hat_onesided) ** 2 / T)
                / (jnp.linalg.norm(f_hat_onesided) ** 2 / T)
            )
            if n2 >= 300 or val < 0.005:
                done = True
        elif stopc == 3:
            err = float(jnp.linalg.norm(f_hat_onesided - u_modes_sum) ** 2)
            sigerror.append(err)
            bic.append(2 * T * np.log(err) + (3 * l) * np.log(2 * T))
            if l > 0 and bic[l] > bic[l - 1]:
                done = True
        else:
            # power of the last mode, evaluated with the reset Alpha
            dom = omega_freqs - omega_d
            val = float(
                jnp.linalg.norm(
                    (4.0 * min_alpha * u / (1.0 + 2.0 * min_alpha * dom**2))
                    * jnp.conj(u)
                )
            )
            if polm_temp is None:
                polm_temp = val
                polm.append(val / val)
            else:
                polm.append(val / polm_temp)
                if abs(polm[l] - polm[l - 1]) < tol:
                    done = True

        # Part 6 (svmd.py:332-336): counters reset after every saved mode —
        # the omega-draw attempt budget (n2 < 300) is per mode, not global
        n2 = 0

    # Part 7: reconstruction (svmd.py:338-360)
    L = len(modes_u)
    u_stack = jnp.stack(modes_u, axis=0)  # (L, T) one-sided
    full = jnp.zeros((L, T), jnp.complex128)
    full = full.at[:, T // 2 : T].set(u_stack[:, T // 2 : T])
    full = full.at[:, 1 : T // 2 + 1].set(jnp.conj(jnp.flip(u_stack[:, T // 2 : T], axis=1)))
    full = full.at[:, 0].set(jnp.conj(full[:, -1]))

    u_time = jnp.real(jnp.fft.ifft(jnp.fft.ifftshift(full, axes=1), axis=1))
    order = np.argsort(np.asarray(omegas))
    u_time = u_time[jnp.asarray(order)]
    omega_sorted = np.asarray(omegas)[order]
    u_out = u_time[:, T // 4 : 3 * T // 4]

    u_hat = jnp.conj(jnp.fft.fftshift(jnp.fft.fft(u_out, axis=1), axes=1)).T
    return np.asarray(u_out), np.asarray(u_hat), omega_sorted


def _draw_omega(rng, fs, existing, n2):
    """init_omega=1 path: random center-frequency init distinct from
    previously extracted modes (svmd.py:236-247)."""
    val = 0.0
    while n2 < 300:
        val = float(np.exp(np.log(fs) + (np.log(0.5) - np.log(fs)) * rng.random()))
        n2 += 1
        if existing.size == 0 or not np.any(np.abs(existing - val) < 0.02):
            break
    return val, n2
