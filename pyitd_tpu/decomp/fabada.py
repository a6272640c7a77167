"""FABADA / PFABADA — iterative Bayesian denoising.

Three tiers, matching the reference's three implementations:

* :func:`fabada` — the canonical 1-D/2-D algorithm (PFABADA.ipynb cell 1):
  running-mean priors (3-tap line / 5-point cross with edge divisors),
  correct Gaussian evidence, chi²-pdf convergence test.
* :func:`pfabada` — the numba variant (``/root/reference/pfabada.py:91-225``)
  with σ as a parameter and that file's exact quirks: the 3-tap prior with
  special end formulas, the evidence denominator's unbalanced parenthesis
  (``sqrt(2π)·prior_variance + data_variance``), χ²/N + first/second
  derivative stopping with tolerance 1e-15, cap 1000.
* :func:`auto_sigma` — the db2-wavelet noise estimator the notebook tier
  inlines (median |detail| / Γ-ppf constant, the skimage recipe).

Everything is whole-array arithmetic inside a ``lax.while_loop`` — this
algorithm is already TPU-shaped.  The denoised output is the
evidence-weighted average over the iteration path (Bayesian model
averaging), including the iteration-zero term.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["fabada", "pfabada", "auto_sigma", "psnr"]


def _running_mean(d: jax.Array) -> jax.Array:
    """The canonical FABADA prior smoother (PFABADA.ipynb `running_mean`)."""
    if d.ndim == 1:
        s = d.at[:-1].add(d[1:]).at[1:].add(d[:-1])
        div = jnp.full_like(d, 3.0).at[0].set(2.0).at[-1].set(2.0)
        return s / div
    if d.ndim == 2:
        s = (
            d.at[:-1, :].add(d[1:, :])
            .at[1:, :].add(d[:-1, :])
            .at[:, :-1].add(d[:, 1:])
            .at[:, 1:].add(d[:, :-1])
        )
        div = jnp.full_like(d, 5.0)
        div = div.at[0, :].set(4.0).at[-1, :].set(4.0)
        div = div.at[:, 0].set(4.0).at[:, -1].set(4.0)
        div = div.at[0, 0].set(3.0).at[-1, -1].set(3.0)
        div = div.at[0, -1].set(3.0).at[-1, 0].set(3.0)
        return s / div
    raise ValueError("fabada supports 1-D and 2-D data")


def _f64():
    """float64 when x64 is on (reference numpy semantics), else the f32 the
    backend would truncate to anyway — avoids the per-trace truncation
    warning without changing any computed value."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def _evidence(mu1, mu2, var1, var2):
    return jnp.exp(-((mu1 - mu2) ** 2) / (2.0 * (var1 + var2))) / jnp.sqrt(
        2.0 * jnp.pi * (var1 + var2)
    )


@partial(jax.jit, static_argnames=("max_iter",))
def fabada(data: jax.Array, data_variance, max_iter: int = 3000) -> jax.Array:
    """Canonical FABADA (1-D or 2-D).  ``data_variance`` may be scalar or an
    array of ``data``'s shape."""
    x = jnp.where(jnp.isnan(data), 0.0, jnp.asarray(data, _f64()))
    dv = jnp.broadcast_to(jnp.asarray(data_variance, _f64()), x.shape)
    # NO 1e-15 substitution at NaN positions: the canonical cell zeroes
    # data's NaNs IN PLACE before `data_variance[np.isnan(data)] = 1e-15`,
    # so that line sees an all-False mask and is a provable no-op — NaN
    # samples keep the caller's variance.  (The numba tier works on a
    # copy, so ITS substitution is real — see :func:`pfabada`.)
    size = float(x.size)

    ev0 = _evidence(0.0, jnp.sqrt(dv), 0.0, dv)

    def cond(c):
        return ~c["converged"]

    def body(c):
        it = c["iteration"] + 1
        prior_mean = _running_mean(c["post_mean"])
        prior_var = c["post_var"]
        post_var = 1.0 / (1.0 / prior_var + 1.0 / dv)
        post_mean = (prior_mean / prior_var + x / dv) * post_var

        ev = _evidence(prior_mean, x, prior_var, dv)
        ev_deriv = jnp.mean(ev) - c["ev_prev"]

        chi2_data = jnp.sum((x - post_mean) ** 2 / dv)
        chi2_pdf = jax.scipy.stats.chi2.pdf(chi2_data, df=size)
        chi2_pdf_deriv = chi2_pdf - c["chi2_pdf"]
        chi2_pdf_snd = chi2_pdf_deriv - c["chi2_pdf_deriv"]

        mw = ev * chi2_data
        bw = c["bayes_w"] + mw
        bm = c["bayes_m"] + mw * post_mean
        chi2_min = jnp.where(it == 1, chi2_data, c["chi2_min"])

        # it >= max_iter + 1, not it > max_iter: integer scalar strict >
        # in lax loops miscompiles as >= on the attached TPU backend
        # (COVERAGE.md known platform issue)
        converged = ((chi2_data > size) & (chi2_pdf_snd >= 0) & (ev_deriv < 0)) | (
            it >= max_iter + 1
        )
        # iteration-zero term folds in at convergence
        mw0 = ev0 * chi2_min
        bw = jnp.where(converged, bw + mw0, bw)
        bm = jnp.where(converged, bm + mw0 * x, bm)
        return {
            "post_mean": post_mean,
            "post_var": post_var,
            "ev_prev": jnp.mean(ev),
            "chi2_pdf": chi2_pdf,
            "chi2_pdf_deriv": chi2_pdf_deriv,
            "chi2_min": chi2_min,
            "bayes_w": bw,
            "bayes_m": bm,
            "iteration": it,
            "converged": converged,
        }

    init = {
        "post_mean": x,
        "post_var": dv,
        "ev_prev": jnp.mean(ev0),
        "chi2_pdf": jnp.asarray(0.0, _f64()),
        "chi2_pdf_deriv": jnp.asarray(0.0, _f64()),
        "chi2_min": jnp.asarray(size, _f64()),
        "bayes_w": jnp.zeros_like(x),
        "bayes_m": jnp.zeros_like(x),
        "iteration": jnp.asarray(0, jnp.int32),
        "converged": jnp.asarray(False),
    }
    c = lax.while_loop(cond, body, init)
    return c["bayes_m"] / c["bayes_w"]


def _pfabada_prior(pm: jax.Array) -> jax.Array:
    """pfabada.py:143-147: interior 3-tap mean; ends use half-sums."""
    left = jnp.concatenate([pm[:1], pm[:-1]])
    right = jnp.concatenate([pm[1:], pm[-1:]])
    out = (left + pm + right) / 3.0
    out = out.at[0].set((pm[0] + (pm[1] + pm[2]) / 2.0) / 3.0)
    out = out.at[-1].set((pm[-1] + (pm[-2] + pm[-3]) / 2.0) / 3.0)
    return out


@partial(jax.jit, static_argnames=("max_iterations",))
def pfabada(data: jax.Array, sigma, max_iterations: int = 1000) -> jax.Array:
    """The pfabada.py numba tier, quirks included (see module docstring).

    2-D inputs use the reference's sketched generalization
    (``pfabada.py:228-255``): the prior is the average of the row-direction
    and column-direction 1-D smoothers.
    """
    data = jnp.asarray(data, _f64())
    nan = jnp.isnan(data)
    x = jnp.where(nan, 0.0, data)
    n = float(x.size)
    tol = 1e-15

    sigma = jnp.asarray(sigma, _f64())
    dv = jnp.broadcast_to(sigma**2, x.shape)
    dv = jnp.where(nan | (dv == 0), 1e-15, dv)

    if x.ndim == 1:
        prior_fn = _pfabada_prior
    elif x.ndim == 2:
        prior_fn = lambda pm: 0.5 * (
            jax.vmap(_pfabada_prior)(pm) + jax.vmap(_pfabada_prior)(pm.T).T
        )
    else:
        raise ValueError("pfabada supports 1-D and 2-D data")

    # initial evidence, formula-for-formula (pfabada.py:131-136):
    # exp(-dv/(2 dv)) / (sqrt(2 pi) * dv)
    ev0 = jnp.exp(-jnp.square(jnp.sqrt(dv) * -1.0) / (2.0 * dv)) / (
        jnp.sqrt(2.0 * jnp.pi) * dv
    )

    def cond(c):
        return ~c["done"]

    def body(c):
        prior_mean = prior_fn(c["post_mean"])
        prior_var = c["post_var"]
        post_var = jnp.where(
            prior_var > 0, (dv * prior_var) / (dv + prior_var), 0.0
        )
        post_mean = jnp.where(
            (prior_var > 0) & (post_var > 0),
            (prior_mean / prior_var + x / dv) * post_var,
            prior_mean,
        )
        # the reference's unbalanced-paren denominator, kept verbatim
        ev = jnp.exp(-jnp.square(prior_mean - x) / (2.0 * (prior_var + dv))) / (
            jnp.sqrt(2.0 * jnp.pi) * prior_var + dv
        )
        ev_deriv = jnp.mean(ev) - c["ev_prev"]

        chi2 = jnp.sum((x - post_mean) ** 2 / dv) / n
        chi2_deriv = chi2 - c["chi2_prev"]
        chi2_snd = chi2_deriv - c["chi2_deriv_prev"]
        chi2_min = jnp.where(c["iterations"] == 1, chi2, c["chi2_min"])

        mw = ev * chi2
        bw = c["bayes_w"] + mw
        bm = c["bayes_m"] + mw * post_mean

        done = ((chi2 > 1.0) & (ev_deriv < 0) & (chi2_snd < tol)) | (
            c["iterations"] >= max_iterations + 1
        )
        return {
            "post_mean": post_mean,
            "post_var": post_var,
            "ev_prev": jnp.mean(ev),
            "chi2_prev": chi2,
            "chi2_deriv_prev": chi2_deriv,
            "chi2_min": chi2_min,
            "bayes_w": bw,
            "bayes_m": bm,
            "iterations": c["iterations"] + jnp.where(done, 0, 1),
            "done": done,
        }

    init = {
        "post_mean": x,
        "post_var": dv,
        "ev_prev": jnp.mean(ev0),
        "chi2_prev": jnp.asarray(0.0, _f64()),
        "chi2_deriv_prev": jnp.asarray(0.0, _f64()),
        "chi2_min": jnp.asarray(0.0, _f64()),
        "bayes_w": jnp.zeros_like(x),
        "bayes_m": jnp.zeros_like(x),
        "iterations": jnp.asarray(1, jnp.int32),
        "done": jnp.asarray(False),
    }
    c = lax.while_loop(cond, body, init)

    mw0 = ev0 * c["chi2_min"]
    bw = c["bayes_w"] + mw0
    bm = c["bayes_m"] + mw0 * x
    return jnp.where(bw > 0, bm / bw, x)


# db2 high-pass decomposition filter (Daubechies-2 QMF)
_DB2_LO = np.array(
    [
        (1 + np.sqrt(3)) / (4 * np.sqrt(2)),
        (3 + np.sqrt(3)) / (4 * np.sqrt(2)),
        (3 - np.sqrt(3)) / (4 * np.sqrt(2)),
        (1 - np.sqrt(3)) / (4 * np.sqrt(2)),
    ]
)
_DB2_HI = np.array([_DB2_LO[3], -_DB2_LO[2], _DB2_LO[1], -_DB2_LO[0]])


def _dwt_detail_1d(x: jax.Array) -> jax.Array:
    """Single-level db2 detail coefficients with symmetric padding along the
    last axis (pywt `dwt` convention)."""
    flt = np.asarray(_DB2_HI[::-1])  # correlation form
    pad = 3
    left = jnp.flip(x[..., :pad], axis=-1)
    right = jnp.flip(x[..., -pad:], axis=-1)
    xp = jnp.concatenate([left, x, right], axis=-1)
    m = xp.shape[-1] - 3  # valid correlation length
    y = sum(float(flt[k]) * xp[..., k : k + m] for k in range(4))
    return y[..., 1::2]


def auto_sigma(x: jax.Array) -> jax.Array:
    """Robust noise σ via db2 wavelet detail MAD (the skimage recipe the
    notebook tier inlines: ``median(|detail|) / 0.6616518484657332``).

    For 2-D input the detail band is the separable high-pass along both
    axes (pywt ``dwtn`` 'dd')."""
    x = jnp.asarray(x, _f64())
    d = _dwt_detail_1d(x)
    if x.ndim == 2:
        d = jnp.moveaxis(_dwt_detail_1d(jnp.moveaxis(d, 0, -1)), -1, 0)
    return jnp.median(jnp.abs(d)) / 0.6616518484657332


def psnr(recover, signal, L: float = 255.0):
    """PSNR as the reference's harness defines it (PFABADA.ipynb cell 1)."""
    recover = jnp.asarray(recover)
    signal = jnp.asarray(signal)
    mse = jnp.sum((recover - signal) ** 2) / recover.size
    return 10.0 * jnp.log10(L**2 / mse)
