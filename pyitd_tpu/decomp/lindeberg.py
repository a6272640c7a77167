"""Time-causal analogue of the Gabor transform (Lindeberg et al. 2024).

Behavioral contract (``/root/reference/lindeberg.py``): a geometric ladder
of temporal scales ``tau_k = c^(2(k-K)) tau_max``, a cascade of K
first-order recursive filters ``y[n] = y[n-1] + (x[n]-y[n-1])/(1+mu_k)``,
then a DFT-centered STFT (halves-swapped frames, fftshifted window) of the
smoothed signal, combined with scale-normalized first and second temporal
derivatives: ``S = |Z| + sqrt(tau)|Z_t| + tau|Z_tt|``.

TPU design: each recursive filter is a linear recurrence
``y[n] = a y[n-1] + b x[n]`` evaluated with ``lax.associative_scan`` —
O(N log N) parallel work instead of the reference's sequential Python loop.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["recursive_filter", "dft_centered_stft", "time_causal_stft"]


def recursive_filter(x: jax.Array, mu: float) -> jax.Array:
    """First-order IIR y[n] = y[n-1] + (x[n]-y[n-1])/(1+mu), y[0] = x[0],
    via associative scan over the affine maps y -> a·y + c."""
    a_coef = mu / (1.0 + mu)
    b_coef = 1.0 / (1.0 + mu)
    n = x.shape[-1]
    a = jnp.full(x.shape, a_coef, x.dtype).at[..., 0].set(0.0)
    c = (b_coef * x).at[..., 0].set(x[..., 0])

    def combine(l, r):
        al, cl = l
        ar, cr = r
        return al * ar, ar * cl + cr

    _, y = lax.associative_scan(combine, (a, c), axis=-1)
    return y


@partial(jax.jit, static_argnames=("n_fft", "hop_len"))
def dft_centered_stft(x: jax.Array, n_fft: int, hop_len: int, window: jax.Array) -> jax.Array:
    """The reference's DFT-centered STFT (lindeberg.py:43-80): reflect pad,
    halves-swapped segmentation, fftshifted window, rfft per frame."""
    before = n_fft // 2
    after = n_fft // 2 - 1
    xp = jnp.zeros(x.shape[:-1] + (x.shape[-1] + n_fft - 1,), x.dtype)
    xp = xp.at[..., before:-after].set(x)
    xp = xp.at[..., :before].set(jnp.flip(xp[..., before + 1 : 2 * before + 1], axis=-1))
    xp = xp.at[..., -after:].set(jnp.flip(xp[..., -after * 2 - 1 : -before], axis=-1))

    n_segs = (xp.shape[-1] - n_fft) // hop_len + 1
    s20 = int(np.ceil(n_fft / 2))
    s21 = s20 - 1 if n_fft % 2 == 1 else s20

    starts = jnp.arange(n_segs) * hop_len
    # dft cisoid centering: frame = [xp[s+s21 : s+s21+s20], xp[s : s+s21]]
    def frame(s):
        first = lax.dynamic_slice_in_dim(xp, s + s21, s20, axis=-1)
        second = lax.dynamic_slice_in_dim(xp, s, s21, axis=-1)
        return jnp.concatenate([first, second], axis=-1)

    frames = jax.vmap(frame, out_axes=-1)(starts)
    shift = window.shape[0] // 2 if window.shape[0] % 2 == 0 else (window.shape[0] + 1) // 2
    win = jnp.concatenate([window[shift:], window[:shift]])
    # frame axis is second-to-last (axis=0 would be the batch axis for
    # (channels, n) inputs)
    return jnp.fft.rfft(frames * win[:, None], axis=-2)


def time_causal_stft(x: jax.Array, n_fft: int = 512, hop_len: int = 128,
                     tau_max: float = 0.1, c: float = 2.0, k: int = 4) -> jax.Array:
    """lindeberg.py:8-33."""
    x = jnp.asarray(x)
    tau = np.asarray([c ** (2 * (kk - k)) * tau_max for kk in range(1, k + 1)])
    mu = np.sqrt(c**2 - 1.0) * np.sqrt(tau)
    mu = np.insert(mu, 0, c ** (1 - k) * np.sqrt(tau_max))

    y = x
    for kk in range(k):
        y = recursive_filter(y, float(mu[kk]))

    hop_adj = max(1, int(hop_len * np.sqrt(tau_max)))
    n_fft_adj = max(n_fft, int(n_fft * np.sqrt(tau_max)))
    zx = dft_centered_stft(y, n_fft_adj, hop_adj, jnp.ones(n_fft_adj, x.dtype))

    zx_t = jnp.sqrt(tau_max) * jnp.gradient(zx, axis=1)
    zx_tt = tau_max * jnp.gradient(jnp.gradient(zx, axis=1), axis=1)
    return jnp.abs(zx) + jnp.abs(zx_t) + jnp.abs(zx_tt)
