"""STIRFT — the short-time *inverse*-FFT transform pair.

Behavioral contract (``/root/reference/stirft.py``): a real-valued
time-frequency transform used for streaming filtering: odd-reflect pad by
2·hop, frame (n_fft=512, hop=128), window, **irfft per frame** (forward);
inverse = rfft per frame + hop-sized overlap-add through a persistent
(n_fft - hop)-sample buffer, which makes the inverse streaming-capable.
Convention: the forward uses the Griffin-Lim MSE synthesis window computed
from hann, the inverse uses 2·hann (``stirft.py:113-119``).

The reference ships numpy and torch ports; here one JAX implementation
covers both (the overlap-add recursion is a ``lax.scan``, so the inverse
jits and the carried buffer can be threaded across streamed chunks).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["compute_synthesis_window", "stirft", "istirft"]


def compute_synthesis_window(analysis_window: np.ndarray, hop: int) -> np.ndarray:
    """Griffin-Lim optimal (MSE) synthesis window for an analysis window and
    frame shift (stirft.py:1-37).  Host-side: windows are static config."""
    w = np.asarray(analysis_window, np.float64)
    L = w.shape[0]
    norm = np.zeros_like(w)
    n = 0
    while n - hop > -L:
        n -= hop
    while n < L:
        if n == 0:
            norm += w**2
        elif n < 0:
            norm[: n + L] += w[-n - L:] ** 2
        else:
            norm[n:] += w[:-n] ** 2
        n += hop
    return w / norm


@partial(jax.jit, static_argnames=("n_fft", "hop_len"))
def stirft(x: jax.Array, window: jax.Array, *, n_fft: int = 512, hop_len: int = 128) -> jax.Array:
    """Forward STIRFT: (n_fft, n_segs) real frames of the inverse FFT."""
    pad = 2 * hop_len
    # reflect pad excluding the edge sample (stirft.py:49-52)
    xp = jnp.zeros(x.shape[:-1] + (x.shape[-1] + 4 * hop_len - 1,), x.dtype)
    xp = xp.at[..., pad : -(pad - 1)].set(x)
    xp = xp.at[..., :pad].set(jnp.flip(xp[..., pad + 1 : 2 * pad + 1], axis=-1))
    xp = xp.at[..., -(pad - 1) :].set(
        jnp.flip(xp[..., -(pad - 1) * 2 - 1 : -pad], axis=-1)
    )

    n_segs = (xp.shape[-1] - n_fft) // hop_len + 1
    starts = jnp.arange(n_segs) * hop_len
    frames = jax.vmap(
        lambda s: lax.dynamic_slice_in_dim(xp, s, n_fft, axis=-1), out_axes=-1
    )(starts)
    sx = frames * window[:, None]
    # transform along the frame axis (second-to-last): axis=0 would hit
    # the batch axis for (channels, n) inputs and silently scramble them
    return jnp.fft.irfft(sx, axis=-2)[..., :n_fft, :]


@partial(jax.jit, static_argnames=("n_fft", "hop_len"))
def istirft(sx: jax.Array, persistent_buffer: jax.Array, window: jax.Array,
            *, n_fft: int = 512, hop_len: int = 128):
    """Inverse STIRFT via streaming overlap-add.

    Returns ``(x, buffer)``; thread ``buffer`` into the next call to stream
    block-by-block (the reference's 384-sample persistent buffer)."""
    if sx.ndim != 2:
        raise ValueError(
            "istirft streams one channel: sx must be (n_fft, n_segs); "
            "vmap over channels for banks"
        )
    keep = n_fft - hop_len
    xbuf = jnp.fft.rfft(sx, n=n_fft * 2 - 2, axis=0).real  # (n_fft, segs)

    def step(buf, frame):
        processing = frame * window
        out = processing[:hop_len] + buf[:hop_len]
        buf = jnp.concatenate([buf[hop_len:], jnp.zeros(hop_len, buf.dtype)])
        buf = buf + processing[-keep:]
        return buf, out

    buf, outs = lax.scan(step, persistent_buffer, xbuf.T)
    return outs.reshape(-1), buf
