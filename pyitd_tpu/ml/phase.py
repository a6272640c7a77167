"""Hypersphere phase heads + spectral mixer (MachineIntelligence.ipynb).

``add_hypersphere_phase_heads`` splits channels into S heads; each head
s >= 1 adds the cosine similarity between its L2-normalized vector at time t
and at time t-s (lag = head index, clamped at 0), scaled by 1/E.  The
optional scalar path measures lag-1 self-coherence across heads.  Works for
real or complex inputs (complex-safe inner products).

``Mixer``: FFT across channels -> phase heads in the spectral domain ->
inverse FFT -> causal depthwise convolution over time.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["add_hypersphere_phase_heads", "PhaseHeads", "Mixer"]


def _cnorm(z, eps):
    denom = jnp.maximum(jnp.linalg.norm(z, axis=-1, keepdims=True), eps)
    return z / denom


def add_hypersphere_phase_heads(x, num_segs: int, eps: float = 1e-8,
                                return_scalar: bool = False):
    b, t, c = x.shape
    if t == 0 or num_segs <= 0:
        return (x, None) if return_scalar else x
    assert c % num_segs == 0
    e = c // num_segs
    xh = jnp.swapaxes(x.reshape(b, t, num_segs, e), 1, 2)  # (B,S,T,E)

    if num_segs > 1:
        v = _cnorm(xh[:, 1:], eps)  # (B,S-1,T,E)
        lags = jnp.arange(1, num_segs)  # head s anchors at t-s
        src = jnp.maximum(jnp.arange(t)[None, :] - lags[:, None], 0)  # (S-1,T)
        anchor = jnp.take_along_axis(v, src[None, :, :, None], axis=2)
        cos_a = jnp.sum(v * jnp.conj(anchor), axis=-1)  # (B,S-1,T)
        xproc = xh[:, 1:] + (cos_a / float(e))[..., None]
        xh = jnp.concatenate([xh[:, :1], xproc], axis=1)

    y = jnp.swapaxes(xh, 1, 2).reshape(b, t, c)
    if not return_scalar:
        return y

    v_all = _cnorm(xh, eps)
    t_prev = jnp.maximum(jnp.arange(t) - 1, 0)
    anchor_all = jnp.take_along_axis(
        v_all, t_prev[None, None, :, None].astype(jnp.int32), axis=2
    )
    cos1 = jnp.sum(v_all * jnp.conj(anchor_all), axis=-1)
    if jnp.iscomplexobj(cos1):
        cos1 = cos1.real
    cos1 = jnp.clip(cos1, -1.0 + eps, 1.0 - eps)
    s_norm = cos1 / jnp.maximum(jnp.linalg.norm(cos1, axis=1, keepdims=True), eps)
    s_anchor = jnp.take_along_axis(s_norm, t_prev[None, None, :], axis=2)
    scalar = jnp.clip(jnp.sum(s_norm * s_anchor, axis=1), -1.0 + eps, 1.0 - eps)
    return y, scalar


class PhaseHeads(nn.Module):
    num_segs: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        return add_hypersphere_phase_heads(x, self.num_segs, self.eps, return_scalar=True)


class Mixer(nn.Module):
    """FFT-over-channels phase heads + causal depthwise conv over time."""

    num_segs: int
    dw_kernel: int = 3
    eps: float = 1e-16

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        y = jnp.fft.fft(x.astype(jnp.float32), axis=2)
        s = add_hypersphere_phase_heads(y, self.num_segs, self.eps)
        z = jnp.fft.ifft(s, axis=2).real  # (B,T,C)

        k = self.dw_kernel
        w = self.param("dw", nn.initializers.lecun_normal(), (k, c))
        zp = jnp.pad(z, ((0, 0), (k - 1, 0), (0, 0)))  # causal pad
        out = sum(zp[:, i : i + t, :] * w[i] for i in range(k))
        return out.astype(x.dtype)
