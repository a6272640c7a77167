"""NewGPT exploration pieces (NewGPT.ipynb).

* :class:`WedgeTransform` — the symplectic twist: flow along a learned
  antisymmetric generator, ``x + x(A - Aᵀ)``;
* :func:`convex_softmax` — the numerically explicit LSE softmax
  (max-shifted exp / logsumexp), float32-precision-minded;
* :class:`AlpertQueryGenerator` — queries from a Legendre/Alpert multiwavelet
  basis over per-head channel intervals, with a learned spectral scale.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["WedgeTransform", "convex_softmax", "AlpertQueryGenerator", "ExplorerEngineerStage"]


class WedgeTransform(nn.Module):
    """x: (B, H, T, D) -> x + x @ (A - A^T) per head."""

    heads: int

    @nn.compact
    def __call__(self, x):
        hd = x.shape[-1]
        a = self.param("A", nn.initializers.zeros, (self.heads, hd, hd))
        s = a - jnp.swapaxes(a, -1, -2)
        return x + jnp.einsum("bhtd,hde->bhte", x, s)


def convex_softmax(scores: jax.Array, axis: int = -1) -> jax.Array:
    m = jnp.max(scores, axis=axis, keepdims=True)
    y = scores - m
    lse = m + jnp.log(jnp.sum(jnp.exp(y), axis=axis, keepdims=True))
    return jnp.exp(scores - lse)


def _legendre_basis(interval_size: int, num_modes: int) -> np.ndarray:
    """Normalized Legendre polynomials sampled on [-1, 1]."""
    x = np.linspace(-1, 1, interval_size)
    modes = []
    for k in range(num_modes):
        coeffs = np.zeros(k + 1)
        coeffs[k] = 1.0
        poly = np.polynomial.legendre.legval(x, coeffs)
        modes.append(poly * math.sqrt((2 * k + 1) / 2))
    return np.stack(modes, axis=1)  # (interval_size, num_modes)


class AlpertQueryGenerator(nn.Module):
    """(B, T, C) -> per-head Alpert-basis queries (B, H, T, Dh)."""

    num_heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        assert c % self.num_heads == 0
        split = c // self.num_heads
        basis = jnp.asarray(
            np.broadcast_to(
                _legendre_basis(split, self.head_dim)[None],
                (self.num_heads, split, self.head_dim),
            ),
            x.dtype,
        )
        scale = self.param(
            "spectral_scale", nn.initializers.ones, (1, self.num_heads, 1, self.head_dim)
        )
        xr = x.reshape(b, t, self.num_heads, split)
        q = jnp.einsum("bths,hsd->bthd", xr, basis)
        return jnp.transpose(q, (0, 2, 1, 3)) * scale


class ExplorerEngineerStage(nn.Module):
    """AGI_(1).ipynb: a pre-LN causal-attention "engineer" block applied as
    a residual mapping update, with DynMix available for multi-stream
    cooperation (see ``ml.vte.dynmix``)."""

    num_heads: int = 4

    @nn.compact
    def __call__(self, x, mask=None):
        b, t, d = x.shape
        h = nn.LayerNorm()(x)
        causal = jnp.tril(jnp.ones((t, t), bool))
        if mask is not None:
            causal = causal & mask
        attn = nn.SelfAttention(num_heads=self.num_heads, name="engineer_attn")(
            h, mask=causal[None, None]
        )
        h2 = x + attn
        mlp = nn.Dense(4 * d)(nn.LayerNorm()(h2))
        h2 = h2 + nn.Dense(d)(nn.gelu(mlp))
        return x + h2  # the stage returns x + mapping (AGI semantics)
