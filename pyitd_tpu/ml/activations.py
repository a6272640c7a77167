"""Activations (``/root/reference/RainstarActivation.py``)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["rainstar"]


def rainstar(x: jax.Array) -> jax.Array:
    """Blended sigmoid-gated activation (RainstarActivation.py:11-17):
    ``neg = (x·σ(x))² + x/(1+|x|)``, ``pos = x − x/(1+|x|)``,
    ``out = neg·σ(−x) + pos·σ(x)``."""
    sig = jax.nn.sigmoid(x)
    soft = x / (1.0 + jnp.abs(x))
    neg = (x * sig) ** 2 + soft
    pos = x - soft
    return neg * jax.nn.sigmoid(-x) + pos * sig
