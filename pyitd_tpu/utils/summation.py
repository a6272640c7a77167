"""Compensated summation — the reconstruction oracle.

The reference validates every decomposition with Shewchuk/fsum summation
(``/root/reference/ITD.py:475-481,505-508``; ``helperfunctions.py:2-9``).
``math.fsum`` is host-only and sequential; on TPU we use a Kahan-Neumaier
scan, which keeps the error of summing K components per sample at one ulp —
more than enough headroom for the <=1e-10 reconstruction bar.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["neumaier_sum", "neumaier_sum_parts", "reconstruction_error"]


def neumaier_sum_parts(components: jax.Array, axis: int = 0):
    """Compensated sum along ``axis``; returns ``(s, c)`` with the true sum
    ≈ ``s + c`` and every per-step rounding residual captured in ``c``.

    Exposing the parts lets callers combine ``c`` with other tiny terms
    (e.g. ``SiftResult.correction``) before the one final rounding."""
    comps = jnp.moveaxis(components, axis, 0)

    def step(carry, v):
        s, c = carry
        t = s + v
        big = jnp.abs(s) >= jnp.abs(v)
        c = c + jnp.where(big, (s - t) + v, (v - t) + s)
        return (t, c), None

    (s, c), _ = lax.scan(step, (jnp.zeros_like(comps[0]), jnp.zeros_like(comps[0])), comps)
    return s, c


def neumaier_sum(components: jax.Array, axis: int = 0) -> jax.Array:
    """Compensated sum along ``axis`` (Neumaier variant of Kahan)."""
    s, c = neumaier_sum_parts(components, axis=axis)
    return s + c


def reconstruction_error(components: jax.Array, signal: jax.Array, axis: int = 0) -> jax.Array:
    """Max-abs error of ``sum(components) - signal`` with compensated sums."""
    total = neumaier_sum(components, axis=axis)
    return jnp.max(jnp.abs(total - signal))
