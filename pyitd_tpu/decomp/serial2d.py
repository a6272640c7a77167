"""2-D decomposition by serialization (Serial-EFD.ipynb cells 2-3).

``sconcatenate`` flattens an image column-major into one long 1-D signal,
inserting ``num_interval`` cross-faded transition samples between adjacent
columns so any 1-D decomposer (EFD, ITD, ...) can process it;
``sdeconcatenate`` inverts the layout for per-mode images.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["sconcatenate", "sdeconcatenate"]


def sconcatenate(matrix_x, num_interval: int):
    """(length, signals) -> serialized column vector (Serial-EFD cell 2)."""
    x = jnp.asarray(matrix_x)
    num_signal = x.shape[1]

    a = x[:num_interval, 1:]           # heads of the *next* columns
    b = x[-num_interval:, :-1]         # tails of the current columns

    ramp = jnp.linspace(0, 1, num_interval + 2)[1:-1][:, None]
    t_a = jnp.flipud(a) * ramp
    t_b = jnp.flipud(b) * jnp.flipud(ramp)
    trans = t_a + t_b

    trans = jnp.concatenate([trans, jnp.zeros((num_interval, 1), x.dtype)], axis=1)
    r = jnp.concatenate([x, trans], axis=0)
    r = r.flatten(order="F")[: -num_interval]
    return r.reshape(-1, 1)


def sdeconcatenate(matrix_r, num_interval: int, num_signal: int):
    """serialized (samples, modes) -> (length, modes, signals)
    (Serial-EFD cell 3)."""
    r = jnp.asarray(matrix_r)
    num_mode = r.shape[1]
    z = jnp.zeros((num_interval, num_mode), r.dtype)
    r = jnp.concatenate([r, z], axis=0)
    imf = r.reshape((-1, num_signal, num_mode), order="F")
    imf = imf[:-num_interval, :, :]
    return imf.transpose((0, 2, 1))
