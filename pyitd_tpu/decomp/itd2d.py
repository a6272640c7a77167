"""2-D ensemble ITD (texture/structure separation).

Behavioral contract (siftED2D.ipynb cell 1):

* the 1-D kernel is the cubic-tier baseline extract with the <10-extrema
  pass-through guard;
* ``crossways``: row-pass and column-pass baselines, then each re-applied
  along the *other* axis, averaged;
* ``statistical_component``: a noise-assisted ensemble — ``iterations``
  paired realizations ``img ± v`` with ``v ~ N(0, MAD(img))``, each run
  through crossways, pairs averaged, then the ensemble averaged;
* ``totalextract2d`` returns ``[highpass, lowpass]`` with
  ``highpass = img - lowpass`` (exact reconstruction by construction).

TPU design: rows/columns via ``vmap`` + transpose (the reference's numba
``prange`` loops); the ensemble is one more ``vmap`` axis — all 20
realizations decompose in parallel.  Randomness comes from an explicit JAX
PRNG key (the reference draws from numpy's global RNG).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.cubic_baseline import cubic_baseline_extract

__all__ = ["mad", "crossways_baseline", "statistical_component", "totalextract2d"]


def mad(a: jax.Array) -> jax.Array:
    """Median absolute deviation (siftED2D `mad`)."""
    med = jnp.median(a)
    return jnp.median(jnp.abs(a - med))


def _row_baseline(img: jax.Array, capacity: int) -> jax.Array:
    fn = lambda row: cubic_baseline_extract(row, capacity, min_extrema=10).baseline
    return jax.vmap(fn)(img)


@partial(jax.jit, static_argnames=())
def crossways_baseline(img: jax.Array) -> jax.Array:
    """Row-pass + column-pass baselines, cross-applied, averaged."""
    h, w = img.shape
    # worst case (zigzag rows) has an extremum at nearly every sample
    cap_w = w + 2
    cap_h = h + 2
    lengthwise = _row_baseline(img, cap_w)                    # rows
    crosswise = _row_baseline(img.T, cap_h).T                 # cols
    crosswise = _row_baseline(crosswise, cap_w)               # rows again
    lengthwise = _row_baseline(lengthwise.T, cap_h).T         # cols again
    return 0.5 * (lengthwise + crosswise)


@partial(jax.jit, static_argnames=("iterations",))
def statistical_component(img: jax.Array, key: jax.Array, iterations: int = 20) -> jax.Array:
    """Noise-assisted ensemble lowpass component (must be even iterations)."""
    if iterations % 2 != 0:
        raise ValueError("iterations must be even")
    m = mad(img)
    half = iterations // 2
    v = jax.random.normal(key, (half,) + img.shape, dtype=img.dtype) * m
    plus = img[None] + v
    minus = img[None] - v
    stacked = jnp.concatenate([plus, minus], axis=0)
    out = jax.vmap(crossways_baseline)(stacked)
    paired = 0.5 * (out[:half] + out[half:])
    return jnp.mean(paired, axis=0)


def totalextract2d(img, key=None, iterations: int = 20):
    """[highpass, lowpass] separation (siftED2D `totalextract2d`)."""
    # f64 where available (CPU / x64 mode — the reference's precision);
    # TPUs run the f32 fast path without the truncation warning
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    img = jnp.asarray(img, dtype)
    if key is None:
        key = jax.random.PRNGKey(0)
    lowpass = statistical_component(img, key, iterations)
    highpass = img - lowpass
    return jnp.stack([highpass, lowpass])
