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
    # cubic_baseline_extract treats every leading axis as batch, so rows
    # (and any ensemble axes before them) go through ONE batched call —
    # never wrap this in vmap: vmapped instances would reach the Pallas
    # backends one row at a time, where per-call packing/grid overhead
    # dominates (measured ~25x slower for the 2-D ensemble)
    return cubic_baseline_extract(img, capacity, min_extrema=10).baseline


@partial(jax.jit, static_argnames=())
def crossways_baseline(img: jax.Array) -> jax.Array:
    """Row-pass + column-pass baselines, cross-applied, averaged.

    Batch-aware: ``img`` is (..., h, w); leading axes (e.g. ensemble
    realizations) ride through as batch."""
    h, w = img.shape[-2:]
    # worst case (zigzag rows) has an extremum at nearly every sample
    cap_w = w + 2
    cap_h = h + 2

    def T(a):
        return jnp.swapaxes(a, -1, -2)

    lengthwise = _row_baseline(img, cap_w)                    # rows
    crosswise = T(_row_baseline(T(img), cap_h))               # cols
    crosswise = _row_baseline(crosswise, cap_w)               # rows again
    lengthwise = T(_row_baseline(T(lengthwise), cap_h))       # cols again
    return 0.5 * (lengthwise + crosswise)


@partial(jax.jit, static_argnames=("iterations",))
def statistical_component(img: jax.Array, key: jax.Array,
                          iterations: int = 20, *,
                          noise: jax.Array | None = None) -> jax.Array:
    """Noise-assisted ensemble lowpass component (must be even iterations).

    ``noise`` (optional, ``(iterations//2, h, w)``) overrides the random
    draw with caller-provided realizations — the deterministic injection
    point that makes exact cross-implementation parity possible (the
    reference draws from numpy's global RNG inside numba, siftED2D cell 1
    ``retrieve_statistical_image_component``)."""
    if iterations % 2 != 0:
        raise ValueError("iterations must be even")
    half = iterations // 2
    if noise is None:
        m = mad(img)
        v = jax.random.normal(key, (half,) + img.shape, dtype=img.dtype) * m
    else:
        v = jnp.asarray(noise, img.dtype)
        if v.shape != (half,) + img.shape:
            raise ValueError(f"noise must be {(half,) + img.shape}")
    plus = img[None] + v
    minus = img[None] - v
    stacked = jnp.concatenate([plus, minus], axis=0)
    out = crossways_baseline(stacked)  # batched, not vmapped (see above)
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
