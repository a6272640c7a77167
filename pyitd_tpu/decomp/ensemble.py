"""Noise-assisted ensemble MEITD — one jitted program.

The reference's MEITD cites its ensemble-ITD lineage
(``/root/reference/MEITD.py:38-47``: Hu 2015 ensemble ITD, Wang & Ling
2019 EITD-MP) and ships the two ensemble mechanisms separately:

* **paired-noise realizations** — the 2-D ensemble driver decomposes
  ``img + v`` and ``img - v`` for ``v ~ N(0, MAD(img))`` and averages
  (siftED2D.ipynb cell 1);
* **median selection** — ``helperfunctions.py:18-37``: fingerprint every
  realization's outcome, pick the realization nearest the mean of the
  sorted fingerprints, believe it when the sorted distribution's
  logit-fit "completeness" exceeds 0.95.

This module composes both around the fully-jitted MEITD walk
(:func:`..meitd_jit.meitd_jit_bank`): R paired realizations ride ONE
vmapped HILO state machine in lockstep (the modpool-style batch axis —
``/root/reference/modpool.c`` — is exactly the ensemble axis here), each
realization's components are WPE-sorted (the XITD convention,
``MEITD.py:545-548``), and the result carries both ensemble reductions:
the across-realization mean of the sorted stacks and the
fingerprint-median realization.

With paired noise and an even ``n_realizations`` the realization mean
equals the input exactly, so the mean stack reconstructs the INPUT (not
a noisy copy) to float roundoff — pinned in tests.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.wpe import weighted_permutation_entropy
from ..utils.stats import fingerprint, sorted_median_index
from .meitd_jit import meitd_jit_bank

__all__ = ["meitd_ensemble", "EnsembleResult"]

# The walk accepts at most one component per trip and stops once
# highc + lowc exceeds 20 (the reference cap, MEITD.py:424-433), so at
# most 21 high + 21 low rows can ever be valid — the 44-row buffers are
# the reference's allocation, not its reachable count.  Sorting only the
# reachable rows halves the ensemble epilogue's WPE work.
_MAX_VALID = 22


class EnsembleResult(NamedTuple):
    """``stacks``: (R, 2*_MAX_VALID+1, n) WPE-sorted component stacks, one
    per realization (invalid rows hold zeros and sort last);
    ``mean_stack``: their across-realization mean; ``selected``: the
    stack of the fingerprint-median realization; ``selected_index`` /
    ``completeness``: the ``getsortedindex`` machinery's pick and its
    believability score (> 0.95 per the reference); ``num_components``:
    per-realization valid-row counts (high + low + residual)."""

    stacks: jax.Array
    mean_stack: jax.Array
    selected: jax.Array
    selected_index: jax.Array
    completeness: jax.Array
    num_components: jax.Array


def _sorted_stack(high, low, residual, highc, lowc):
    """One realization's XITD-style stack: valid high rows, valid low
    rows, residual, WPE-sorted ascending; invalid rows sort last
    (+inf sentinel) and hold zeros."""
    rows = jnp.concatenate(
        [high[:_MAX_VALID], low[:_MAX_VALID], residual[None]], axis=0)
    k = jnp.arange(rows.shape[0])
    valid = (k < highc) | (
        (k >= _MAX_VALID) & (k < _MAX_VALID + lowc)
    ) | (k == 2 * _MAX_VALID)
    ent = jax.vmap(
        lambda r: weighted_permutation_entropy(r, 3, normalize=True)
    )(rows)
    ent = jnp.where(valid, ent, jnp.inf)
    order = jnp.argsort(ent)
    return jnp.where(valid[order][:, None], rows[order], 0.0)


@partial(jax.jit, static_argnames=("n_realizations", "capacity"))
def meitd_ensemble(
    data,
    key,
    n_realizations: int = 32,
    noise_scale: float | jax.Array | None = None,
    wpemax: float = 0.6,
    *,
    capacity: int | None = None,
) -> EnsembleResult:
    """Noise-assisted ensemble MEITD of a single signal.

    ``n_realizations`` must be even: realizations come in ``(x + v,
    x - v)`` pairs (siftED2D's paired-noise construction).
    ``noise_scale`` defaults to the reference's MAD of the signal
    (``scipy.stats.median_abs_deviation`` semantics, siftED2D cell 1).
    """
    if n_realizations % 2:
        raise ValueError("n_realizations must be even (paired +-noise)")
    x = jnp.asarray(data, jnp.float64)
    n = x.shape[-1]
    if noise_scale is None:
        noise_scale = jnp.median(jnp.abs(x - jnp.median(x)))
    v = noise_scale * jax.random.normal(
        key, (n_realizations // 2, n), x.dtype
    )
    bank = jnp.concatenate([x[None] + v, x[None] - v], axis=0)

    res = meitd_jit_bank(bank, wpemax=wpemax, capacity=capacity)
    stacks = jax.vmap(_sorted_stack)(
        res.high, res.low, res.residual, res.high_count, res.low_count
    )

    # median selection over each realization's DENOISED reconstruction
    # (the accepted components; the residual trend — which sorts somewhere
    # inside the WPE-ordered stack — is excluded by subtracting it from
    # the realization): the object the noise perturbs and the fingerprint
    # machinery ranks
    denoised = bank - res.residual
    prints = jax.vmap(fingerprint)(denoised)
    idx, completeness = sorted_median_index(prints)

    return EnsembleResult(
        stacks=stacks,
        mean_stack=jnp.mean(stacks, axis=0),
        selected=stacks[idx],
        selected_index=idx,
        completeness=completeness,
        num_components=res.high_count + res.low_count + 1,
    )
