"""Ensemble MEITD (noise-assisted, multi-realization) — BASELINE config 4.

Pins: the bank rides ``meitd_jit_bank`` unchanged (per-realization outputs
equal per-signal ``meitd_jit``), WPE sorting matches the XITD convention,
paired noise makes the realization mean reconstruct the INPUT exactly,
and the fingerprint-median selection machinery agrees with an
independent sequential replication.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyitd_tpu import meitd_ensemble, meitd_jit
from pyitd_tpu.decomp.ensemble import _sorted_stack
from pyitd_tpu.decomp.ensemble import _MAX_VALID
from pyitd_tpu.ops.wpe import weighted_permutation_entropy
from pyitd_tpu.utils.stats import fingerprint, sorted_median_index


def _signal(n=600, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 2 * np.pi, n)
    return (np.sin(20 * t * (1 + 0.2 * t)) + np.sin(13 * t)
            + 0.2 * rng.normal(size=n) + 0.1 * t**2)


def test_bank_matches_per_signal():
    x = jnp.asarray(_signal(), jnp.float64)
    key = jax.random.PRNGKey(7)
    res = meitd_ensemble(x, key, n_realizations=4, noise_scale=0.05)

    # reconstruct the realizations the ensemble built and walk each
    # through the single-signal jit MEITD
    v = 0.05 * jax.random.normal(key, (2, x.shape[-1]), x.dtype)
    bank = jnp.concatenate([x[None] + v, x[None] - v], axis=0)
    for r in range(4):
        one = meitd_jit(bank[r])
        stack = _sorted_stack(one.high, one.low, one.residual,
                              one.high_count, one.low_count)
        np.testing.assert_allclose(np.asarray(res.stacks[r]),
                                   np.asarray(stack), rtol=0, atol=1e-12)
        # every realization reconstructs itself: valid rows sum to the
        # realization (subtractive construction)
        rec = np.asarray(jnp.sum(stack, axis=0))
        np.testing.assert_allclose(rec, np.asarray(bank[r]), atol=1e-10)


def test_paired_noise_mean_reconstructs_input():
    x = jnp.asarray(_signal(seed=3), jnp.float64)
    res = meitd_ensemble(x, jax.random.PRNGKey(0), n_realizations=6,
                         noise_scale=0.1)
    rec = np.asarray(jnp.sum(res.mean_stack, axis=0))
    np.testing.assert_allclose(rec, np.asarray(x), atol=1e-10)


def test_wpe_sort_ascending_and_invalid_rows_zero():
    x = jnp.asarray(_signal(seed=5), jnp.float64)
    res = meitd_ensemble(x, jax.random.PRNGKey(1), n_realizations=2,
                         noise_scale=0.05)
    stack = np.asarray(res.stacks[0])
    nvalid = int(res.num_components[0])
    ent = [float(weighted_permutation_entropy(jnp.asarray(stack[i]), 3,
                                              normalize=True))
           for i in range(nvalid)]
    assert all(ent[i] <= ent[i + 1] + 1e-12 for i in range(len(ent) - 1))
    assert np.all(stack[nvalid:] == 0.0)
    assert stack.shape[0] == 2 * _MAX_VALID + 1


def test_median_selection_matches_sequential_replication():
    x = jnp.asarray(_signal(seed=9), jnp.float64)
    key = jax.random.PRNGKey(4)
    res = meitd_ensemble(x, key, n_realizations=6, noise_scale=0.08)

    v = 0.08 * jax.random.normal(key, (3, x.shape[-1]), x.dtype)
    bank = jnp.concatenate([x[None] + v, x[None] - v], axis=0)
    prints = []
    for r in range(6):
        one = meitd_jit(bank[r])
        prints.append(float(fingerprint(bank[r] - one.residual)))
    idx, comp = sorted_median_index(jnp.asarray(prints))
    assert int(res.selected_index) == int(idx)
    np.testing.assert_allclose(float(res.completeness), float(comp),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(res.selected),
                               np.asarray(res.stacks[int(idx)]))


def test_odd_realizations_rejected():
    with pytest.raises(ValueError, match="even"):
        meitd_ensemble(jnp.zeros(64), jax.random.PRNGKey(0),
                       n_realizations=3)
