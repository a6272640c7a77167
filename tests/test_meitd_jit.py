import numpy as np
import pytest
import jax.numpy as jnp

from pyitd_tpu.decomp.meitd import meitd
from pyitd_tpu.decomp.meitd_jit import meitd_jit


def _sig(n=400, seed=3):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n)
    return (
        np.sin(2 * np.pi * 30 * t)
        + 0.5 * np.sin(2 * np.pi * 7 * t)
        + 0.1 * rng.normal(size=n)
    )


@pytest.mark.slow
def test_meitd_jit_matches_host():
    s = _sig()
    hi_h, lo_h, resid_h = meitd(s)
    res = meitd_jit(jnp.asarray(s))
    assert int(res.high_count) == hi_h.shape[0]
    assert int(res.low_count) == lo_h.shape[0]
    np.testing.assert_allclose(
        np.asarray(res.high[: int(res.high_count)]), np.asarray(hi_h), atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(res.low[: int(res.low_count)]), np.asarray(lo_h), atol=1e-9
    )
    np.testing.assert_allclose(np.asarray(res.residual), np.asarray(resid_h), atol=1e-9)


def test_meitd_jit_reconstructs():
    s = _sig(seed=5)
    res = meitd_jit(jnp.asarray(s))
    total = np.asarray(res.residual).copy()
    total += np.asarray(res.high).sum(0) + np.asarray(res.low).sum(0)
    np.testing.assert_allclose(total, s, atol=1e-9)


def test_meitd_jit_bank_matches_single():
    """The vmapped bank API matches per-signal calls to f64 roundoff."""
    from pyitd_tpu import meitd_jit_bank

    rng = np.random.default_rng(3)
    t = np.linspace(0, 1, 1024)
    bank = np.stack([
        np.sin(2 * np.pi * (20 + 5 * k) * t) + 0.1 * rng.normal(size=t.size)
        for k in range(2)
    ])
    res = meitd_jit_bank(jnp.asarray(bank), 0.6)
    for b in range(2):
        one = meitd_jit(jnp.asarray(bank[b]), 0.6)
        np.testing.assert_allclose(np.asarray(res.high[b]), np.asarray(one.high),
                                   rtol=0, atol=1e-11)
        np.testing.assert_allclose(np.asarray(res.residual[b]),
                                   np.asarray(one.residual), rtol=0, atol=1e-11)
        recon = (np.asarray(res.high[b]).sum(0) + np.asarray(res.low[b]).sum(0)
                 + np.asarray(res.residual[b]))
        assert np.abs(recon - bank[b]).max() < 1e-10
