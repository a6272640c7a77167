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
