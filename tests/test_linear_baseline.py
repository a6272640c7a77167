import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyitd_tpu.ops.linear_baseline import linear_baseline_extract
from reference.itd_ref import baseline_extract


def _signals():
    rng = np.random.default_rng(7)
    T = np.linspace(0, 2 * np.pi, 400)
    yield np.sin(20 * T * (1 + 0.2 * T)) + T**2 + np.sin(13 * T)
    yield rng.normal(size=513)
    yield np.sin(np.linspace(0, 50, 1000)) * np.linspace(1, 3, 1000)


def test_parity_with_numpy_oracle():
    for s in _signals():
        rot, base, nex, _ = linear_baseline_extract(jnp.asarray(s))
        r_rot, r_base, r_nex = baseline_extract(s)
        np.testing.assert_allclose(np.asarray(base), r_base, atol=1e-12, rtol=0)
        np.testing.assert_allclose(np.asarray(rot), r_rot, atol=1e-12, rtol=0)
        assert int(nex) == r_nex


def test_exact_reconstruction():
    # rotation := x - baseline, so rot + base == x to f64 roundoff
    for s in _signals():
        rot, base, _, _ = linear_baseline_extract(jnp.asarray(s))
        np.testing.assert_allclose(
            np.asarray(rot) + np.asarray(base), np.asarray(s), atol=1e-12, rtol=0
        )


def test_reference_endpoint_quirk():
    s = np.sin(np.linspace(0, 30, 256))
    _, base, _, _ = linear_baseline_extract(jnp.asarray(s))
    assert float(base[-1]) == 0.0
    _, base_nat, _, _ = linear_baseline_extract(jnp.asarray(s), endpoint_mode="natural")
    assert float(base_nat[-1]) != 0.0


def test_vmap_and_jit():
    sigs = np.stack([np.sin(np.linspace(0, k, 256)) for k in (11, 23, 37, 53)])
    fn = jax.jit(lambda a: linear_baseline_extract(a))
    rot, base, nex, _ = fn(jnp.asarray(sigs))
    for i, s in enumerate(sigs):
        r_rot, r_base, r_nex = baseline_extract(s)
        np.testing.assert_allclose(np.asarray(base[i]), r_base, atol=1e-12, rtol=0)
        assert int(nex[i]) == r_nex


@pytest.mark.slow
def test_scan_backend_matches_gather_backend():
    rng = np.random.default_rng(11)
    for s in [
        np.sin(np.linspace(0, 40, 777)) + 0.2 * rng.normal(size=777),
        rng.normal(size=(3, 256)),
    ]:
        g = linear_baseline_extract(jnp.asarray(s), backend="gather")
        c = linear_baseline_extract(jnp.asarray(s), backend="scan")
        np.testing.assert_array_equal(np.asarray(g.baseline), np.asarray(c.baseline))
        np.testing.assert_array_equal(np.asarray(g.rotation), np.asarray(c.rotation))


@pytest.mark.slow
def test_blocked_scan_backend_large_n():
    # n > 4096 exercises the two-level blocked fill path
    rng = np.random.default_rng(12)
    s = np.sin(np.linspace(0, 400, 8192)) + 0.3 * rng.normal(size=8192)
    g = linear_baseline_extract(jnp.asarray(s), backend="gather")
    c = linear_baseline_extract(jnp.asarray(s), backend="scan")
    np.testing.assert_array_equal(np.asarray(g.baseline), np.asarray(c.baseline))
    # non-multiple-of-block length + batch
    s2 = rng.normal(size=(2, 5000))
    g2 = linear_baseline_extract(jnp.asarray(s2), backend="gather")
    c2 = linear_baseline_extract(jnp.asarray(s2), backend="scan")
    np.testing.assert_array_equal(np.asarray(g2.baseline), np.asarray(c2.baseline))
