"""Property-style reconstruction sweep: the universal oracle (SURVEY §4.1)
across random signals for every exactly-invertible decomposer."""
import numpy as np
import jax
import jax.numpy as jnp

from pyitd_tpu import (
    itd_sift,
    neumaier_sum,
    meitd,
    totalextract2d,
)
from pyitd_tpu.decomp.itd_fourier import itd_sine_sift


def _random_signals(k=6, n=700):
    rng = np.random.default_rng(42)
    t = np.linspace(0, 1, n)
    for i in range(k):
        kind = i % 3
        if kind == 0:
            yield rng.normal(size=n)
        elif kind == 1:
            f1, f2 = rng.uniform(3, 40, 2)
            yield np.sin(2 * np.pi * f1 * t) + 0.5 * np.cos(2 * np.pi * f2 * t) + t**2
        else:
            yield np.cumsum(rng.normal(size=n)) * 0.1  # random walk


def test_sift_reconstruction_sweep():
    for s in _random_signals():
        res = itd_sift(jnp.asarray(s), 9)
        nc = int(res.num_components)
        err = float(jnp.max(jnp.abs(neumaier_sum(res.rotations[:nc], 0) - jnp.asarray(s))))
        assert err < 1e-10, err


def test_sine_sift_reconstruction_sweep():
    for s in _random_signals(k=3):
        rot, resid = itd_sine_sift(jnp.asarray(s), 700)
        err = float(jnp.max(jnp.abs(rot.sum(0) + resid - jnp.asarray(s))))
        assert err < 1e-8, err


def test_meitd_reconstruction_sweep():
    for s in _random_signals(k=3, n=300):
        hi, lo, resid = meitd(s)
        total = np.asarray(resid) + np.asarray(hi).sum(0) + np.asarray(lo).sum(0)
        np.testing.assert_allclose(total, s, atol=1e-9)


def test_2d_reconstruction_sweep():
    rng = np.random.default_rng(7)
    for _ in range(2):
        img = rng.normal(size=(24, 24)) + np.linspace(0, 4, 24)[None, :]
        out = totalextract2d(jnp.asarray(img), jax.random.PRNGKey(1), iterations=2)
        np.testing.assert_allclose(np.asarray(out).sum(0), img, atol=1e-9)
