"""BASELINE config 2: parity on ~audio-scale signals.

The original wav fixtures are stripped from the snapshot
(.MISSING_LARGE_BLOBS); per BASELINE.md, regenerated audio-like signals
stand in.  Scaled to 50k samples to keep the numpy oracle affordable in CI.
"""
import numpy as np
import jax.numpy as jnp

from pyitd_tpu import itd_sift, neumaier_sum
from reference.itd_ref import itd_sift as ref_sift


def audio_like(n=50_000, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 22050.0
    voiced = (
        np.sin(2 * np.pi * 170 * t)
        + 0.5 * np.sin(2 * np.pi * 340 * t + 0.3)
        + 0.25 * np.sin(2 * np.pi * 510 * t + 1.1)
    )
    envelope = 0.5 * (1 + np.sin(2 * np.pi * 2.3 * t))
    noise = 0.05 * rng.normal(size=n)
    return (voiced * envelope + noise).astype(np.float64)


def test_audio_scale_parity_and_reconstruction():
    x = audio_like()
    res = itd_sift(jnp.asarray(x), 11)
    n = int(res.num_components)
    want, _ = ref_sift(x, 11)
    assert n == want.shape[0]
    np.testing.assert_allclose(np.asarray(res.rotations[:n]), want, atol=1e-10, rtol=0)
    err = float(jnp.max(jnp.abs(neumaier_sum(res.rotations[:n], 0) - jnp.asarray(x))))
    assert err < 1e-10, err
