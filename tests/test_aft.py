import numpy as np
import jax.numpy as jnp

from pyitd_tpu.decomp.aft import accumulator_dft, unique_twiddle_count


def test_unique_twiddles_512():
    assert unique_twiddle_count(512) == 257  # the notebook's count


def test_accumulator_dft_matches_fft():
    rng = np.random.default_rng(0)
    x = rng.normal(size=128)
    got = np.asarray(accumulator_dft(jnp.asarray(x)))
    want = np.fft.fft(x)
    np.testing.assert_allclose(got, want, atol=1e-9)
