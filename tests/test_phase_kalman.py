import numpy as np
import jax
import jax.numpy as jnp

from pyitd_tpu.ml.phase import add_hypersphere_phase_heads, PhaseHeads, Mixer
from pyitd_tpu.ml.kalman import KalmanSweepMHGains


def test_phase_heads_real_and_complex():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 12)))
    y = add_hypersphere_phase_heads(x, 4)
    assert y.shape == x.shape
    # head 0 untouched
    np.testing.assert_array_equal(np.asarray(y[..., :3]), np.asarray(x[..., :3]))
    # complex path
    z = jnp.asarray(rng.normal(size=(2, 10, 12)) + 1j * rng.normal(size=(2, 10, 12)))
    yz = add_hypersphere_phase_heads(z, 4)
    assert yz.shape == z.shape and np.all(np.isfinite(np.asarray(yz).real))
    # scalar path bounded
    _, s = add_hypersphere_phase_heads(x, 4, return_scalar=True)
    assert s.shape == (2, 10)
    assert np.all(np.abs(np.asarray(s)) <= 1.0)


def test_mixer_causal():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 16, 8)), jnp.float32)
    m = Mixer(num_segs=4)
    p = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(p, x)
    # causality: output at t <= 5 unaffected by zeroing inputs at t >= 8
    x2 = x.at[:, 8:].set(0.0)
    y2 = m.apply(p, x2)
    np.testing.assert_allclose(np.asarray(y[:, :6]), np.asarray(y2[:, :6]), atol=1e-5)


def test_kalman_gains_shapes_and_sink():
    rng = np.random.default_rng(2)
    b, n, d, h = 2, 12, 16, 4
    q = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, n, d)), jnp.float32)
    m = KalmanSweepMHGains(n_head=h, n_passes=4)
    p = m.init(jax.random.PRNGKey(0), q, k, v)
    g = m.apply(p, q, k, v)
    assert g.shape == (b, n, d)
    gn = np.asarray(g)
    # K = HP/(H^2 P + R) is nonnegative and bounded by 1/H, not by 1
    assert np.all(np.isfinite(gn)) and np.all(gn >= 0)
    # single pass also works
    g1 = KalmanSweepMHGains(n_head=h, n_passes=1).apply(p, q, k, v)
    assert g1.shape == (b, n, d)
