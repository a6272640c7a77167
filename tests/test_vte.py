import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyitd_tpu.ml.vte import (
    pairwise_rot_spiral,
    spiral_mix,
    phase_tap,
    phase_transport,
    orthonorm_columns,
    subspace_iteration,
    sign_align,
    energy_normalize,
    soft_shrink,
    LowRankShift,
    frft_time,
)


def test_spiral_pulls_to_shell():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 6)) * 0.1)
    y = x
    for _ in range(200):
        y = pairwise_rot_spiral(y, radius=2.0, step=0.1)
    r = np.linalg.norm(np.asarray(y), axis=-1)
    assert np.all(np.abs(r - 2.0) < 0.2), r


def test_spiral_mix_shapes():
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 10, 4)))
    y = spiral_mix(x, loop_iters=2)
    assert y.shape == x.shape


def test_phase_tap_norm_preserving():
    # Householder reflections preserve the norm of the difference vector
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 32, 8)))
    d = 3
    y = np.asarray(phase_tap(x, d))
    w = np.asarray(x)[:, d:] - np.asarray(x)[:, :-d]
    np.testing.assert_allclose(
        np.linalg.norm(y[:, d:], axis=-1), np.linalg.norm(w, axis=-1), atol=1e-8
    )
    # early rows: a / (d - t)
    np.testing.assert_allclose(y[:, 0, 0], 1.0 / d, atol=1e-12)
    assert np.allclose(y[:, 0, 1:], 0.0)


def test_phase_transport_norm_preserving():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 40, 8)))
    d = 2
    y = np.asarray(phase_transport(x, d))
    w = np.asarray(x)[:, d:] - np.asarray(x)[:, :-d]
    np.testing.assert_allclose(
        np.linalg.norm(y[:, d:], axis=-1), np.linalg.norm(w, axis=-1), atol=1e-6
    )


def test_subspace_iteration_recovers_top_eigvecs():
    rng = np.random.default_rng(4)
    d, r = 16, 3
    q, _ = np.linalg.qr(rng.normal(size=(d, d)))
    evals = np.sort(rng.uniform(0.1, 1.0, d))
    evals[-r:] = [5.0, 7.0, 10.0]
    cmat = (q * evals) @ q.T
    v = np.asarray(subspace_iteration(jnp.asarray(cmat[None]), r, k=6))[0]
    # span(v) should match span of top-r eigvecs
    top = q[:, np.argsort(evals)[-r:]]
    proj = top @ top.T
    err = np.linalg.norm(proj @ v - v)
    assert err < 1e-3, err
    # orthonormal columns
    np.testing.assert_allclose(v.T @ v, np.eye(r), atol=1e-8)


def test_sign_align_energy_softshrink():
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(size=(2, 8, 3)))
    a = jnp.asarray(rng.normal(size=(2, 8)))
    va = sign_align(v, a)
    dots = np.sum(np.asarray(va) * np.asarray(a)[..., None], axis=1)
    assert np.all(dots >= -1e-9)

    tr = jnp.asarray(rng.normal(size=(2, 30, 3)))
    tn, sc = energy_normalize(tr)
    np.testing.assert_allclose(
        np.sum(np.asarray(tn) ** 2, axis=1), 1.0, atol=1e-6
    )
    assert np.all(np.asarray(soft_shrink(jnp.asarray([0.0, 0.01]), 0.5)) <= 0.011)


def test_lowrank_shift():
    x = jnp.zeros((2, 5, 12))
    m = LowRankShift(shift_rank=3)
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == x.shape


def test_frft_identity_and_reversal():
    rng = np.random.default_rng(6)
    z = jnp.asarray(rng.normal(size=(1, 64, 2)))
    ident = np.asarray(frft_time(z, 0.0))
    np.testing.assert_allclose(ident.real, np.asarray(z), atol=1e-9)
    rev = np.asarray(frft_time(z, np.pi))
    np.testing.assert_allclose(np.abs(rev), np.abs(np.asarray(z)[:, ::-1]), atol=1e-6)
    mid = np.asarray(frft_time(z, np.pi / 2))
    assert np.all(np.isfinite(mid.real)) and np.all(np.isfinite(mid.imag))


@pytest.mark.slow
def test_manifold_stage_and_blockfast_gpt():
    import optax
    from pyitd_tpu.ml.vte import ManifoldStage, AutoencoderBlock, BlockFastGPT

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)), jnp.float32)
    stage = ManifoldStage(rank=4, k_iters=2, shift_rank=4, shrink_lambda=0.01)
    params = stage.init(jax.random.PRNGKey(0), x)
    y = stage.apply(params, x)
    assert y.shape == x.shape and np.all(np.isfinite(np.asarray(y)))

    blk = AutoencoderBlock(rank=4)
    bp = blk.init(jax.random.PRNGKey(1), x)
    yb = blk.apply(bp, x)
    assert yb.shape == x.shape and np.all(np.isfinite(np.asarray(yb)))

    model = BlockFastGPT(vocab_size=16, n_embd=16, n_layer=1, rank=4)
    idx = jnp.asarray(rng.integers(0, 16, size=(2, 12)))
    mp = model.init(jax.random.PRNGKey(2), idx, idx)
    logits, loss = model.apply(mp, idx, idx)
    assert logits.shape == (2, 12, 16)
    assert np.isfinite(float(loss))

    # a couple of training steps reduce the loss
    opt = optax.adam(3e-3)
    st = opt.init(mp)
    lf = lambda p: model.apply(p, idx, idx)[1]
    l0 = float(lf(mp))
    vg = jax.jit(jax.value_and_grad(lf))
    for _ in range(25):
        _, g = vg(mp)
        up, st = opt.update(g, st, mp)
        mp = optax.apply_updates(mp, up)
    assert float(lf(mp)) < l0, (l0, float(lf(mp)))


def test_ar1_filter_matches_sequential():
    from pyitd_tpu.ml.vte import ar1_filter

    rng = np.random.default_rng(8)
    x = rng.normal(size=(1, 20, 2))
    rho = 0.7
    want = np.zeros_like(x)
    want[:, 0] = x[:, 0]
    for t in range(1, 20):
        want[:, t] = rho * want[:, t - 1] + x[:, t]
    got = np.asarray(ar1_filter(jnp.asarray(x), rho))
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_dynmix_cooperative_contraction():
    from pyitd_tpu.ml.vte import dynmix

    rng = np.random.default_rng(9)
    comps = [jnp.asarray(rng.normal(size=(2, 8, 4))) for _ in range(3)]
    out = dynmix(comps, loop_iters=2)
    assert len(out) == 3 and out[0].shape == comps[0].shape
    # mixing pulls components toward each other (pairwise spread shrinks)
    before = float(sum(jnp.linalg.norm(comps[i] - comps[j])
                       for i in range(3) for j in range(i + 1, 3)))
    after = float(sum(jnp.linalg.norm(out[i] - out[j])
                      for i in range(3) for j in range(i + 1, 3)))
    assert after < before
    # stacked-array API agrees
    st = np.asarray(dynmix(jnp.stack(comps, 0), loop_iters=2))
    np.testing.assert_allclose(st[0], np.asarray(out[0]), atol=1e-12)


def test_frft_negative_alpha_sign_preserved():
    """cot(alpha) must keep its sign for alpha < 0 — the reference's
    max(eps, sin(a)) floor turned inverse transforms (komega's
    frft_time(..., -alpha)) into exp(i*pi*1e7*t^2) float chaos.  Documented
    deviation: we guard with copysign.  The inverse output must stay O(1)
    and conjugate-symmetric with the forward: frft(x, -a) == conj(frft(conj(x), a))."""
    from pyitd_tpu.ml.vte import frft_time

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 64, 2)))
    for a in (0.7, 1.3, 2.5):
        inv = frft_time(x, -a)
        assert float(jnp.abs(inv).max()) < 50.0  # was ~3300 pre-fix
        alt = jnp.conj(frft_time(jnp.conj(x.astype(jnp.complex128)), a))
        np.testing.assert_allclose(np.asarray(inv), np.asarray(alt),
                                   atol=1e-8)
