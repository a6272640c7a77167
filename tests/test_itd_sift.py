import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pyitd_tpu import ITD, itd_sift, neumaier_sum, STOP_FLAT, STOP_BUDGET
from reference.itd_ref import itd_sift as ref_sift


def demo_chirp(n=400):
    T = np.linspace(0, 2 * np.pi, n)
    return np.sin(20 * T * (1 + 0.2 * T)) + T**2 + np.sin(13 * T)


def test_parity_with_numpy_oracle():
    for s, max_it in [(demo_chirp(), 11), (demo_chirp(257), 3)]:
        want, reason = ref_sift(s, max_iteration=max_it)
        res = itd_sift(jnp.asarray(s), max_it)
        n = int(res.num_components)
        assert n == want.shape[0]
        got = np.asarray(res.rotations[:n])
        np.testing.assert_allclose(got, want, atol=1e-11, rtol=0)
        assert int(res.stop_reason) == (STOP_FLAT if reason == "A" else STOP_BUDGET)


def test_exact_reconstruction_invariant():
    # SURVEY.md §4.1: sum(rotations) + trend == input to ~1e-10
    s = demo_chirp()
    res = itd_sift(jnp.asarray(s))
    n = int(res.num_components)
    total = neumaier_sum(res.rotations[:n], axis=0)
    err = float(jnp.max(jnp.abs(total - jnp.asarray(s))))
    assert err < 1e-10, err


def test_class_api():
    s = demo_chirp()
    itd = ITD()
    rot = itd.itd(s)
    assert rot.ndim == 2 and rot.shape[1] == s.size
    assert np.allclose(np.asarray(rot), ref_sift(s)[0], atol=1e-11)
    got_b = itd.get_baselines()
    # rotations include residual; baselines one fewer (stop A) or equal (stop B)
    assert got_b.shape[0] in (rot.shape[0] - 1, rot.shape[0])
    # __call__ works (deviation from reference's broken kwarg forward)
    assert ITD()(s).shape == rot.shape


def test_class_api_conveniences():
    s = demo_chirp()
    itd = ITD(as_numpy=True)
    rot = itd.itd(s)
    assert isinstance(rot, np.ndarray)
    comps, residual = itd.get_rotations_and_residual()
    assert comps.shape[0] == rot.shape[0] - 1
    np.testing.assert_allclose(comps.sum(0) + residual, s, atol=1e-9)


def test_flat_signal_single_zero_row():
    # first baseline already flat -> reference returns one zero row
    s = np.linspace(0.0, 1.0, 64)
    res = itd_sift(jnp.asarray(s))
    assert int(res.num_components) == 1
    assert int(res.stop_reason) == STOP_FLAT
    np.testing.assert_array_equal(np.asarray(res.rotations[0]), np.zeros(64))


def test_batched_sift():
    sigs = np.stack([demo_chirp(), demo_chirp() * 2 + 1, np.sin(np.linspace(0, 40, 400))])
    res = itd_sift(jnp.asarray(sigs), 5)
    for b, s in enumerate(sigs):
        want, _ = ref_sift(s, max_iteration=5)
        n = int(res.num_components[b])
        assert n == want.shape[0]
        np.testing.assert_allclose(
            np.asarray(res.rotations[:n, b]), want, atol=1e-11, rtol=0
        )


def test_compensated_correction_f32_exact():
    """The f32 fast path plus SiftResult.correction reconstructs the input
    exactly under f64 summation (SURVEY.md §7 hard-part f: the on-chip
    route to the reference's <=1e-10 bar without leaving f32)."""
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, 4096)
    sigs = (
        np.sin(20 * t * (1 + 0.2 * t))[None]
        + 0.3 * rng.normal(size=(3, t.size))
    ).astype(np.float32)
    for max_it in (9, 2):  # stop A (natural) and stop B (budget) paths
        res = itd_sift(jnp.asarray(sigs), max_it)
        rot = np.asarray(res.rotations, dtype=np.float64)
        corr = np.asarray(res.correction, dtype=np.float64)
        raw = np.abs(rot.sum(0) - sigs).max()
        comp = np.abs(rot.sum(0) + corr - sigs).max()
        assert comp <= 1e-10, (comp, max_it)
        # and the correction is doing real work on the f32 path
        assert raw > 1e-9, raw


def test_correction_zero_information_loss_f64():
    """In f64 the correction is ~1e-16-scale and the invariant still holds."""
    s = demo_chirp()
    res = itd_sift(jnp.asarray(s))
    corr = np.asarray(res.correction)
    assert np.abs(corr).max() < 1e-12
    n = int(res.num_components)
    total = np.asarray(res.rotations[:n]).sum(0) + corr
    assert np.abs(total - s).max() < 1e-13


def test_grad_does_not_crash():
    # functional bonus over the reference: the sift is differentiable
    s = jnp.asarray(demo_chirp(128))

    def loss(x):
        r = itd_sift(x, 3, store_baselines=False)
        return jnp.sum(r.rotations[0] ** 2)

    g = jax.grad(loss)(s)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_sift_emit_backend_matches_xla():
    """The fused Pallas emit path (TPU fast path, forced here in interpret
    mode) is bit-identical to the XLA carry loop: rows, baselines, counts,
    stop reasons, and the compensation channel, including early-stop and
    budget-stop batches and non-BLK-multiple lengths."""
    rng = np.random.default_rng(2)
    n = 8192 + 517
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(
        (np.sin(20 * t)[None] + 0.3 * rng.normal(size=(2, n))).astype(np.float32)
    )
    a = itd_sift(x, 3, backend="xla")
    b = itd_sift(x, 3, backend="pallas_emit")
    np.testing.assert_array_equal(np.asarray(a.rotations), np.asarray(b.rotations))
    np.testing.assert_array_equal(np.asarray(a.baselines), np.asarray(b.baselines))
    np.testing.assert_array_equal(
        np.asarray(a.num_components), np.asarray(b.num_components))
    np.testing.assert_array_equal(
        np.asarray(a.stop_reason), np.asarray(b.stop_reason))
    np.testing.assert_array_equal(
        np.asarray(a.correction), np.asarray(b.correction))

    # all-rows-stop-early batch (monotone rows go FLAT on trip 0): both
    # the unrolled emit loop and the opt-in early-exit while_loop (which
    # skips the remaining trips) must be output-identical to the XLA loop
    xs = jnp.asarray(np.stack([t, t**2]).astype(np.float32))
    c = itd_sift(xs, 8, backend="xla")
    for ee in (False, True):
        d = itd_sift(xs, 8, backend="pallas_emit", early_exit=ee)
        np.testing.assert_array_equal(
            np.asarray(c.rotations), np.asarray(d.rotations))
        np.testing.assert_array_equal(
            np.asarray(c.num_components), np.asarray(d.num_components))
        np.testing.assert_array_equal(
            np.asarray(c.stop_reason), np.asarray(d.stop_reason))


def test_grad_through_emit_backend():
    """jax.grad works on the Pallas emit backend: its kernels have no JVP
    rule, so a custom VJP recomputes the backward pass through the XLA
    loop (gradients match the XLA backend)."""
    s = jnp.asarray(demo_chirp(256).astype(np.float32))

    def loss(backend):
        def f(x):
            r = itd_sift(x, 3, store_baselines=False, backend=backend)
            return jnp.sum(r.rotations[0] ** 2)
        return f

    g_emit = jax.grad(loss("pallas_emit"))(s)
    g_xla = jax.grad(loss("xla"))(s)
    np.testing.assert_allclose(np.asarray(g_emit), np.asarray(g_xla),
                               rtol=0, atol=1e-5)
    assert np.all(np.isfinite(np.asarray(g_emit)))


@pytest.mark.slow
def test_sift_emit_boundary_shapes():
    """Emit-vs-XLA bit parity at shape boundaries the main parity test
    misses: exact kernel-block multiples (no padding branch), one lane
    over, tiny n, and a constant signal (flat from trip 0)."""
    rng = np.random.default_rng(5)
    for n, batch in [(8192, 2), (8192 + 128, 1), (130, 2)]:
        t = np.linspace(0, 2 * np.pi, n)
        x = jnp.asarray(
            (np.sin(7 * t)[None] + 0.4 * rng.normal(size=(batch, n))
             ).astype(np.float32))
        a = itd_sift(x, 3, backend="xla")
        b = itd_sift(x, 3, backend="pallas_emit")
        np.testing.assert_array_equal(
            np.asarray(a.rotations), np.asarray(b.rotations))
        np.testing.assert_array_equal(
            np.asarray(a.num_components), np.asarray(b.num_components))
        np.testing.assert_array_equal(
            np.asarray(a.correction), np.asarray(b.correction))

    xc = jnp.ones((2, 8192), jnp.float32)
    a = itd_sift(xc, 3, backend="xla")
    b = itd_sift(xc, 3, backend="pallas_emit")
    np.testing.assert_array_equal(
        np.asarray(a.rotations), np.asarray(b.rotations))
    assert int(a.num_components[0]) == int(b.num_components[0]) == 1


def test_pallas_fused_backend_bit_identical():
    """The one-kernel-per-level fused backend (auto default on TPU) is
    bit-identical to the XLA loop and the two-kernel emit path, including
    correction, baselines, stop bookkeeping, and NaN quarantine."""
    rng = np.random.default_rng(2)
    t = np.linspace(0, 2 * np.pi, 9000)  # non-BLK-multiple: padding
    x = np.stack([
        np.sin(20 * t) + 0.1 * rng.normal(size=t.size),
        np.sin(7 * t) * (1 + 0.1 * t) + 0.05 * rng.normal(size=t.size),
    ]).astype(np.float32)
    x[1, 4000:4002] = np.nan
    xj = jnp.asarray(x)
    a = itd_sift(xj, 5, backend="pallas_fused")
    b = itd_sift(xj, 5, backend="xla")
    c = itd_sift(xj, 5, backend="pallas_emit")
    for r in (b, c):
        np.testing.assert_array_equal(np.asarray(a.rotations),
                                      np.asarray(r.rotations))
        np.testing.assert_array_equal(np.asarray(a.baselines),
                                      np.asarray(r.baselines))
        np.testing.assert_array_equal(np.asarray(a.num_components),
                                      np.asarray(r.num_components))
        np.testing.assert_array_equal(np.asarray(a.stop_reason),
                                      np.asarray(r.stop_reason))
        np.testing.assert_array_equal(np.asarray(a.correction),
                                      np.asarray(r.correction))


def test_pallas_fused_rejects_early_exit():
    """The fused backend's unrolled trip loop has no early exit; an
    explicit request for both must raise instead of silently running the
    slower emit path (backend='auto' with early_exit selects emit)."""
    x = jnp.ones((2, 8192), jnp.float32)
    with pytest.raises(ValueError, match="early_exit"):
        itd_sift(x, 3, backend="pallas_fused", early_exit=True)


def test_fold_emit_sift_bit_identical():
    """The fold-emit fused variant (per-trip forward folds sourced from
    the previous trip's kernel instead of the full-array XLA reduce) is
    bit-identical to the default fused backend on every output field —
    including NaN rows, a spike AT a block boundary, a monotone row
    (stop A at trip 0), and a constant row."""
    from pyitd_tpu.decomp.itd import _itd_sift_fused
    from pyitd_tpu.ops.pallas_fill import BLK

    rng = np.random.default_rng(5)
    n = BLK + 700
    t = np.linspace(0, 2 * np.pi, n)
    x = np.stack([
        np.sin(20 * t) + 0.1 * rng.normal(size=n),
        np.sin(7 * t) * (1 + 0.1 * t) + 0.05 * rng.normal(size=n),
        t,                      # monotone: stop A, zero rows
        np.ones(n),             # constant
    ]).astype(np.float32)
    x[1, BLK - 1 : BLK + 2] = np.nan
    x[0, BLK] = 9.0
    xj = jnp.asarray(x)

    a = _itd_sift_fused(xj, 5, "reference", True, fold_emit=True)
    b = _itd_sift_fused(xj, 5, "reference", True, fold_emit=False)
    for f in ("rotations", "baselines", "num_components", "stop_reason",
              "correction"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f)


def test_structural_grad_matches_ad():
    """The sift's custom VJP runs the hand-written per-level adjoint
    (segment sums + knot scatter-adds) instead of differentiating the
    fill scans; it must match AD of the scan backend exactly (VERDICT r3
    item 3: AD-of-scan measured 66x the fused forward at 8x1M)."""
    from pyitd_tpu.decomp.itd import _itd_sift_xla
    from pyitd_tpu.ops.linear_baseline import (
        linear_baseline_extract, linear_baseline_extract_structural)

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, 384)
    x = jnp.asarray(np.stack([
        np.sin(20 * t * (1 + 0.2 * t)) + np.sin(13 * t)
        + 0.1 * rng.normal(size=384),
        np.sin(5 * t) + 0.3 * t,
    ]))

    # one level, all output cotangents
    ct = tuple(jnp.asarray(rng.normal(size=x.shape)) for _ in range(3))

    def lvl(fn):
        def f(a):
            r = fn(a, backend="scan")
            return r.rotation, r.baseline, r.sub_err
        return jax.vjp(f, x)[1](ct)[0]

    g_ref = lvl(linear_baseline_extract)
    g_str = lvl(linear_baseline_extract_structural)
    np.testing.assert_allclose(np.asarray(g_str), np.asarray(g_ref),
                               rtol=0, atol=1e-12)

    # full sift, loss touching rotations + baselines + correction
    def loss(backend):
        def f(a):
            r = _itd_sift_xla(a, 4, "reference", True,
                              linear_backend=backend)
            return (jnp.sum(jnp.square(r.rotations))
                    + jnp.sum(r.baselines ** 2)
                    + jnp.sum(r.correction * 0.7))
        return f

    g_ref = jax.grad(loss("scan"))(x)
    g_str = jax.grad(loss("structural"))(x)
    np.testing.assert_allclose(np.asarray(g_str), np.asarray(g_ref),
                               rtol=0, atol=1e-11)
