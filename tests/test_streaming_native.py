import numpy as np
import jax.numpy as jnp
import pytest

from pyitd_tpu.decomp.streaming import streaming_itd, streaming_init, streaming_step
from pyitd_tpu import runtime


def chirpy(n, seed=0):
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n)
    return np.sin(2 * np.pi * 40 * t * (1 + t)) + 0.1 * rng.normal(size=n)


def test_streaming_reconstructs_inner_hops():
    x = chirpy(1024)
    hop = 128
    rots, bases, readys = streaming_itd(jnp.asarray(x), hop)
    r = np.asarray(rots)
    b = np.asarray(bases)
    rd = np.asarray(readys)
    assert rd[:2].sum() == 0 and rd[2:].all()
    # each emitted hop decomposes x[(k-1)*hop : k*hop] exactly
    for k in range(2, r.shape[0]):
        want = x[(k - 1) * hop : k * hop]
        np.testing.assert_allclose(r[k] + b[k], want, atol=1e-10)
    # baselines are smoother than the signal
    assert np.var(np.diff(b[3])) < np.var(np.diff(x[2 * hop : 3 * hop]))


def test_streaming_step_matches_offline():
    x = chirpy(640, seed=1)
    hop = 64
    state = streaming_init(hop)
    outs = []
    for k in range(10):
        state, rot, base, ready = streaming_step(state, jnp.asarray(x[k * hop : (k + 1) * hop]), hop)
        outs.append((np.asarray(rot), np.asarray(base), bool(ready)))
    rots, bases, readys = streaming_itd(jnp.asarray(x), hop)
    for k in range(10):
        np.testing.assert_allclose(outs[k][0], np.asarray(rots[k]), atol=1e-12)
        np.testing.assert_allclose(outs[k][1], np.asarray(bases[k]), atol=1e-12)


needs_native = pytest.mark.skipif(
    not runtime.native_available(), reason="native toolchain unavailable"
)


@needs_native
def test_native_baseline_extract_and_reuse():
    x = chirpy(2048, seed=2)
    rot, base, state = runtime.baseline_extract(x)
    np.testing.assert_allclose(rot + base, x, atol=1e-12)
    assert int(state[1][0]) > 10
    # reuse extrema on a second channel
    y = chirpy(2048, seed=3)
    rot2, base2, _ = runtime.baseline_extract(y, extrema_state=state)
    np.testing.assert_allclose(rot2 + base2, y, atol=1e-12)


@needs_native
def test_native_iq():
    # the joint detector needs *simultaneous* extrema in both channels
    # (quadrature pairs never coincide — reference semantics, itd.cpp:74-78)
    n = 1024
    t = np.linspace(0, 1, n)
    re = np.cos(2 * np.pi * 30 * t) * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))
    im = 0.8 * re + 0.1
    base, state = runtime.baseline_extract_iq(re, im)
    assert np.all(np.isfinite(base))
    assert int(state[1][0]) > 5


@needs_native
def test_native_streaming_matches_jax_protocol():
    x = chirpy(1024, seed=4)
    hop = 128
    s = runtime.StreamingITD(hop)
    emitted = []
    for k in range(8):
        out = s.push(x[k * hop : (k + 1) * hop])
        if out is not None:
            emitted.append(out)
    s.close()
    assert len(emitted) == 6
    for k, (rot, base) in enumerate(emitted, start=2):
        want = x[(k - 1) * hop : k * hop]
        np.testing.assert_allclose(rot + base, want, atol=1e-10)


def iq_pair(n, seed=0):
    """An IQ pair engineered to have coincident extrema in both channels
    (pure quadrature pairs never coincide — itd.cpp:74-82 semantics)."""
    rng = np.random.default_rng(seed)
    t = np.linspace(0, 1, n)
    re = np.cos(2 * np.pi * 25 * t) * (1 + 0.3 * np.sin(2 * np.pi * 2 * t))
    im = 0.7 * re + 0.2 + 0.02 * np.sin(2 * np.pi * 5 * t)
    return re, im


@needs_native
def test_iq_jax_matches_native():
    from pyitd_tpu import iq_baseline_extract

    re, im = iq_pair(1024)
    want, (epos, ecnt) = runtime.baseline_extract_iq(re, im)
    got, (pos, count) = iq_baseline_extract(jnp.asarray(re), jnp.asarray(im))
    m = int(count)
    assert m == int(ecnt[0])
    np.testing.assert_array_equal(np.asarray(pos[:m]), epos[:m])
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


@needs_native
def test_iq_extrema_reuse_matches_native():
    """compute_extrema=false protocol: knot placement from a first pass is
    reused on adjusted data (itd.cpp:41-44)."""
    from pyitd_tpu import iq_baseline_extract

    re, im = iq_pair(1024, seed=1)
    _, state_j = iq_baseline_extract(jnp.asarray(re), jnp.asarray(im))
    _, state_n = runtime.baseline_extract_iq(re, im)
    re2, im2 = re * 1.1 + 0.05, im * 0.9 - 0.02
    want, _ = runtime.baseline_extract_iq(re2, im2, extrema_state=state_n)
    got, _ = iq_baseline_extract(
        jnp.asarray(re2), jnp.asarray(im2), extrema=state_j
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-9)


def test_iq_baseline_degenerate_quadrature():
    """A true quadrature pair has no joint extrema -> zero baseline."""
    from pyitd_tpu import iq_baseline_extract, iq_extrema_mask

    t = np.linspace(0, 1, 512)
    re, im = np.cos(2 * np.pi * 20 * t), np.sin(2 * np.pi * 20 * t)
    assert int(iq_extrema_mask(jnp.asarray(re), jnp.asarray(im)).sum()) == 0
    base, (_, count) = iq_baseline_extract(jnp.asarray(re), jnp.asarray(im))
    assert int(count) == 0
    np.testing.assert_array_equal(np.asarray(base), np.zeros(512))


def test_iq_streaming_reconstructs_inner_hops():
    from pyitd_tpu import streaming_itd_iq

    re, im = iq_pair(1024, seed=2)
    x = (re + 1j * im).astype(np.complex128)
    hop = 128
    rots, bases, readys = streaming_itd_iq(jnp.asarray(x), hop)
    r, b, rd = np.asarray(rots), np.asarray(bases), np.asarray(readys)
    assert rd[:2].sum() == 0 and rd[2:].all()
    for k in range(2, r.shape[0]):
        want = x[(k - 1) * hop : k * hop]
        got = r[k] + b[k] * (1 + 1j)
        np.testing.assert_allclose(got, want, atol=1e-10)


def test_sharded_streaming_channel_bank():
    import jax
    from pyitd_tpu.parallel.batch import sharded_streaming_itd
    from pyitd_tpu.parallel.sharded import make_mesh
    from pyitd_tpu.decomp.streaming import streaming_itd

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(8, seq=1)  # 8-way channel sharding
    chans = np.stack([chirpy(512, seed=s) for s in range(16)])
    hop = 64
    fn = sharded_streaming_itd(mesh, hop)
    rots, bases, readys = fn(jnp.asarray(chans))
    ref = streaming_itd(jnp.asarray(chans), hop)
    np.testing.assert_allclose(np.asarray(rots), np.asarray(ref[0]), atol=1e-12)
    np.testing.assert_allclose(np.asarray(bases), np.asarray(ref[1]), atol=1e-12)


@needs_native
def test_native_pool_batch_and_bench():
    rng = np.random.default_rng(5)
    sigs = rng.normal(size=(16, 512))
    pool = runtime.NativePool(2)
    rot, base = pool.extract_batch(sigs)
    np.testing.assert_allclose(rot + base, sigs, atol=1e-12)
    rate = pool.bench(ntasks=200, task_us=50)
    assert rate > 1000  # 200 x 50us on >=1 thread
    pool.close()


def test_native_pool_back_to_back_batches():
    """Generation/park-barrier regression: a worker suspended between
    claiming an index and its bounds check must never leak into the next
    batch (stale claim -> double execution + early return with a task
    still writing).  Drive many back-to-back batches of varying size and
    pin every row against the single-task path."""
    from pyitd_tpu.runtime import NativePool, baseline_extract, native_available

    if not native_available():
        pytest.skip("native library unavailable")
    pool = NativePool(4)
    rng = np.random.default_rng(0)
    for trial in range(60):
        b = 1 + trial % 7
        n = 256 + 16 * (trial % 5)
        x = rng.normal(size=(b, n))
        rot, base = pool.extract_batch(x)
        for i in range(b):
            r1, b1, _ = baseline_extract(x[i])
            np.testing.assert_array_equal(base[i], b1)
            np.testing.assert_array_equal(rot[i], r1)
