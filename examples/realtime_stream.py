"""Real-time streaming ITD — the reference's deployed use case, as a script.

The reference ships a C++ streaming tier (`itd.cpp:31-44`: circular
buffer, recompute the inner third per hop, reuse extrema across passes)
whose consumer is a real-time audio VST (`SSB Cleanupold.vst3`) and SDR
IQ processing.  This demo drives the same capabilities in this package:

1. the native C++ tier (`pyitd_tpu.runtime.StreamingITD`) fed hop-by-hop
   like an audio callback, with per-hop latency percentiles,
2. the jittable JAX twin (`decomp/streaming.py`) producing the same
   protocol (two warm-up hops, then one decomposed hop per push),
3. extrema reuse across channels (`compute_extrema=false` protocol,
   itd.cpp:41-44) — knot placement from channel 0 applied to channel 1,
4. the thread-pool batch runner (`NativePool`, the modpool.c analogue)
   with its tasks/sec harness.

Runs anywhere; the native parts self-skip if the prebuilt .so is absent.

    python examples/realtime_stream.py
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

# the JAX streaming twin mirrors the native tier's double precision
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

from pyitd_tpu import runtime  # noqa: E402
from pyitd_tpu.decomp.streaming import (  # noqa: E402
    streaming_init, streaming_step)

SR = 48_000          # simulated sample rate (audio block processing)
HOP = 256            # samples per callback (5.3 ms at 48 kHz)
N_HOPS = 64


def live_signal(n, seed=0):
    """Speech-ish test signal: chirp + hum + noise."""
    rng = np.random.default_rng(seed)
    t = np.arange(n) / SR
    return (np.sin(2 * np.pi * 220 * t * (1 + 40 * t))
            + 0.4 * np.sin(2 * np.pi * 60 * t)
            + 0.1 * rng.normal(size=n)).astype(np.float64)


def demo_native_stream(x):
    """Hop-by-hop native streaming with callback-budget latency stats."""
    s = runtime.StreamingITD(HOP)
    lat, recon_err = [], 0.0
    emitted = 0
    try:
        for k in range(N_HOPS):
            hop = x[k * HOP:(k + 1) * HOP]
            t0 = time.perf_counter()
            out = s.push(hop)
            lat.append(time.perf_counter() - t0)
            if out is not None:
                rot, base = out
                want = x[(k - 1) * HOP:k * HOP]
                recon_err = max(recon_err, np.abs(rot + base - want).max())
                emitted += 1
    finally:
        s.close()
    lat_ms = np.sort(np.asarray(lat)) * 1e3
    budget_ms = HOP / SR * 1e3
    print(f"native stream: {emitted}/{N_HOPS} hops emitted, "
          f"recon err {recon_err:.3e}, latency p50 {lat_ms[len(lat)//2]:.3f} "
          f"/ p99 {lat_ms[int(len(lat)*0.99)]:.3f} ms "
          f"(callback budget {budget_ms:.1f} ms)")
    assert recon_err < 1e-10


def demo_jax_stream(x):
    """The same protocol as a jitted JAX scan step (offline == streamed)."""
    state = streaming_init(HOP)
    emitted, recon_err = 0, 0.0
    for k in range(N_HOPS):
        hop = jnp.asarray(x[k * HOP:(k + 1) * HOP])
        state, rot, base, ready = streaming_step(state, hop, HOP)
        if bool(ready):
            want = x[(k - 1) * HOP:k * HOP]
            err = np.abs(np.asarray(rot) + np.asarray(base) - want).max()
            recon_err = max(recon_err, err)
            emitted += 1
    print(f"jax stream:    {emitted}/{N_HOPS} hops emitted, "
          f"recon err {recon_err:.3e}")
    assert recon_err < 1e-10


def demo_extrema_reuse(x):
    """Multi-channel pass: channel 0's knot placement reused on channel 1."""
    ch0 = x[:4096]
    ch1 = 0.8 * ch0 + 0.05  # co-located extrema (same device, second channel)
    rot0, base0, state = runtime.baseline_extract(ch0)
    rot1, base1, _ = runtime.baseline_extract(ch1, extrema_state=state)
    err = np.abs(rot1 + base1 - ch1).max()
    print(f"extrema reuse: {int(state[1][0])} knots shared across channels, "
          f"ch1 recon err {err:.3e}")
    assert err < 1e-10


def demo_pool(x):
    """Batch decomposition across a thread pool + the tasks/sec harness."""
    pool = runtime.NativePool()
    try:
        signals = np.stack([x[i * 2048:(i + 1) * 2048] for i in range(8)])
        t0 = time.perf_counter()
        rots, bases = pool.extract_batch(signals)
        dt = time.perf_counter() - t0
        worst = np.abs(rots + bases - signals).max()
        rate = pool.bench(ntasks=20_000, task_us=5)
        print(f"native pool:   8x2048 batch in {dt*1e3:.2f} ms "
              f"(recon err {worst:.3e}); bench {rate:,.0f} tasks/sec")
        assert worst < 1e-10
    finally:
        pool.close()


def main():
    x = live_signal(N_HOPS * HOP)
    demo_jax_stream(x)
    if runtime.native_available():
        demo_native_stream(x)
        demo_extrema_reuse(x)
        demo_pool(x)
    else:
        print("native tier unavailable (no prebuilt .so) — skipped")
    print("ok")


if __name__ == "__main__":
    main()
