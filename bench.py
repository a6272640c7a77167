"""Headline benchmark: full 10-level ITD sift of batched 1M-point signals.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
metric is sift throughput in Msamples/sec/chip (samples = batch * N) and
vs_baseline is value / 100 (the >=100 Msamp/s v5e target from BASELINE.md).

Remote/relay measurement discipline:
* correctness (reconstruction error, fast + compensated paths) is checked in
  a separate un-timed call;
* throughput is measured steady-state: ONE jitted call chains ``inner``
  data-dependent sift repetitions (each iteration's input is salted with the
  previous checksum, so neither the relay's result cache nor XLA CSE can
  collapse them, and iterations cannot overlap) and returns a scalar.  The
  per-sift time is ``(t(inner=hi) - t(inner=lo)) / (hi - lo)``, which
  cancels the relay's ~30 ms dispatch floor — an artifact of the remote
  attachment, not of the chip.
"""
import json
import sys
import time

import numpy as np


def main():
    import os

    import jax

    # persistent compilation cache (same as tests/conftest.py): the sift's
    # Pallas modules are expensive to compile over the remote relay; cache
    # them on disk keyed by HLO hash so only the first-ever run of a given
    # code state pays the cold compile.  Reported honestly below.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax
        cache_dir = None

    import jax.numpy as jnp

    from pyitd_tpu import itd_sift
    from pyitd_tpu.utils.summation import neumaier_sum_parts

    dev = jax.devices()[0]
    n_cached = (len(os.listdir(cache_dir)) if cache_dir and
                os.path.isdir(cache_dir) else 0)
    print(f"device: {dev} (persistent cache: {n_cached} entries)",
          file=sys.stderr)

    batch, n, max_iteration = 8, 1_000_000, 8  # 10 sift levels incl. residual
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n, dtype=np.float64)
    sigs = (
        np.sin(20 * t[None, :] * (1 + 0.2 * t[None, :]))
        + np.sin(13 * t[None, :])
        + 0.3 * rng.normal(size=(batch, n))
        + t[None, :] ** 2 * 0.1
    )
    x = jnp.asarray(sigs, dtype=jnp.float32)

    # ONE jitted program for everything: the chain length is a TRACED
    # fori_loop bound (so lo/hi chains share the compile), and the
    # reconstruction checks run via lax.cond on the chain's last
    # iteration only (present in both chain lengths, so the differencing
    # cancels their cost).  The relay-side Mosaic compile of the fused
    # sift kernel is expensive and not reliably cached, so compiling one
    # program instead of three is the difference between ~minutes and
    # ~ten minutes cold.
    @jax.jit
    def run(a, salt, inner):
        def body(i, carry):
            acc, seed, err, err_comp, ncomp = carry
            ai = a + (salt + seed * 1e-12)
            res = itd_sift(ai, max_iteration, store_baselines=False)
            cs = jnp.sum(res.rotations[0, :, ::65536]) + jnp.sum(
                res.num_components
            ).astype(jnp.float32)

            def check(_):
                s, c = neumaier_sum_parts(res.rotations, axis=0)
                e = jnp.max(jnp.abs((s + c) - ai))  # fast-path (f32) error
                # verify path: s - ai is exact where s ~ ai (Sterbenz), so
                # adding the Neumaier residual and the sift's telescoping
                # correction recovers the true reconstruction error to
                # ~1 ulp of the correction itself
                ec = jnp.max(jnp.abs((s - ai) + (c + res.correction)))
                return e, ec, jnp.max(res.num_components)

            err, err_comp, ncomp = jax.lax.cond(
                i == inner - 1, check,
                lambda _: (err, err_comp, ncomp), None)
            return acc + cs, cs * 1e-9, err, err_comp, ncomp

        acc, _, err, err_comp, ncomp = jax.lax.fori_loop(
            0, inner, body,
            (jnp.float32(0), jnp.float32(0), jnp.float32(0),
             jnp.float32(0), jnp.int32(0)),
        )
        return acc, err, err_comp, ncomp

    t0 = time.time()
    _, err, err_comp, ncomp = jax.block_until_ready(run(x, 0.0, 1))
    err_f = float(err)
    print(f"compile+check run: {time.time()-t0:.2f}s", file=sys.stderr)
    print(
        f"levels used: {int(ncomp)}, recon max-abs err (f32 path): {err_f:.3e}, "
        f"compensated: {float(err_comp):.3e} (target <=1e-10)",
        file=sys.stderr,
    )

    lo_n, hi_n = 1, 6
    float(run(x, 1.0, hi_n)[0])  # warm both chain lengths
    best = np.inf
    acc = 0.0
    for r in range(3):
        t0 = time.time(); acc += float(run(x, 2.0 + r, lo_n)[0]); t_lo = time.time() - t0
        t0 = time.time(); acc += float(run(x, 5.0 + r, hi_n)[0]); t_hi = time.time() - t0
        best = min(best, (t_hi - t_lo) / (hi_n - lo_n))
    dt = best
    msamp = batch * n / dt / 1e6

    print(f"time/sift: {dt*1e3:.1f} ms for {batch}x{n} (checksum {acc:.3e})",
          file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "itd_sift_throughput",
                "value": round(msamp, 2),
                "unit": "Msamples/sec/chip",
                "vs_baseline": round(msamp / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
