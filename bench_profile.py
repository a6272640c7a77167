"""Per-kernel profiling harness for the ITD hot path (SURVEY.md §5).

Times each stage of one sift level in isolation on the attached device and
derives roofline positions (achieved element throughput vs the VPU/HBM
ceilings), then captures a ``jax.profiler`` trace of the full sift into
``profiles/`` when the runtime supports it (remote-relay attachments may
not).  Run on the real chip with the stock environment:

    python bench_profile.py [batch] [n]

Remote-relay discipline (same as bench.py): identical calls are cached by
the relay and the ~30 ms dispatch floor swamps sub-ms kernels, so every
stage is timed as ONE jitted call that chains ``inner`` data-dependent
repetitions (each iteration's input depends on the previous checksum — no
relay caching, no XLA CSE, no cross-iteration overlap) and returns a
scalar.  Per-iteration time = (t(inner=K) - t(inner=1)) / (K - 1), which
cancels the dispatch floor and the chain prologue.

Prints a stage table to stderr and one JSON summary line to stdout.
"""
import json
import os
import sys
import time

import numpy as np

# v5e single-core ceilings (public spec): ~0.8 Tf32-op/s VPU (4 vector
# units x 8x128 lanes x ~940 MHz x 2 ops), ~819 GB/s HBM.
VPU_OPS = 0.8e12
HBM_BPS = 819e9


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from pyitd_tpu import itd_sift
    from pyitd_tpu.ops.extrema import count_extrema
    from pyitd_tpu.ops.linear_baseline import linear_baseline_extract
    from pyitd_tpu.ops.pallas_fill import linear_fill2_pallas

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    dev = jax.devices()[0]
    on_tpu = dev.platform == "tpu"
    print(f"device: {dev} ({batch}x{n})", file=sys.stderr)

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(
        np.sin(20 * t[None] * (1 + 0.2 * t[None]))
        + 0.3 * rng.normal(size=(batch, n)),
        dtype=jnp.float32,
    )
    elems = batch * n
    interp = not on_tpu

    def chk(outs):
        if isinstance(outs, (tuple, list)):
            return sum(jnp.sum(o[..., :8].astype(jnp.float32)) for o in outs)
        return jnp.sum(outs[..., :8].astype(jnp.float32))

    def chained(fn, inner):
        @jax.jit
        def run(a, salt):
            def body(i, carry):
                s, seed = carry
                out = fn(a + (seed * 1e-12 + salt))
                c = chk(out)
                return s + c, c * 1e-9
            s, _ = jax.lax.fori_loop(0, inner, body, (0.0, jnp.float32(0)))
            return s
        return run

    def stage_time(fn, k_lo=1, k_hi=8, reps=3):
        lo, hi = chained(fn, k_lo), chained(fn, k_hi)
        float(lo(x, 0.0))  # compile both
        float(hi(x, 1.0))
        best = np.inf
        for r in range(reps):
            t0 = time.time(); float(lo(x, 2.0 + r)); t_lo = time.time() - t0
            t0 = time.time(); float(hi(x, 5.0 + r)); t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
        return max(best, 1e-9)

    from pyitd_tpu.ops.cubic_baseline import cubic_baseline_extract

    # worst-case knot capacity (the TPU chained backends have no compact
    # buffers and ignore it; the CPU gather backend truncates past it)
    cub_cap = n + 2

    stages = [
        # (name, fn, VPU op estimate per element, HBM bytes per element)
        ("fill2 fwd (pallas)", lambda a: linear_fill2_pallas(a, interpret=interp),
         320, 4 + 16),
        ("fill2 rev (pallas)",
         lambda a: linear_fill2_pallas(a, reverse=True, interpret=interp),
         320, 4 + 16),
        ("full level (fills+knots+interp)",
         lambda a: linear_baseline_extract(a, backend="auto").baseline,
         760, 8 + 4),
        ("extrema count", count_extrema, 12, 4),
        ("full sift (10 levels)",
         lambda a: itd_sift(a, 8, store_baselines=False).rotations[0],
         7600, 120),
        # VERDICT r3 item 3: the Pallas sift's custom VJP recomputes the
        # backward through the (remat-per-level) XLA loop; this stage
        # records the grad-to-forward ratio on-chip
        ("full sift GRAD (vjp via xla loop)",
         jax.grad(lambda a: jnp.sum(
             jnp.square(itd_sift(a, 8, store_baselines=False).rotations))),
         0, 0),
        ("cubic baseline (MEITD tier)",
         lambda a: cubic_baseline_extract(a, capacity=cub_cap,
                                          min_extrema=0).baseline,
         2000, 60),
        # VERDICT r4 item 1: the cubic tier's custom VJP (backward = AD
        # of the scan formulation); records the cubic grad-to-forward
        # ratio on-chip
        ("cubic baseline GRAD (custom vjp)",
         jax.grad(lambda a: jnp.sum(jnp.square(
             cubic_baseline_extract(a, capacity=cub_cap,
                                    min_extrema=0).rotation))),
         0, 0),
    ]

    # 2-D ensemble ITD (siftED2D): 20-iteration paired-noise ensemble on a
    # 256x256 tile carved from the bench signal — timed separately because
    # its element count differs from the 1-D stages
    from pyitd_tpu.decomp.itd2d import statistical_component

    img = x[0, : 256 * 256].reshape(256, 256)
    key2d = jax.random.PRNGKey(0)

    def run2d(a):
        return statistical_component(a, key2d, 20)

    f2d = jax.jit(lambda a, salt: jnp.sum(run2d(a + salt)[..., :8]))
    # fresh salts per run: constant salts replay identical executions into
    # the relay cache and the reading becomes a cache-lookup time
    salt0 = (time.time() % 1000.0) * 1e-7
    float(f2d(img, salt0))
    best = np.inf
    for r in range(3):
        t0 = time.time()
        float(f2d(img, salt0 + 1e-6 * (r + 1)))
        best = min(best, time.time() - t0)
    el2d = 256 * 256
    print(
        f"{'2-D ensemble (20-iter, 256^2)':36s} {best*1e3:8.2f} ms  "
        f"{el2d/best/1e6:9.1f} Msamp/s (one call, incl dispatch)",
        file=sys.stderr,
    )
    stages_extra = [("2d ensemble 256^2 (one-call)", best,
                     el2d / best / 1e6, 0, 0)]

    # shard_map demonstrations on a 1x1 (data, seq) mesh: prove the Pallas
    # fast paths actually engage under shard_map on the real chip — timing
    # parity with the plain sift is the witness (the XLA fills are ~5-10x
    # slower per level).  VERDICT r2 items 1 & 4.
    if on_tpu:
        from pyitd_tpu.parallel.batch import pjit_itd_sift
        from pyitd_tpu.parallel.sharded import make_mesh, sharded_itd_sift

        mesh1 = make_mesh(1, seq=1)
        fdp = pjit_itd_sift(mesh1, 8, store_baselines=False)
        stages.append(
            ("full sift under shard_map(data)",
             lambda a: fdp(a)[0][0], 7600, 120))
        stages.append(
            ("sharded sift 1x1 mesh (pallas)",
             lambda a: sharded_itd_sift(a, mesh1, 8)[0][0], 7600, 120))

    # BASELINE.json configs 3 and 5 as one-call stages (opt-in: each new
    # shape is a fresh remote Mosaic compile, so they're off by default)
    if os.environ.get("PYITD_BENCH_EXTRA") == "1":
        from pyitd_tpu.decomp.itd_fourier import fourier_mode_any

        eeg = x[:, : 256 * 16384 // batch].reshape(256, 16384)

        def one_call(name, fn, arr, elems_n):
            g = jax.jit(lambda a, s: jnp.sum(fn(a + s)[..., :8]))
            s0 = (time.time() % 1000.0) * 1e-7
            float(g(arr, s0))
            best_t = np.inf
            for r in range(3):
                t0 = time.time()
                float(g(arr, s0 + 1e-6 * (r + 1)))
                best_t = min(best_t, time.time() - t0)
            print(
                f"{name:36s} {best_t*1e3:8.2f} ms  "
                f"{elems_n/best_t/1e6:9.1f} Msamp/s (one call, incl "
                "dispatch)", file=sys.stderr)
            stages_extra.append((name, best_t, elems_n / best_t / 1e6, 0, 0))

        one_call("vmapped sift 256x16k (config 3)",
                 lambda a: itd_sift(a, 8, store_baselines=False).rotations[0],
                 eeg, 256 * 16384)
        one_call("fourier mode 1M (config 5 inner)",
                 lambda a: fourier_mode_any(a), x[:1], n)

    rows = []
    for name, fn, ops_est, bytes_est in stages:
        dt = stage_time(fn)
        if dt < 20e-6:
            # below the chain-differencing resolution (relay jitter is
            # tens of us): report the bound, not a fantasy throughput
            rows.append((name, dt, float("nan"), 0, 0))
            print(f"{name:36s}  <0.02 ms (below differencing resolution)",
                  file=sys.stderr)
            continue
        msamp = elems / dt / 1e6
        vpu_frac = ops_est * elems / dt / VPU_OPS
        hbm_frac = bytes_est * elems / dt / HBM_BPS
        rows.append((name, dt, msamp, vpu_frac, hbm_frac))
        print(
            f"{name:36s} {dt*1e3:8.2f} ms  {msamp:9.1f} Msamp/s"
            f"   ~VPU {vpu_frac*100:5.1f}%   ~HBM {hbm_frac*100:5.1f}%",
            file=sys.stderr,
        )

    trace_ok = False
    try:
        sift = jax.jit(lambda a: itd_sift(a, 8, store_baselines=False).rotations)
        with jax.profiler.trace("profiles"):
            jax.block_until_ready(sift(x))
        trace_ok = True
        print("trace written to profiles/", file=sys.stderr)
    except Exception as e:  # remote relays can't always host the collector
        print(f"profiler trace unavailable: {e}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "sift_level_time",
                "value": round(rows[2][1] * 1e3, 3),
                "unit": "ms",
                "stages": {
                    r[0]: round(r[1] * 1e3, 3) for r in rows + stages_extra
                },
                "trace": trace_ok,
            }
        )
    )


if __name__ == "__main__":
    main()
