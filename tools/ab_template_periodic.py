"""On-chip A/B: the sine-template tier with the periodic matmul path
(one-hot compaction + two-matmul eval on the MXU) vs the generic
gather path (VERDICT r4 item 2 — the ITD-Fourier perf thread; the
densest comb entry's 887k-knot scalar gather alone measured 5.8 ms).

Measures, steady-state (chained executions, chain-length differencing):
  * one densest-entry template baseline, generic vs periodic
  * itd_sine_sift (full 10-freq comb), generic vs periodic
  * one full cascade iteration (sift + vmapped mode extraction + update),
    i.e. exactly what bench.py times, generic vs periodic
and checks periodic-vs-generic agreement at f32 roundoff.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/ab_template_periodic.py
"""
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    import jax.numpy as jnp
    from jax import lax

    import pyitd_tpu.ops.cubic_baseline as cb
    from pyitd_tpu.decomp.itd_fourier import (_sine_template_static,
                                              fourier_mode_any,
                                              itd_sine_sift)

    n, sr = 1 << 20, 2048
    print(f"device: {jax.devices()[0]} (n={n}, sr={sr})", file=sys.stderr)

    rng = np.random.default_rng(4)
    t = np.arange(n) / sr
    x = jnp.asarray(
        np.sin(2 * np.pi * 50 * t) + 0.6 * np.sin(2 * np.pi * 220 * t)
        + 0.2 * rng.normal(size=n), jnp.float32)

    real_plan = cb._template_period_plan

    def force(periodic):
        cb._template_period_plan = real_plan if periodic else (
            lambda *a, **k: None)

    def chained(fn, inner):
        @jax.jit
        def run(a, salt):
            def body(i, carry):
                s, seed = carry
                out = fn(a + (seed * 1e-12 + salt))
                c = jnp.sum(out[..., :8].astype(jnp.float32))
                return s + c, c * 1e-9
            s, _ = lax.fori_loop(0, inner, body, (0.0, jnp.float32(0)))
            return s
        return run

    def stage_time(fn, k_lo=1, k_hi=4, reps=3):
        lo, hi = chained(fn, k_lo), chained(fn, k_hi)
        s0 = (time.time() % 1000.0) * 1e-7
        float(lo(x, s0)); float(hi(x, s0 + 1e-6))
        best = np.inf
        for r in range(reps):
            sr_ = s0 + 1e-6 * (2 + 2 * r)
            t0 = time.time(); float(lo(x, sr_)); t_lo = time.time() - t0
            t0 = time.time(); float(hi(x, sr_ + 1e-6)); t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (k_hi - k_lo))
        return max(best, 1e-9)

    pos_np, cnt, hint = _sine_template_static(sr, n)[0]

    def densest(a):
        return cb.template_fast_baseline(a, pos_np, cnt, period_hint=hint)

    def sift(a):
        # consume EVERY rotation + the residual (reading only one would
        # let XLA dead-code-eliminate the rest of the comb)
        rot, res = itd_sine_sift(a, sr)
        return jnp.sum(rot, axis=0) + res

    mode_fn = jax.vmap(fourier_mode_any)

    def cascade_iter(a):
        rotations, residual = itd_sine_sift(a, sr)
        modes = mode_fn(rotations)
        is_mode = ~jnp.all(jnp.isclose(modes, 0.0), axis=-1)
        rotations = jnp.where(is_mode[..., None], rotations - modes,
                              rotations)
        return jnp.sum(rotations, axis=0) + residual

    stages = [("densest baseline", densest, 8),
              ("itd_sine_sift", sift, 4),
              ("cascade iteration", cascade_iter, 4)]
    pick = sys.argv[1] if len(sys.argv) > 1 else "all"
    if pick != "all":
        stages = [s for s in stages if s[0].startswith(pick)]

    if pick in ("all", "densest"):
        # correctness first
        force(True); a = np.asarray(jax.jit(densest)(x))
        force(False); b = np.asarray(jax.jit(densest)(x))
        d = np.abs(a - b).max()
        print(f"densest periodic-vs-generic: maxabs={d:.3e}")
        assert d < 2e-6, d

    results = {}
    for name, fn, hi in stages:
        for periodic in (False, True):
            force(periodic)
            dt = stage_time(fn, 1, hi)
            results[(name, periodic)] = dt
            print(f"{name:18s} {'periodic' if periodic else 'generic ':8s}"
                  f" {dt * 1e3:9.2f} ms", file=sys.stderr)
        g, p = results[(name, False)], results[(name, True)]
        print(f"{name:18s} generic {g*1e3:8.2f} ms -> periodic "
              f"{p*1e3:8.2f} ms  ({g/p:.2f}x)")
    force(True)
    if ("cascade iteration", True) in results:
        dt = results[("cascade iteration", True)]
        print(f"cascade throughput: {n / dt / 1e6:.1f} Msamp/s")


if __name__ == "__main__":
    main()
