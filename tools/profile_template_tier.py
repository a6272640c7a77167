"""Stage-level profile of one sine-template cubic extraction at 1M points
(the ITD-Fourier hot path, BASELINE config 5b).  Run on the chip:

    python tools/profile_template_tier.py
"""
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from pyitd_tpu.decomp.itd_fourier import (itd_sine_sift,
                                              sine_template_positions)
    from pyitd_tpu.ops.cubic_baseline import (_scatter_channels,
                                              template_fast_baseline)
    from pyitd_tpu.ops.fill import forward_fill_scan, take_last_axis
    from pyitd_tpu.ops.tridiag import reference_spline_moments

    n, sr = 1 << 20, 2048
    rng = np.random.default_rng(0)
    t = np.arange(n) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 50 * t) + 0.2 * rng.normal(size=n),
                    jnp.float32)
    positions, counts, freqs = sine_template_positions(sr, n)
    # the densest comb entry (most knots)
    fi = int(np.argmax(np.asarray(counts)))
    pos = positions[fi]
    cnt = counts[fi]
    cap = pos.shape[-1]
    print(f"n={n}, freqs={len(freqs)}, densest comb entry: "
          f"{int(cnt)} knots (cap {cap})", file=sys.stderr)

    def chain(fn, k):
        @jax.jit
        def run(a, salt):
            def body(i, c):
                s, seed = c
                o = fn(a + (salt + seed * 1e-12))
                cs = jnp.sum(o[..., :8].astype(jnp.float32))
                return s + cs, cs * 1e-9
            s, _ = lax.fori_loop(0, k, body,
                                 (jnp.float32(0), jnp.float32(0)))
            return s
        return run

    def stage(name, fn, lo=1, hi=4):
        flo, fhi = chain(fn, lo), chain(fn, hi)
        float(flo(x, 0.0)); float(fhi(x, 1.0))
        best = np.inf
        for r in range(3):
            t0 = time.time(); float(flo(x, 2.0 + r)); tl = time.time() - t0
            t0 = time.time(); float(fhi(x, 5.0 + r)); th = time.time() - t0
            best = min(best, (th - tl) / (hi - lo))
        print(f"{name:44s} {best*1e3:9.2f} ms", file=sys.stderr)
        return best

    k = jnp.arange(cap)
    valid = k < cnt
    stage("xe gather (take_last_axis x@pos, cap)",
          lambda a: take_last_axis(a, pos))
    stage("moments (affine, cap)",
          lambda a: reference_spline_moments(
              take_last_axis(a, pos),
              jnp.where(valid, 1.0, 0.0).astype(a.dtype), cnt))
    stage("scatter 7ch (cap -> n grid)",
          lambda a: _scatter_channels(
              a, pos, valid,
              tuple(take_last_axis(a, pos) for _ in range(7)))[0])
    stage("ffill 6ch (n grid)",
          lambda a: forward_fill_scan(
              tuple(a for _ in range(6)),
              lax.broadcasted_iota(jnp.int32, a.shape, 0) % 97 == 0,
              (0.0,) * 6)[0])
    stage("template_fast_baseline (densest)",
          lambda a: template_fast_baseline(a, pos, cnt))
    stage("itd_sine_sift (full comb)",
          lambda a: itd_sine_sift(a, sr)[0][0], 1, 2)


if __name__ == "__main__":
    main()
