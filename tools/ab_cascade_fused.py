"""Same-era on-chip A/B: unfused ITD-Fourier cascade body (10 rfft +
10 irfft per iteration) vs the fused ``cascade_iteration`` (10 rfft +
1 summed irfft).  Run on the attached chip:

    python tools/ab_cascade_fused.py

Uses fresh salts per run and jax.clear_caches() between variants
(NOTES_ROUND5.md: the inner-jit cache otherwise serves the first-traced
executable to both arms).
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from pyitd_tpu.decomp.itd_fourier import (cascade_iteration,
                                              fourier_mode_any,
                                              itd_sine_sift)

    n, sr = 1 << 20, 2048
    rng = np.random.default_rng(4)
    t = np.arange(n) / sr
    x = jnp.asarray(np.sin(2 * np.pi * 50 * t)
                    + 0.6 * np.sin(2 * np.pi * 220 * t)
                    + 0.2 * rng.normal(size=n), jnp.float32)
    salt0 = float(time.time() % 1000) / 1000.0  # fresh per run: defeat relay cache
    mode_fn = jax.vmap(fourier_mode_any)

    def chain(body, salt, inner):
        @jax.jit
        def run(s, k):
            return jnp.sum(jax.lax.fori_loop(0, k, body, x + s)[::65536])
        return run

    def unfused(i, current):
        rotations, residual = itd_sine_sift(current, sr)
        modes = mode_fn(rotations)
        is_mode = ~jnp.all(jnp.isclose(modes, 0.0), axis=-1)
        rotations = jnp.where(is_mode[..., None], rotations - modes, rotations)
        return jnp.sum(rotations, axis=0) + residual

    def fused(i, current):
        return cascade_iteration(current, sr)[0]

    def measure(body, tag):
        @jax.jit
        def run(s, k):
            return jnp.sum(jax.lax.fori_loop(0, k, body, x + s)[::65536])
        float(jax.block_until_ready(run(salt0, 3)))
        best = np.inf
        for r in range(3):
            t0 = time.time()
            float(jax.block_until_ready(run(salt0 + 1 + r * 0.01, 1)))
            t_lo = time.time() - t0
            t0 = time.time()
            float(jax.block_until_ready(run(salt0 + 2 + r * 0.01, 3)))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / 2)
        print(f"{tag}: {best*1e3:.2f} ms/iteration "
              f"({n/best/1e6:.1f} Msamp/s)")
        return best

    # numerical agreement first (one iteration, on-chip f32)
    a = unfused(0, x)
    b = fused(0, x)
    d = float(jnp.max(jnp.abs(a - b)))
    s = float(jnp.max(jnp.abs(a)))
    print(f"update agreement: max|diff| = {d:.3e} (signal max {s:.3e})")

    t_un = measure(unfused, "unfused (10 rfft + 10 irfft)")
    jax.clear_caches()
    t_fu = measure(fused, "fused   (10 rfft +  1 irfft)")
    jax.clear_caches()
    t_un2 = measure(unfused, "unfused (repeat)")
    print(f"speedup: {min(t_un, t_un2)/t_fu:.2f}x")


if __name__ == "__main__":
    main()
