"""Same-era on-chip A/B: XLA's VPU FFT vs the MXU four-step
(`ops/mxu_fft.py`) on the shapes the bench configs actually pay for:

  * 8x(2^21) irfft  — EFD's 112-band inverse stack is this shape x14
  * 1x(2^20) rfft   — the cascade's per-rotation forward, x10/iteration

Run on the attached chip: python tools/ab_mxu_fft.py [highest|high]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from pyitd_tpu.ops.mxu_fft import irfft_mxu, rfft_mxu

    precision = sys.argv[1] if len(sys.argv) > 1 else "highest"
    salt0 = float(time.time() % 1000) / 1000.0

    def chain_time(run, lo, hi):
        float(jax.block_until_ready(run(salt0, hi)))
        best = np.inf
        for r in range(3):
            t0 = time.time()
            float(jax.block_until_ready(run(salt0 + 1 + r * 0.01, lo)))
            t_lo = time.time() - t0
            t0 = time.time()
            float(jax.block_until_ready(run(salt0 + 2 + r * 0.01, hi)))
            t_hi = time.time() - t0
            best = min(best, (t_hi - t_lo) / (hi - lo))
        return best

    rng = np.random.default_rng(0)

    for batch, n in ((8, 1 << 20), (1, 1 << 20)):
        x = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)

        def make(fft_fn, ifft_fn):
            @jax.jit
            def run(salt, inner):
                def body(i, cur):
                    spec = fft_fn(cur + salt * 1e-6)
                    out = ifft_fn(spec * 0.5)
                    return out * (1.0 + 1e-9 * i)
                return jnp.sum(jax.lax.fori_loop(0, inner, body, x)[:, ::65536])
            return run

        t_xla = chain_time(make(jnp.fft.rfft,
                                lambda s: jnp.fft.irfft(s, n=n)), 1, 3)
        t_mxu = chain_time(make(
            lambda v: rfft_mxu(v, precision=precision),
            lambda s: irfft_mxu(s, n, precision=precision)), 1, 3)
        # per-roundtrip (rfft+irfft) milliseconds
        print(f"[{batch}x{n}] roundtrip: xla {t_xla*1e3:.2f} ms  "
              f"mxu({precision}) {t_mxu*1e3:.2f} ms  "
              f"speedup {t_xla/t_mxu:.2f}x")

        # accuracy on-chip vs f64 host oracle
        spec_m = np.asarray(rfft_mxu(x, precision=precision))
        spec_x = np.asarray(jnp.fft.rfft(x))
        truth = np.fft.rfft(np.asarray(x, np.float64))
        s = np.max(np.abs(truth))
        print(f"   rfft err vs f64: xla {np.max(np.abs(spec_x-truth))/s:.2e}  "
              f"mxu {np.max(np.abs(spec_m-truth))/s:.2e}")


if __name__ == "__main__":
    main()
