"""Headline benchmark: full 10-level ITD sift of batched 1M-point signals.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
metric is sift throughput in Msamples/sec/chip (samples = batch * N) and
vs_baseline is value / 100 (the >=100 Msamp/s v5e target from BASELINE.md).

Design notes for remote/relay TPU attachments: everything (sift + checksum
+ compensated-sum reconstruction error) is ONE jitted function returning
scalars, and timing fetches a scalar each iteration — a host round trip is
the only reliable completion barrier on async backends.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pyitd_tpu import itd_sift
    from pyitd_tpu.utils.summation import neumaier_sum_parts

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

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

    @jax.jit
    def run(a, salt):
        xx = a + salt
        res = itd_sift(xx, max_iteration, store_baselines=False)
        s, c = neumaier_sum_parts(res.rotations, axis=0)
        err = jnp.max(jnp.abs((s + c) - xx))  # fast-path (f32) error
        # verify path: s - xx is exact where s ~ xx (Sterbenz), so adding the
        # Neumaier residual and the sift's telescoping correction recovers
        # the true reconstruction error to ~1 ulp of the correction itself
        err_comp = jnp.max(jnp.abs((s - xx) + (c + res.correction)))
        checksum = jnp.sum(res.rotations[0]) + jnp.sum(res.num_components)
        return checksum, err, err_comp, jnp.max(res.num_components)

    t0 = time.time()
    cs, err, err_comp, ncomp = run(x, 0.0)
    cs.block_until_ready()
    float(cs)  # host fetch = completion barrier
    print(f"compile+first run: {time.time()-t0:.2f}s", file=sys.stderr)

    iters = 5
    t0 = time.time()
    acc = 0.0
    for i in range(iters):
        # vary the input (salt) so cached results can't short-circuit
        cs, err, err_comp, ncomp = run(x, float(i) * 1e-6)
        acc += float(cs)
    dt = (time.time() - t0) / iters
    msamp = batch * n / dt / 1e6

    print(f"levels used: {int(ncomp)}, recon max-abs err (f32 path): {float(err):.3e}, "
          f"compensated: {float(err_comp):.3e} (target <=1e-10)",
          file=sys.stderr)
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
