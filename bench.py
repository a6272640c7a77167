"""Headline benchmark: full 10-level ITD sift of batched 1M-point signals.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where the
metric is sift throughput in Msamples/sec/chip (samples = batch * N, the
BASELINE.md convention) and vs_baseline is value / 100 (the >=100 Msamp/s
v5e target).  Runs on whatever jax.devices()[0] is — the real TPU chip under
the driver, CPU locally with JAX_PLATFORMS=cpu.

Extra context (reconstruction error, config) goes to stderr only.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pyitd_tpu import itd_sift, neumaier_sum

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)

    batch, n, max_iteration = 8, 1_000_000, 8  # 10 sift levels incl. residual
    dtype = jnp.float32
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n, dtype=np.float64)
    sigs = (
        np.sin(20 * t[None, :] * (1 + 0.2 * t[None, :]))
        + np.sin(13 * t[None, :])
        + 0.3 * rng.normal(size=(batch, n))
        + t[None, :] ** 2 * 0.1
    )
    x = jnp.asarray(sigs, dtype=dtype)

    fn = jax.jit(
        lambda a: itd_sift(a, max_iteration, store_baselines=False),
        static_argnums=(),
    )
    t0 = time.time()
    res = fn(x)
    jax.block_until_ready(res.rotations)
    print(f"compile+first run: {time.time()-t0:.2f}s", file=sys.stderr)

    iters = 3
    t0 = time.time()
    for _ in range(iters):
        res = fn(x)
    jax.block_until_ready(res.rotations)
    dt = (time.time() - t0) / iters
    msamp = batch * n / dt / 1e6

    ncomp = int(np.max(np.asarray(res.num_components)))
    recon = neumaier_sum(res.rotations[:ncomp], axis=0)
    err = float(jnp.max(jnp.abs(recon - x)))
    print(f"levels used: {ncomp}, recon max-abs err (f32 path): {err:.3e}", file=sys.stderr)
    print(f"time/sift: {dt*1e3:.1f} ms for {batch}x{n}", file=sys.stderr)

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
