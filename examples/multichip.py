"""pyitd_tpu multi-chip quickstart — sift a signal bank over a device mesh.

Demonstrates the two sift parallelisms and checks both against the
single-device result:

* **data parallel** (`parallel.batch.pjit_itd_sift`): the batch axis is
  sharded over the mesh's 'data' axis; zero collectives.
* **sequence parallel** (`parallel.sharded.sharded_itd_sift`): the TIME
  axis is sharded over 'seq'; cross-shard traffic per sift level is one
  1-sample halo `ppermute` plus an `all_gather` of 4-scalar-per-row
  fill-state summaries — O(shards), never O(samples).

Run on real hardware as-is (uses every visible device), or emulate a
mesh on CPU:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pyitd_tpu import itd_sift  # noqa: E402
from pyitd_tpu.parallel.batch import pjit_itd_sift  # noqa: E402
from pyitd_tpu.parallel.sharded import make_mesh, sharded_itd_sift  # noqa: E402


def main():
    n_dev = len(jax.devices())
    print(f"devices: {n_dev} x {jax.devices()[0].platform}")

    # a bank of chirpy signals; n must divide the seq axis
    batch, n = 4, 32768
    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, n)
    x = jnp.asarray(
        np.sin(20 * t[None] * (1 + 0.2 * t[None])) + np.sin(13 * t[None])
        + 0.3 * rng.normal(size=(batch, n)),
        jnp.float32,
    )

    # single-device ground truth
    ref = itd_sift(x, 8, store_baselines=False)

    # --- data parallel: batch must divide the 'data' axis ---
    seq = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    data = min(batch, n_dev // seq)
    mesh = make_mesh(data * seq, seq=seq)
    print(f"mesh: data={data} x seq={seq}")

    dp = pjit_itd_sift(mesh, 8, store_baselines=False)
    rot_dp = dp(x)[0]
    print("data-parallel  == single-device:",
          bool(jnp.all(rot_dp == ref.rotations)))

    # --- sequence parallel: the time axis is sharded ---
    rot_sp, ncomp, reason, corr = sharded_itd_sift(x, mesh, 8)
    print("seq-parallel   == single-device:",
          bool(jnp.all(rot_sp == ref.rotations)),
          "| correction bitwise:",
          bool(jnp.all(corr == ref.correction)))

    # the compensated-reconstruction contract survives sharding
    s = jnp.sum(rot_sp, axis=0)
    err = float(jnp.max(jnp.abs(s - x)))
    print(f"recon max-abs err (f32 fast path): {err:.3e}")

    # --- model parallel: one tp training step + a GPipe pipeline ---
    import optax

    from pyitd_tpu.ml.moe import BiMLP
    from pyitd_tpu.ml.parseval import GPTConfig, ParsevalGPT
    from pyitd_tpu.parallel.pipeline import gpipe_apply, stack_stage_params
    from pyitd_tpu.parallel.train import (
        PARSEVAL_TP_RULES, make_tp_mesh, make_train_step, param_specs,
        shard_batch, shard_params)

    tp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    tmesh = make_tp_mesh(n_dev, model=tp)
    cfg = GPTConfig(block_size=16, vocab_size=32, n_layer=1, n_embd=32,
                    wavelet_levels=2, near_window=4, ancilla_dim=8,
                    n_anchor=8)
    gpt = ParsevalGPT(cfg)
    xb = jnp.asarray(rng.integers(0, 32, size=(2 * (n_dev // tp), 16)))
    params = gpt.init(jax.random.PRNGKey(0), xb, xb)
    specs = param_specs(params, PARSEVAL_TP_RULES)
    step = make_train_step(lambda p, b: gpt.apply(p, b[0], b[1])[1],
                           optax.sgd(0.05), tmesh, specs)
    p_sh = shard_params(params, tmesh, PARSEVAL_TP_RULES)
    tx0 = optax.sgd(0.05)
    _, _, loss = step(p_sh, jax.jit(tx0.init)(p_sh),
                      shard_batch((xb, xb), tmesh))
    print(f"tp train step  (data={n_dev // tp} x model={tp}): "
          f"loss {float(loss):.3f}")

    import numpy as _np
    from jax.sharding import Mesh as _Mesh

    pmesh = _Mesh(_np.asarray(jax.devices()[:n_dev]).reshape(n_dev // tp, tp),
                  ("data", "pp"))
    block = BiMLP()
    xs = jnp.asarray(rng.normal(size=(4, 2 * (n_dev // tp), 16)), jnp.float32)
    stages = stack_stage_params(
        [block.init(k, xs[0])
         for k in jax.random.split(jax.random.PRNGKey(2), tp)])
    pipe = gpipe_apply(lambda p, h: block.apply(p, h), pmesh, n_micro=4)
    y = pipe(stages, xs)
    seq_ref = xs
    for i in range(tp):
        seq_ref = block.apply(jax.tree.map(lambda a: a[i], stages), seq_ref)
    print("gpipe pipeline == sequential stack:",
          bool(jnp.max(jnp.abs(y - seq_ref)) < 1e-5))


if __name__ == "__main__":
    main()
