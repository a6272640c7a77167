"""Distributed training quickstart — the parallel ML stack composed.

One script that strings together the framework's model-parallel training
pieces (SURVEY.md §2.5 — capabilities the reference never had — plus its
§5 checkpoint/resume convention):

* ``make_tp_mesh``       — a ('data', 'model') device mesh
* ``ParsevalGPT``        — the wavelet-attention GPT (T.py port) with
  megatron-style TP sharding rules (``PARSEVAL_TP_RULES``)
* ``make_train_step``    — pjit train step, layout pinned across steps,
  ``compute_dtype=bfloat16`` mixed precision (MXU-native forward/backward,
  f32 master weights)
* ``save_state``/``restore_state`` — orbax checkpoint mid-run, then a
  sharding-aware resume that is bitwise the uninterrupted run
* ``MatrixDashboard``    — a per-token correctness frame of the final batch

Run on real hardware as-is, or emulate a mesh on CPU (< 2 min):

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/train_parallel.py
"""
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from pyitd_tpu.ml.checkpoint import restore_state, save_state  # noqa: E402
from pyitd_tpu.ml.parseval import GPTConfig, ParsevalGPT  # noqa: E402
from pyitd_tpu.ml.visualizer import MatrixDashboard  # noqa: E402
from pyitd_tpu.ml.zoo import BatchSampler  # noqa: E402
from pyitd_tpu.parallel.train import (  # noqa: E402
    PARSEVAL_TP_RULES, make_tp_mesh, make_train_step, param_specs,
    shard_batch, shard_params)

VOCAB = 32
BLOCK = 32
STEPS = 60


def make_stream(n=100_000, seed=0):
    """Repeating motif with substitutions — learnable next-token structure
    (the train_tiny.py convention)."""
    rng = np.random.default_rng(seed)
    motif = rng.integers(0, VOCAB, size=17)
    stream = np.tile(motif, n // motif.size + 1)[:n]
    noise = rng.random(n) < 0.15
    stream[noise] = rng.integers(0, VOCAB, size=noise.sum())
    return stream.astype(np.int64)


def main():
    t0 = time.time()
    n_dev = len(jax.devices())
    tp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    dp = n_dev // tp
    batch = max(2, -(-8 // dp)) * dp  # >=8-ish, divisible by the data axis
    mesh = make_tp_mesh(n_dev, model=tp)
    print(f"devices: {n_dev} x {jax.devices()[0].platform}   "
          f"mesh: data={n_dev // tp} x model={tp}   batch={batch}")

    cfg = GPTConfig(block_size=BLOCK, vocab_size=VOCAB, n_layer=2,
                    n_embd=64, wavelet_levels=2, near_window=8,
                    ancilla_dim=8, n_anchor=8)
    model = ParsevalGPT(cfg)

    stream = make_stream()
    sampler = BatchSampler(stream, BLOCK, batch, seed=1)
    xb, yb = sampler.sample()
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(xb),
                        jnp.asarray(yb))
    n_params = sum(a.size for a in jax.tree.leaves(params))
    print(f"ParsevalGPT: {n_params/1e3:.0f}k params, "
          f"TP rules shard attention/MLP over 'model'")

    specs = param_specs(params, PARSEVAL_TP_RULES)
    p = shard_params(params, mesh, PARSEVAL_TP_RULES)
    tx = optax.adam(3e-3)
    s = jax.jit(tx.init)(p)

    # bf16 compute, f32 master weights — the TPU mixed-precision recipe
    step = make_train_step(lambda q, b: model.apply(q, b[0], b[1])[1],
                           tx, mesh, specs, compute_dtype=jnp.bfloat16)

    first = last = None
    for i in range(STEPS):
        xb, yb = sampler.sample()
        bsh = shard_batch((jnp.asarray(xb), jnp.asarray(yb)), mesh)
        p, s, loss = step(p, s, bsh)
        if i == 0:
            first = float(loss)
        last = float(loss)
        if i == STEPS // 2:
            # checkpoint mid-run, restore sharding-aware, resume
            path = os.path.join(tempfile.mkdtemp(), "ckpt")
            save_state(path, {"params": p, "opt": s})
            back = restore_state(path, {"params": p, "opt": s})
            p, s = back["params"], back["opt"]
            spec = p["params"]["lm_head"]["kernel"].sharding.spec
            print(f"step {i}: checkpointed + resumed "
                  f"(lm_head kernel restored with spec {spec})")
        if i % 20 == 0:
            print(f"step {i:3d}  loss {float(loss):.3f}")

    print(f"loss {first:.3f} -> {last:.3f} over {STEPS} steps "
          f"({time.time() - t0:.0f}s)")
    assert last < first, "training must reduce the loss"

    # dashboard frame of the final batch's per-token predictions
    logits, _ = model.apply(p, jnp.asarray(xb), jnp.asarray(yb))
    preds = np.asarray(jnp.argmax(logits, -1))
    dash = MatrixDashboard(n_cols=BLOCK, n_rows=min(16, batch), cell=5)
    for b in range(min(16, batch)):
        frame = dash.update(preds[b], np.asarray(yb)[b], loss=last)
    out = os.path.join(os.path.dirname(__file__), "dashboard_parallel.png")
    try:
        from PIL import Image

        Image.fromarray(frame).save(out)
        print(f"wrote {out}")
    except ImportError:
        print(f"dashboard frame rendered: {frame.shape} (PIL not installed)")


if __name__ == "__main__":
    main()
