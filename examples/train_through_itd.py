"""Train THROUGH the decomposition: gradients across ``itd_sift``.

The sift is differentiable end to end — its custom VJP runs a
hand-written structural adjoint per level (562 ms for the full backward
at 8x1M on v5e, vs 2.1 s for AD of the fill scans), so models can learn
parameters UPSTREAM of the decomposition.  This demo learns a 9-tap FIR
pre-filter that makes the sift's first proper rotation match a known
band: the gradient flows through the full multi-level sift into the
filter taps.

Run on the local CPU backend:

    python tools/run_cpu.py examples/train_through_itd.py
"""
import numpy as np

import jax
import jax.numpy as jnp
import optax

from pyitd_tpu import itd_sift


def main():
    rng = np.random.default_rng(0)
    n, batch = 512, 4
    t = np.linspace(0, 4 * np.pi, n)
    hi = np.stack([np.sin((40 + 3 * k) * t) for k in range(batch)])
    lo = np.stack([np.sin((3 + k) * t) for k in range(batch)])
    noise = 0.35 * rng.normal(size=(batch, n))
    x = jnp.asarray(hi + lo + noise)
    target = jnp.asarray(hi)  # what rotation 0 should isolate

    taps0 = jnp.zeros(9).at[4].set(1.0)  # identity filter

    def prefilter(taps, sig):
        pad = taps.shape[0] // 2
        s = jnp.pad(sig, ((0, 0), (pad, pad)), mode="edge")
        windows = jnp.stack(
            [s[:, i : i + sig.shape[1]] for i in range(taps.shape[0])],
            axis=-1)
        return windows @ taps

    def loss_fn(taps):
        y = prefilter(taps, x)
        res = itd_sift(y, 6, store_baselines=False)
        return jnp.mean(jnp.square(res.rotations[0] - target))

    opt = optax.adam(3e-2)
    state = opt.init(taps0)
    taps = taps0

    @jax.jit
    def _step(taps, state):
        loss, g = jax.value_and_grad(loss_fn)(taps)
        updates, state = opt.update(g, state)
        return optax.apply_updates(taps, updates), state, loss

    loss0 = float(loss_fn(taps0))
    for i in range(60):
        taps, state, loss = _step(taps, state)
        if i % 10 == 0:
            print(f"step {i:3d}  loss {float(loss):.5f}")
    loss1 = float(loss_fn(taps))
    print(f"loss: {loss0:.5f} -> {loss1:.5f} "
          f"({'improved' if loss1 < loss0 * 0.8 else 'NO IMPROVEMENT'})")
    print("learned taps:", np.round(np.asarray(taps), 3))
    assert loss1 < loss0 * 0.8, "training through the sift failed"


if __name__ == "__main__":
    main()
