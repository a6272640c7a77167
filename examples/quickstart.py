"""pyitd_tpu quickstart — the reference repository's demos, as a script.

Reproduces the canonical validation convention of every PyITD notebook:
run a decomposition, then check the exact-reconstruction invariant
``|sum(components) - input|`` (compensated summation).  Runs anywhere jax
runs; on TPU the same calls dispatch the Pallas fast paths.

    python examples/quickstart.py
"""
import os
import sys

import numpy as np
import jax.numpy as jnp

# allow running from a source checkout without installing the package
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyitd_tpu import ITD, itd_sift, neumaier_sum  # noqa: E402


def demo_itd():
    """Canonical ITD on the reference demo chirp (ITD.py:491-508)."""
    t = np.linspace(0, 2 * np.pi, 400)
    s = np.sin(20 * t * (1 + 0.2 * t)) + t**2 + np.sin(13 * t)

    itd = ITD()
    rotations = np.asarray(itd(s))
    err = abs(np.asarray(neumaier_sum(jnp.asarray(rotations), 0)) - s).max()
    print(f"ITD: {rotations.shape[0]} components, recon err {err:.3e}")

    # batched + jitted: one compile, a whole signal bank
    bank = jnp.asarray(np.tile(s, (16, 1)))
    res = itd_sift(bank, 8, store_baselines=False)
    print(f"itd_sift bank: rotations {res.rotations.shape}, "
          f"components per row {int(res.num_components[0])}")


def demo_xitd():
    """Entropy-sorted ensemble decomposition (MEITD.py:536-549)."""
    from pyitd_tpu.decomp.meitd import xitd

    rng = np.random.default_rng(0)
    t = np.linspace(0, 2 * np.pi, 512)
    s = np.sin(6 * t) + 0.3 * rng.normal(size=t.size)
    comps = np.asarray(xitd(s))
    err = abs(comps.sum(0) - s).max()
    print(f"XITD: {comps.shape[0]} WPE-sorted components, recon err {err:.3e}")


def demo_efd():
    """Empirical Fourier Decomposition of three cosines (EFD.ipynb)."""
    from pyitd_tpu.decomp.efd import efd

    t = np.arange(1024) / 1024
    s = (np.cos(2 * np.pi * 5 * t) + 0.5 * np.cos(2 * np.pi * 40 * t)
         + 0.25 * np.cos(2 * np.pi * 120 * t))
    res = efd(jnp.asarray(s), 3)
    bands = np.asarray(res.bands)[: int(res.count)]
    err = abs(np.asarray(res.bands).sum(0) - s).max()
    print(f"EFD: {bands.shape[0]} bands, recon err {err:.3e}")


def demo_fabada():
    """Bayesian denoising (PFABADA.ipynb)."""
    from pyitd_tpu.decomp.fabada import fabada

    rng = np.random.default_rng(1)
    t = np.linspace(0, 1, 512)
    clean = np.sin(2 * np.pi * 3 * t) * (1 - t)
    sigma = 0.2
    noisy = clean + sigma * rng.normal(size=t.size)
    den = np.asarray(fabada(jnp.asarray(noisy), sigma**2))

    def psnr(a):
        return 10 * np.log10(np.ptp(clean) ** 2 / np.mean((a - clean) ** 2))

    print(f"FABADA: PSNR {psnr(noisy):.1f} dB -> {psnr(den):.1f} dB")


if __name__ == "__main__":
    demo_itd()
    demo_xitd()
    demo_efd()
    demo_fabada()
