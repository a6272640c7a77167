"""pyitd_tpu — a TPU-native signal-decomposition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
falseywinchnet/PyITD: Intrinsic Time-Scale Decomposition and its ensemble,
spectral, variational, and Bayesian-denoising siblings, expressed as
fixed-shape masked kernels that jit, vmap over signal banks, and shard over
device meshes; plus the native real-time tier (C++) and the adjacent ML
components.  See SURVEY.md at the repo root for the capability map.

Public surface:

* canonical ITD: :class:`ITD`, :func:`itd_sift`
* cubic tiers: ``ops.cubic_baseline``; ensemble: :func:`meitd`,
  :func:`xitd`; entropy: :func:`weighted_permutation_entropy`
* spectral: :func:`efd` (+ modified EFD), ``decomp.itd_fourier``,
  :func:`svmd`
* denoising: :func:`fabada`, :func:`pfabada`, :func:`auto_sigma`
* transforms: ``decomp.stirft``, ``decomp.lindeberg``, ``decomp.trend``
* 2-D: ``decomp.itd2d``, ``decomp.serial2d``
* streaming: ``decomp.streaming`` (JAX), :mod:`pyitd_tpu.runtime` (native)
* scaling: ``parallel.sharded`` (sequence-parallel sift)
* ML: ``ml.optimizers`` (wolf/phoenix), ``ml.layers`` (ITDLinear...),
  ``ml.parseval`` (wavelet-attention GPT), ``ml.activations``
"""
from .decomp.itd import ITD, itd_sift, SiftResult, STOP_FLAT, STOP_BUDGET
from .decomp.meitd import meitd, xitd
from .decomp.meitd_jit import meitd_jit, meitd_jit_bank
from .decomp.ensemble import meitd_ensemble, EnsembleResult
from .decomp.efd import efd, efd_real, iterative_efd, efd_slice_max, iterative_max
from .decomp.itd_fourier import itd_sine_sift, itd_fourier_decomposition
from .decomp.svmd import svmd
from .decomp.fabada import fabada, pfabada, auto_sigma, psnr
from .decomp.itd2d import totalextract2d, crossways_baseline, mad
from .decomp.serial2d import sconcatenate, sdeconcatenate
from .decomp.stirft import stirft, istirft, compute_synthesis_window
from .decomp.lindeberg import time_causal_stft
from .decomp.trend import decompose_signal, custom_filter_engine
from .decomp.streaming import (
    streaming_itd, streaming_step, streaming_init,
    iq_baseline_extract, streaming_itd_iq, streaming_step_iq, iq_extrema_mask,
)
from .ops.extrema import extrema_mask, extrema_masks, count_extrema
from .ops.linear_baseline import linear_baseline_extract
from .ops.cubic_baseline import cubic_baseline_extract, template_fast_baseline
from .ops.wpe import weighted_permutation_entropy
from .utils.summation import neumaier_sum, reconstruction_error
from .utils.stats import fingerprint, sorted_median_index

__version__ = "0.1.0"

__all__ = [
    "ITD", "itd_sift", "SiftResult", "STOP_FLAT", "STOP_BUDGET",
    "meitd", "xitd", "meitd_jit", "meitd_jit_bank",
    "meitd_ensemble", "EnsembleResult",
    "efd", "efd_real", "iterative_efd", "efd_slice_max", "iterative_max",
    "itd_sine_sift", "itd_fourier_decomposition",
    "svmd",
    "fabada", "pfabada", "auto_sigma", "psnr",
    "totalextract2d", "crossways_baseline", "mad",
    "sconcatenate", "sdeconcatenate",
    "stirft", "istirft", "compute_synthesis_window",
    "time_causal_stft",
    "decompose_signal", "custom_filter_engine",
    "streaming_itd", "streaming_step", "streaming_init",
    "iq_baseline_extract", "streaming_itd_iq", "streaming_step_iq",
    "iq_extrema_mask",
    "extrema_mask", "extrema_masks", "count_extrema",
    "linear_baseline_extract", "cubic_baseline_extract", "template_fast_baseline",
    "weighted_permutation_entropy",
    "neumaier_sum", "reconstruction_error",
    "fingerprint", "sorted_median_index",
]
