"""pyitd_tpu — a TPU-native signal-decomposition framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
falseywinchnet/PyITD: Intrinsic Time-Scale Decomposition and its ensemble,
spectral, variational, and Bayesian-denoising siblings, expressed as
fixed-shape masked kernels that jit, vmap over signal banks, and shard over
device meshes.  See SURVEY.md at the repo root for the capability map.
"""
from .decomp.itd import ITD, itd_sift, SiftResult, STOP_FLAT, STOP_BUDGET
from .ops.extrema import extrema_mask, extrema_masks, count_extrema
from .ops.linear_baseline import linear_baseline_extract
from .utils.summation import neumaier_sum, reconstruction_error

__version__ = "0.1.0"

__all__ = [
    "ITD",
    "itd_sift",
    "SiftResult",
    "STOP_FLAT",
    "STOP_BUDGET",
    "extrema_mask",
    "extrema_masks",
    "count_extrema",
    "linear_baseline_extract",
    "neumaier_sum",
    "reconstruction_error",
]
