"""Mesh-parallel programs (SURVEY.md §2.5 — all new capability).

* ``batch``    — data-parallel sift / streaming channel banks (shard_map)
* ``sharded``  — sequence-parallel sift + distributed cubic (time axis)
* ``train``    — dp x tp/ep training for the flax model family (GSPMD rules)
* ``pipeline`` — GPipe microbatch pipeline over a 'pp' mesh axis
"""
from .batch import pjit_itd_sift, shard_bank, sharded_streaming_itd
from .pipeline import gpipe_apply, stack_stage_params
from .sharded import (
    make_mesh,
    sharded_cubic_baseline,
    sharded_itd_sift,
)
from .train import (
    MOE_EP_RULES,
    PARSEVAL_TP_RULES,
    make_tp_mesh,
    make_train_step,
    param_specs,
    shard_batch,
    shard_params,
)

__all__ = [
    "pjit_itd_sift",
    "shard_bank",
    "sharded_streaming_itd",
    "make_mesh",
    "sharded_itd_sift",
    "sharded_cubic_baseline",
    "make_tp_mesh",
    "make_train_step",
    "param_specs",
    "shard_params",
    "shard_batch",
    "PARSEVAL_TP_RULES",
    "MOE_EP_RULES",
    "gpipe_apply",
    "stack_stage_params",
]
