"""Data-parallel mesh utilities (pure DP over ICI).

The reference's only parallelism is PyTorch-Lightning DDP with NCCL
all-reduce (ref: src/__init__.py:93-105, pipeline.py:234-240). The
TPU-native equivalent is a 1-D ``data`` mesh: the batch is sharded over
devices, parameters are replicated, and XLA inserts the psum for the
gradient all-reduce automatically from the sharding annotations.
"""

from .mesh import (
    DEFAULT_MODEL_RULES,
    data_parallel_mesh,
    fsdp_leaf_spec,
    gather_predictions,
    make_parallel_step,
    pad_batch_to_devices,
    replicate,
    shard_batch,
    shard_params,
    sum_across_processes,
    tree_shardings,
)

__all__ = [
    "DEFAULT_MODEL_RULES",
    "fsdp_leaf_spec",
    "shard_params",
    "tree_shardings",
    "data_parallel_mesh",
    "shard_batch",
    "replicate",
    "pad_batch_to_devices",
    "make_parallel_step",
    "sum_across_processes",
    "gather_predictions",
]
