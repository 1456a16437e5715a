"""Pallas TPU kernels and backend dispatch for the chart DPs."""

import os

import jax

from .dmv_pallas import (
    data_parallel_degree,
    dmv_max_pallas,
    dmv_max_pallas_interpret,
    dmv_partition_pallas,
    dmv_partition_pallas_interpret,
    set_data_parallel_mesh,
)
from .match_pallas import match_maxes_pallas
from .topk import exact_top_k


def pallas_available() -> bool:
    """True when running on a real TPU backend (kernels compile natively)."""
    if os.environ.get("VLGAE_DISABLE_PALLAS", "0") == "1":
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing
        return False


__all__ = [
    "dmv_partition_pallas",
    "dmv_max_pallas",
    "dmv_partition_pallas_interpret",
    "dmv_max_pallas_interpret",
    "data_parallel_degree",
    "exact_top_k",
    "match_maxes_pallas",
    "pallas_available",
    "set_data_parallel_mesh",
]
