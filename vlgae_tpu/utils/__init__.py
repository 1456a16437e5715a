"""Utilities: config composition, schedules, logging."""

from .config import Config, ConfigComposer, instantiate, register_resolver, resolve
from .fn import (
    coeff_at,
    get_coeff_iter,
    merge_outputs,
    pad_lists,
    parse_coeff_schedule,
    reduce_loss,
)

__all__ = [
    "Config",
    "ConfigComposer",
    "instantiate",
    "resolve",
    "register_resolver",
    "parse_coeff_schedule",
    "coeff_at",
    "get_coeff_iter",
    "reduce_loss",
    "pad_lists",
    "merge_outputs",
]
