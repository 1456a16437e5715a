"""Training: pipeline, optimizers, metrics, model factory."""

from .factory import build_joint, build_ldndmv, build_model
from .metrics import (
    BoxRelMatchingMetric,
    CaptionImageMatchingMetric,
    DependencyParsingMetric,
    FactorImageMatchingMetric,
    MultiMetric,
)
from .optim import ReduceLROnPlateau, build_optimizer, make_schedule
from .pipeline import Pipeline, TrainState

__all__ = [
    "build_model",
    "build_ldndmv",
    "build_joint",
    "Pipeline",
    "TrainState",
    "build_optimizer",
    "make_schedule",
    "ReduceLROnPlateau",
    "DependencyParsingMetric",
    "BoxRelMatchingMetric",
    "FactorImageMatchingMetric",
    "CaptionImageMatchingMetric",
    "MultiMetric",
]
