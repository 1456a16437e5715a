"""Structured inference core: semirings, chart DPs, distributions."""

from .semirings import (
    NEGINF,
    CrossEntropySemiring,
    EntropySemiring,
    KLDivergenceSemiring,
    KMaxSemiring,
    LogSemiring,
    MaxSemiring,
    RiskSemiring,
    Semiring,
    StdSemiring,
)
from .dmv import (
    GO,
    HASCHILD,
    LEFT,
    NOCHILD,
    RIGHT,
    STOP,
    dmv_inside,
    dmv_marginals,
    dmv_partition,
)
from .deptree import (
    deptree_inside,
    deptree_marginals,
    deptree_nonproj_marginals,
    deptree_nonproj_partition,
    deptree_partition,
)
from .distributions import DMV1o, DependencyCRF, dmv_merge

__all__ = [
    "NEGINF",
    "Semiring",
    "LogSemiring",
    "MaxSemiring",
    "StdSemiring",
    "KMaxSemiring",
    "EntropySemiring",
    "CrossEntropySemiring",
    "KLDivergenceSemiring",
    "RiskSemiring",
    "NOCHILD",
    "HASCHILD",
    "LEFT",
    "RIGHT",
    "GO",
    "STOP",
    "dmv_inside",
    "dmv_partition",
    "dmv_marginals",
    "deptree_inside",
    "deptree_partition",
    "deptree_marginals",
    "deptree_nonproj_partition",
    "deptree_nonproj_marginals",
    "DMV1o",
    "DependencyCRF",
    "dmv_merge",
]
