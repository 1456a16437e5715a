"""Utility functions: schedules, loss reduction, misc.

Re-designed from the reference grab-bag (ref: src/utility/fn.py).
"""

from __future__ import annotations

import re
from typing import Callable, Iterator, List, Optional

import numpy as np


def reduce_loss(loss, num_token, batch_size, mode: str = "token"):
    """Loss normalization modes (ref: fn.py:50-67)."""
    if mode == "token":
        return loss / num_token
    if mode == "batch":
        return loss / batch_size
    if mode == "sum":
        return loss
    raise ValueError(mode)


_COEFF_ITEM = re.compile(r"\s*([-+0-9.eE]+)\s*@\s*(\d+)\s*")


def parse_coeff_schedule(command) -> List[tuple]:
    """Parse piecewise-linear schedules like ``"[0@0, 0.5@100]"``
    (ref: fn.py:84-122). Plain numbers become constants."""
    if isinstance(command, (int, float)):
        return [(float(command), 0)]
    s = str(command).strip()
    if not s.startswith("["):
        return [(float(s), 0)]
    points = []
    for item in s.strip("[]").split(","):
        m = _COEFF_ITEM.fullmatch(item)
        if not m:
            raise ValueError(f"bad coeff item: {item!r}")
        points.append((float(m.group(1)), int(m.group(2))))
    assert all(
        p0[1] < p1[1] for p0, p1 in zip(points, points[1:])
    ), "schedule epochs must increase"
    return points


def coeff_at(points: List[tuple], idx: int) -> float:
    """Evaluate a piecewise-linear schedule at ``idx``."""
    if idx <= points[0][1]:
        return points[0][0]
    for (v0, e0), (v1, e1) in zip(points, points[1:]):
        if idx <= e1:
            t = (idx - e0) / (e1 - e0)
            return v0 + t * (v1 - v0)
    return points[-1][0]


def get_coeff_iter(command, idx_getter: Optional[Callable[[], int]] = None
                   ) -> Iterator[float]:
    """Iterator form matching the reference API (ref: fn.py:84-122)."""
    points = parse_coeff_schedule(command)
    counter = iter(range(10 ** 12))

    while True:
        idx = idx_getter() if idx_getter is not None else next(counter)
        yield coeff_at(points, idx)


def pad_lists(seqs, pad_value=0, total_length=None, dtype=np.int64):
    """Pad a list of 1-D lists into a matrix (ref: fn.py:132-140)."""
    n = total_length or max(len(s) for s in seqs)
    out = np.full((len(seqs), n), pad_value, dtype)
    for i, s in enumerate(seqs):
        out[i, : len(s)] = s
    return out


def merge_outputs(outputs_per_rank: List[dict]) -> dict:
    """Merge predictions gathered from multiple hosts, keyed by sample id
    (ref: fn.py:166-175)."""
    merged: dict = {}
    for rank_out in outputs_per_rank:
        for key, id2val in rank_out.items():
            merged.setdefault(key, {}).update(id2val)
    return merged


def endless_iter(iterable_factory):
    while True:
        yield from iterable_factory()
