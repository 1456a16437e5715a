"""Metric/event logging: stdout JSON lines + per-run metrics.jsonl.

Replaces the reference's tqdm/color/wandb logging stack
(ref: src/utility/logger.py, pl_callback.py:36-69) with a structured
JSONL stream any dashboard can tail; wandb is attached when the package
is importable.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Optional


def get_logger(name: str = "vlgae") -> logging.Logger:
    logger = logging.getLogger(name)
    if not logger.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(
            "%(asctime)s %(name)s %(levelname)s %(message)s"
        ))
        logger.addHandler(h)
        logger.setLevel(os.environ.get("VLGAE_LOG_LEVEL", "INFO"))
    return logger


class MetricLogger:
    def __init__(self, workdir: Optional[str] = None, use_wandb: bool = False,
                 project: str = "vlgae_tpu", name: Optional[str] = None):
        self.path = (
            os.path.join(workdir, "metrics.jsonl") if workdir else None
        )
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb.init(project=project, name=name)
            except Exception:
                self._wandb = None

    def log(self, metrics: dict, step: Optional[int] = None):
        rec = {"time": time.time(), **metrics}
        if step is not None:
            rec["step"] = step
        line = json.dumps(rec, default=float)
        print(line, flush=True)
        if self.path:
            with open(self.path, "a") as f:
                f.write(line + "\n")
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)
