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
                 project: str = "vlgae_tpu", name: Optional[str] = None,
                 config: Optional[dict] = None):
        self.path = (
            os.path.join(workdir, "metrics.jsonl") if workdir else None
        )
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                # run-config logging (ref: pl_callback.py:54-56 saves the
                # composed config with the run)
                self._wandb = wandb.init(project=project, name=name,
                                         config=config)
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


class WandbWatcher:
    """Gradient/parameter histogram watching, the counterpart of the
    reference's ``WatchModelWithWandb`` callback
    (ref: src/utility/pl_callback.py:36-69). wandb's ``watch`` hooks
    torch modules; here the Pipeline hands the watcher the param tree
    (and, on watch steps, a freshly computed gradient tree) and the
    histograms are built host-side. Silently inert when the wandb
    package is absent or no run is active — JSONL stays the fallback.

    ``log``: 'gradients' | 'parameters' | 'all' | 'none'
    (wandb.watch semantics).
    """

    def __init__(self, log: str = "gradients", log_freq: int = 100):
        self.log_mode = log
        self.log_freq = max(1, int(log_freq))
        try:
            import wandb

            self._wandb = wandb
        except Exception:
            self._wandb = None

    @property
    def active(self) -> bool:
        return (
            self._wandb is not None
            and getattr(self._wandb, "run", None) is not None
            and self.log_mode != "none"
        )

    def should_log(self, step: int) -> bool:
        return self.active and step % self.log_freq == 0

    @property
    def wants_gradients(self) -> bool:
        return self.log_mode in ("gradients", "all")

    @property
    def wants_parameters(self) -> bool:
        return self.log_mode in ("parameters", "all")

    def _histograms(self, tree, prefix: str) -> dict:
        import jax
        import numpy as np

        out = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            name = "/".join(
                str(getattr(p, "key", getattr(p, "name", p))) for p in path
            )
            arr = np.asarray(leaf).ravel()
            if arr.size == 0 or not np.issubdtype(arr.dtype, np.floating):
                continue
            out[f"{prefix}/{name}"] = self._wandb.Histogram(arr)
        return out

    def log_trees(self, step: int, params=None, grads=None):
        if not self.active:
            return
        payload = {}
        if params is not None and self.wants_parameters:
            payload.update(self._histograms(params, "parameters"))
        if grads is not None and self.wants_gradients:
            payload.update(self._histograms(grads, "gradients"))
        if payload:
            self._wandb.log(payload, step=step)
