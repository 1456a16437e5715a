"""Optimizers with regex param groups + LR schedules (optax).

Re-designed from the reference's Lightning optimizer plumbing
(ref: src/pipeline.py:176-227, src/utility/scheduler.py): parameter
groups are selected by regex over flattened param paths and realised as
``optax.multi_transform`` labels; schedules support the reference's
string forms (``gamma: "0.75**(1/2000)"``, warmups, ``"N epoch"``
resolution done by the caller).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional

import jax
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return ".".join(parts)


def make_schedule(args: Dict[str, Any], base_lr: float,
                  steps_per_epoch: int = 1):
    """Build an optax schedule from reference-style scheduler args."""
    target = args.get("_target_", "")

    def resolve(v):
        if isinstance(v, str) and v.endswith(" epoch"):
            return int(v.split()[0]) * steps_per_epoch
        if isinstance(v, str):
            # e.g. "0.75**(1/2000)" (ref: scheduler.py:19-24)
            return float(eval(v, {"__builtins__": {}}, {}))
        return v

    if "exponential" in target:
        gamma = resolve(args["gamma"])
        return lambda step: base_lr * gamma ** step
    if "linear_schedule_with_warmup" in target or "linear" in target:
        warmup = int(resolve(args.get("num_warmup_steps", 0)))
        total = int(resolve(args.get("num_training_steps", 10 ** 9)))
        return optax.schedules.linear_schedule(
            0.0, base_lr, warmup
        ) if total <= warmup else optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, base_lr, warmup),
                optax.schedules.linear_schedule(
                    base_lr, 0.0, max(total - warmup, 1)
                ),
            ],
            [warmup],
        )
    if "constant_schedule_with_warmup" in target:
        warmup = int(resolve(args.get("num_warmup_steps", 0)))
        return optax.schedules.join_schedules(
            [
                optax.schedules.linear_schedule(0.0, base_lr, warmup),
                optax.schedules.constant_schedule(base_lr),
            ],
            [warmup],
        )
    return optax.schedules.constant_schedule(base_lr)


def build_optimizer(params, optimizer_cfg: Dict[str, Any],
                    scheduler_cfg: Optional[Dict[str, Any]] = None,
                    steps_per_epoch: int = 1,
                    gradient_clip_val: float = 0.0,
                    frozen_patterns: Optional[List[str]] = None):
    """Adam with regex groups (ref: pipeline.py:176-204).

    Returns (optax transform, schedule_fn or None, plateau or None).
    ``frozen_patterns`` zeroes updates for matching params (the JAX
    counterpart of ``requires_grad=False``). When the scheduler config
    targets ``ReduceLROnPlateau`` (ref: scheduler.py:27-28), an
    ``inject_hyperparams(scale)`` stage is appended whose ``step_size``
    the host updates from the returned :class:`ReduceLROnPlateau` after
    each validation.
    """
    args = dict(optimizer_cfg.get("args", {"lr": 1e-3}))
    args.pop("_target_", None)
    base_lr = float(args.pop("lr", 1e-3))
    betas = args.pop("betas", (0.9, 0.999))
    eps = float(args.pop("eps", 1e-12))
    wd = float(args.pop("weight_decay", 0.0))

    schedule = None
    plateau = None
    if scheduler_cfg:
        sched_args = dict(scheduler_cfg.get("args", {}))
        target = str(sched_args.get("_target_", ""))
        if "ReduceLROnPlateau" in target or "plateau" in target.lower():
            sched_args.pop("_target_", None)
            plateau = ReduceLROnPlateau(**{
                k: v for k, v in sched_args.items()
                if k in ("mode", "factor", "patience", "min_lr")
            })
        else:
            schedule = make_schedule(sched_args, base_lr, steps_per_epoch)

    def adam(lr):
        tx = optax.adamw(
            lr, b1=float(betas[0]), b2=float(betas[1]), eps=eps,
            weight_decay=wd,
        ) if wd > 0 else optax.adam(
            lr, b1=float(betas[0]), b2=float(betas[1]), eps=eps
        )
        return tx

    groups = list(optimizer_cfg.get("groups") or [])
    frozen_patterns = list(frozen_patterns or [])

    if not groups and not frozen_patterns:
        tx = adam(schedule if schedule is not None else base_lr)
    else:
        transforms = {"__default__": adam(
            schedule if schedule is not None else base_lr
        )}
        for i, g in enumerate(groups):
            g_lr = float(g.get("lr", base_lr))
            g_sched = (
                make_schedule(scheduler_cfg.get("args", {}), g_lr,
                              steps_per_epoch)
                if scheduler_cfg else g_lr
            )
            transforms[f"group{i}"] = adam(g_sched)
        transforms["__frozen__"] = optax.set_to_zero()

        def label_fn(tree):
            def label(path, _):
                name = _path_str(path)
                for pat in frozen_patterns:
                    if re.search(pat, name):
                        return "__frozen__"
                for i, g in enumerate(groups):
                    if re.search(g["pattern"], name):
                        return f"group{i}"
                return "__default__"

            return jax.tree_util.tree_map_with_path(label, tree)

        tx = optax.multi_transform(transforms, label_fn)

    if gradient_clip_val and gradient_clip_val > 0:
        tx = optax.chain(optax.clip_by_global_norm(gradient_clip_val), tx)
    if plateau is not None:
        # final LR-scale stage; its step_size lives in the opt_state so
        # the host can update it between epochs without re-jitting
        tx = optax.chain(tx, optax.inject_hyperparams(optax.scale)(
            step_size=1.0
        ))
    return tx, schedule, plateau


class ReduceLROnPlateau:
    """Host-side plateau LR scaling (ref: scheduler.py:27-28).

    Tracks a metric and exposes a multiplicative ``scale`` the train step
    multiplies into the learning rate.
    """

    def __init__(self, mode="min", factor=0.5, patience=2, min_lr=0.0):
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = None
        self.bad = 0
        self.scale = 1.0

    def step(self, value: float, base_lr: float) -> float:
        better = (
            self.best is None
            or (value < self.best if self.mode == "min" else value > self.best)
        )
        if better:
            self.best = value
            self.bad = 0
        else:
            self.bad += 1
            if self.bad > self.patience:
                self.scale = max(
                    self.scale * self.factor, self.min_lr / max(base_lr, 1e-30)
                )
                self.bad = 0
        return self.scale
