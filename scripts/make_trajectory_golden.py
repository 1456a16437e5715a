"""Generate N-step TRAINING-TRAJECTORY goldens from the reference's
optimizer/scheduler stack (VERDICT r4 #4).

The layer/model goldens pin forwards, losses, grads, and decodes at
single points; nothing pins an optimizer *trajectory* — a scheduler
off-by-one or an eps-placement mismatch would pass every existing
golden and still diverge training. This script runs the reference's
exact optimization semantics for 10 steps on a fixed tiny problem and
records the loss sequence + final parameters + per-step LRs:

- torch.optim.Adam with the reference's VLGAE hyperparameters
  (lr 1e-3, betas (0.9, 0.999), weight_decay 0, eps 1e-12 — ref:
  config/model/optimize/constant.yaml / linear.yaml);
- regex param groups with first-match-wins + default fallback,
  anchored ``re.match`` over ``named_parameters()`` (ref:
  src/pipeline.py:176-204);
- ``get_exponential_lr_scheduler`` with the string-eval'd gamma,
  stepped per optimizer step (ref: src/utility/scheduler.py:19-24 +
  config interval: step);
- ``get_linear_schedule_with_warmup`` with the "N epoch" -> N *
  n_batches resolution (ref: src/pipeline.py:88-99 +
  scheduler.py imports);
- ``ReduceLROnPlateau`` stepped per epoch on a fixed monitor sequence
  (ref: scheduler.py:27-28).

The model is a deliberately tiny 2-layer MLP whose parameter names
reproduce the reference's group-pattern surface
(``dependency.embedding.transformer.*`` vs the default group). All
init tensors and data are exported so the JAX side can start from the
identical state. Output: tests/golden/trajectory_ref.npz, consumed by
tests/test_trajectory_golden.py.

Usage: python scripts/make_trajectory_golden.py
"""

from __future__ import annotations

import os
import re

import numpy as np
import torch
import torch.nn as nn

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")
os.makedirs(OUT, exist_ok=True)

STEPS = 10
N_BATCHES = 3  # "steps per epoch" for the ' epoch' resolution scenarios


def make_data():
    rng = np.random.default_rng(42)
    x = rng.standard_normal((16, 4)).astype(np.float32)
    w_true = rng.standard_normal((4, 1)).astype(np.float32)
    y = (np.tanh(x) @ w_true + 0.1
         * rng.standard_normal((16, 1))).astype(np.float32)
    init = {
        "dependency.embedding.transformer.weight":
            (rng.standard_normal((8, 4)) * 0.4).astype(np.float32),
        "dependency.embedding.transformer.bias":
            np.zeros((8,), np.float32),
        "head.weight": (rng.standard_normal((1, 8)) * 0.4).astype(
            np.float32),
        "head.bias": np.zeros((1,), np.float32),
    }
    return x, y, init


class Tiny(nn.Module):
    """Names match the reference's group-pattern surface."""

    def __init__(self, init):
        super().__init__()
        emb = nn.Module()
        emb.transformer = nn.Linear(4, 8)
        dep = nn.Module()
        dep.embedding = emb
        self.dependency = dep
        self.head = nn.Linear(8, 1)
        with torch.no_grad():
            for name, p in self.named_parameters():
                p.copy_(torch.from_numpy(init[name]))

    def forward(self, x):
        return self.head(torch.tanh(
            self.dependency.embedding.transformer(x)))


def group_params(model, groups):
    """The reference's configure_optimizers group loop
    (ref: src/pipeline.py:176-204): anchored re.match over
    named_parameters, first match wins, fallback default group."""
    params = [[] for _ in groups]
    default = []
    for name, p in model.named_parameters():
        matches = [i for i, g in enumerate(groups)
                   if re.match(g["pattern"], name)]
        if matches:
            params[matches[0]].append(p)
        else:
            default.append(p)
    out = [
        {"params": p, **{k: v for k, v in groups[i].items()
                         if k != "pattern"}}
        for i, p in enumerate(params) if p
    ]
    out.append({"params": default})
    return out


ADAM_KW = dict(lr=1e-3, betas=(0.9, 0.999), weight_decay=0.0, eps=1e-12)


def run(scenario, x, y, init):
    torch.manual_seed(0)
    model = Tiny(init)
    xt, yt = torch.from_numpy(x), torch.from_numpy(y)

    groups = scenario.get("groups") or []
    if groups:
        opt = torch.optim.Adam(group_params(model, groups), **ADAM_KW)
    else:
        opt = torch.optim.Adam(model.parameters(), **ADAM_KW)

    sched = None
    plateau = None
    s = scenario.get("scheduler")
    if s == "exp":
        # ref: scheduler.py:19-24 — string gamma is eval'd
        gamma = eval("0.75**(1/20)")
        sched = torch.optim.lr_scheduler.ExponentialLR(opt, gamma=gamma)
    elif s == "warmup":
        from transformers import get_linear_schedule_with_warmup

        # ref: pipeline.py:88-99 — "N epoch" -> N * n_batches
        warm = int("2 epoch".split()[0]) * N_BATCHES
        total = int("10 epoch".split()[0]) * N_BATCHES
        sched = get_linear_schedule_with_warmup(opt, warm, total)
    elif s == "plateau":
        plateau = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="min", factor=0.5, patience=1)

    losses, lrs = [], []
    monitor = scenario.get("monitor", [])
    for step in range(STEPS):
        lrs.append(opt.param_groups[0]["lr"])
        opt.zero_grad()
        loss = torch.mean((model(xt) - yt) ** 2)
        loss.backward()
        losses.append(float(loss))
        opt.step()
        if sched is not None:
            sched.step()  # interval: step (ref: optimize/linear.yaml)
        if plateau is not None and (step + 1) % 2 == 0:
            # epoch boundary every 2 steps: plateau monitors val loss
            plateau.step(monitor[(step + 1) // 2 - 1])
    final = {
        f"final.{name}": p.detach().numpy()
        for name, p in model.named_parameters()
    }
    return losses, lrs, final


def main():
    x, y, init = make_data()
    scenarios = {
        "plain": {},
        "exp": {"scheduler": "exp"},
        "groups": {"groups": [
            {"pattern": "dependency.embedding.transformer", "lr": 1e-5},
        ]},
        "warmup": {"scheduler": "warmup"},
        "plateau": {"scheduler": "plateau",
                    "monitor": [5.0, 5.0, 5.0, 5.0, 5.0]},
    }
    out = {"x": x, "y": y, "steps": np.array(STEPS),
           "n_batches": np.array(N_BATCHES)}
    for k, v in init.items():
        out[f"init.{k}"] = v
    for name, sc in scenarios.items():
        losses, lrs, final = run(sc, x, y, init)
        out[f"{name}.losses"] = np.array(losses, np.float64)
        out[f"{name}.lrs"] = np.array(lrs, np.float64)
        for fk, fv in final.items():
            out[f"{name}.{fk}"] = fv
        print(name, "losses:", [f"{v:.6f}" for v in losses])
        print(name, "lrs:", [f"{v:.3e}" for v in lrs])
    np.savez(os.path.join(OUT, "trajectory_ref.npz"), **out)
    print("wrote", os.path.join(OUT, "trajectory_ref.npz"))


if __name__ == "__main__":
    main()
