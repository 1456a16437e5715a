"""N-step training-trajectory parity vs the reference optimizer stack
(VERDICT r4 #4).

`tests/golden/trajectory_ref.npz` (scripts/make_trajectory_golden.py)
holds 10-step loss/LR/final-param trajectories produced by the
reference's exact optimization semantics — torch Adam with the VLGAE
hyperparameters, anchored-regex param groups, string-eval'd exponential
gamma stepped per step, "N epoch"-resolved linear warmup, and
ReduceLROnPlateau (ref: src/pipeline.py:176-227,88-99 +
src/utility/scheduler.py). Here the identical tiny problem is run
through ``training/optim.py``'s optax stack from the identical init:
the loss sequence, the per-step LR sequence, and the final parameters
must all agree to fp tolerance. A scheduler off-by-one or an Adam
eps-placement mismatch fails this test while passing every single-point
golden.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlgae_tpu.training.optim import build_optimizer

GOLDEN = os.path.join(os.path.dirname(__file__), "golden",
                      "trajectory_ref.npz")


@pytest.fixture(scope="module")
def ref():
    return dict(np.load(GOLDEN))


def _params(ref):
    # torch Linear stores [out, in]; flax kernels are [in, out]
    t = "dependency.embedding.transformer"
    return {
        "dependency": {"embedding": {"transformer": {
            "kernel": jnp.asarray(ref[f"init.{t}.weight"].T),
            "bias": jnp.asarray(ref[f"init.{t}.bias"]),
        }}},
        "head": {
            "kernel": jnp.asarray(ref["init.head.weight"].T),
            "bias": jnp.asarray(ref["init.head.bias"]),
        },
    }


def _loss_fn(ref):
    x = jnp.asarray(ref["x"])
    y = jnp.asarray(ref["y"])

    def loss(p):
        h = jnp.tanh(
            x @ p["dependency"]["embedding"]["transformer"]["kernel"]
            + p["dependency"]["embedding"]["transformer"]["bias"]
        )
        pred = h @ p["head"]["kernel"] + p["head"]["bias"]
        return jnp.mean((pred - y) ** 2)

    return jax.jit(jax.value_and_grad(loss))


OPT_ARGS = {"lr": 1e-3, "betas": [0.9, 0.999], "weight_decay": 0.0,
            "eps": 1e-12}


def _run(ref, optimizer_cfg, scheduler_cfg, monitor=None):
    params = _params(ref)
    n_batches = int(ref["n_batches"])
    tx, schedule, plateau = build_optimizer(
        params, optimizer_cfg, scheduler_cfg,
        steps_per_epoch=n_batches,
    )
    opt_state = tx.init(params)
    vg = _loss_fn(ref)
    losses, lrs = [], []
    base_lr = float(optimizer_cfg["args"]["lr"])
    for step in range(int(ref["steps"])):
        lr = base_lr
        if schedule is not None:
            lr = float(schedule(step))
        if plateau is not None:
            lr = base_lr * plateau.scale
        lrs.append(lr)
        loss, grads = vg(params)
        losses.append(float(loss))
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        if plateau is not None and (step + 1) % 2 == 0:
            # epoch boundary every 2 steps, exactly like the golden run;
            # mirror Pipeline.plateau_step's host-side scale push
            scale = plateau.step(monitor[(step + 1) // 2 - 1], base_lr)
            inject = opt_state[-1]
            hp = dict(inject.hyperparams)
            hp["step_size"] = jnp.asarray(scale, jnp.float32)
            opt_state = opt_state[:-1] + (inject._replace(hyperparams=hp),)
    return np.array(losses), np.array(lrs), params


def _check(ref, name, losses, lrs, params):
    np.testing.assert_allclose(
        losses, ref[f"{name}.losses"], rtol=2e-4,
        err_msg=f"{name}: loss trajectory diverged from the reference "
                "optimizer stack",
    )
    np.testing.assert_allclose(
        lrs, ref[f"{name}.lrs"], rtol=1e-6,
        err_msg=f"{name}: per-step LR sequence diverged (scheduler "
                "off-by-one?)",
    )
    t = "dependency.embedding.transformer"
    np.testing.assert_allclose(
        np.asarray(params["dependency"]["embedding"]["transformer"]
                   ["kernel"]),
        ref[f"{name}.final.{t}.weight"].T, atol=2e-5,
        err_msg=f"{name}: final params diverged",
    )
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]),
        ref[f"{name}.final.head.weight"].T, atol=2e-5,
    )


def test_trajectory_plain_adam(ref):
    losses, lrs, params = _run(
        ref, {"args": dict(OPT_ARGS)}, None)
    _check(ref, "plain", losses, lrs, params)


def test_trajectory_exponential_per_step(ref):
    sched = {"interval": "step", "frequency": 1, "args": {
        "_target_": "src.utility.scheduler.get_exponential_lr_scheduler",
        "gamma": "0.75**(1/20)",
    }}
    losses, lrs, params = _run(ref, {"args": dict(OPT_ARGS)}, sched)
    _check(ref, "exp", losses, lrs, params)


def test_trajectory_regex_groups(ref):
    cfg = {
        "args": dict(OPT_ARGS),
        "groups": [
            {"pattern": "dependency.embedding.transformer", "lr": 1e-5},
        ],
    }
    losses, lrs, params = _run(ref, cfg, None)
    # the golden's lrs column records the FIRST torch param group (the
    # regex-matched one at 1e-5); our per-step lr probe reports the
    # default group — compare the trajectory + params, pin the group lr
    # by its effect instead
    np.testing.assert_allclose(losses, ref["groups.losses"], rtol=2e-4)
    t = "dependency.embedding.transformer"
    np.testing.assert_allclose(
        np.asarray(params["dependency"]["embedding"]["transformer"]
                   ["kernel"]),
        ref[f"groups.final.{t}.weight"].T, atol=2e-5,
        err_msg="grouped (1e-5) params diverged — regex group routing "
                "or group Adam state is wrong",
    )
    np.testing.assert_allclose(
        np.asarray(params["head"]["kernel"]),
        ref["groups.final.head.weight"].T, atol=2e-5,
        err_msg="default-group (1e-3) params diverged",
    )


def test_trajectory_linear_warmup_epoch_resolution(ref):
    sched = {"interval": "step", "frequency": 1, "args": {
        "_target_": "transformers.get_linear_schedule_with_warmup",
        "num_warmup_steps": "2 epoch",
        "num_training_steps": "10 epoch",
    }}
    losses, lrs, params = _run(ref, {"args": dict(OPT_ARGS)}, sched)
    _check(ref, "warmup", losses, lrs, params)


def test_trajectory_plateau(ref):
    sched = {"interval": "epoch", "frequency": 1, "args": {
        "_target_": "torch.optim.lr_scheduler.ReduceLROnPlateau",
        "mode": "min", "factor": 0.5, "patience": 1,
    }}
    monitor = [float(v) for v in [5.0, 5.0, 5.0, 5.0, 5.0]]
    losses, lrs, params = _run(
        ref, {"args": dict(OPT_ARGS)}, sched, monitor=monitor)
    _check(ref, "plateau", losses, lrs, params)
