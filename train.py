"""Training entry point.

CLI-compatible with the reference's hydra app (ref: /root/reference/train.py):

    python train.py exp=vlgae root=/path/to/data trainer.max_epochs=50

Composes configs/ (1:1 with the reference's config tree), builds the
datamodule + model, runs the epoch loop with validation, best-checkpoint
watching, and final test + prediction dump.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _sweep_axes(overrides):
    """Split overrides into fixed ones and hydra-style choice sweeps.

    Hydra's ``-m key=a,b`` sweeps over the comma list
    (ref: /root/reference/train.py:43-48 runs under hydra multirun);
    bracketed/braced/quoted values keep their commas (e.g. coefficient
    schedules ``"[0@0, 0.5@100]"``).
    """
    fixed, axes = [], []
    for ov in overrides:
        key, _, val = ov.partition("=")
        # hydra sweep functions we do NOT implement must fail loudly:
        # comma-splitting `lr=range(1,5)` would silently sweep the two
        # bogus "choices" `range(1` and `5)` (hydra's full sweep syntax:
        # https://hydra.cc/docs/advanced/override_grammar/extended/)
        stripped = val.strip()
        for fn_tok in ("range(", "glob(", "interval(", "shuffle(",
                       "sort(", "tag("):
            if stripped.startswith(fn_tok):
                raise ValueError(
                    f"multirun: hydra sweep function {fn_tok!r} in "
                    f"override {ov!r} is not supported; only comma-list "
                    f"choice sweeps (key=a,b,c) are implemented"
                )
        if ("," in val and val[:1] not in "[{'\""
                and not val.endswith("]")):
            axes.append((key, val.split(",")))
        else:
            fixed.append(ov)
    return fixed, axes


def multirun(overrides):
    """Hydra ``-m`` subset: cartesian choice sweep, numbered run dirs
    under a shared sweep dir, a shared 4-char group id in each run's
    metadata (the reference tags wandb with MULTIRUN_ID,
    ref: train.py:43-48), and one JSONL result line per job."""
    import itertools
    import random
    import string

    fixed, axes = _sweep_axes(overrides)
    prior_group = os.environ.get("MULTIRUN_ID")
    group = prior_group or "".join(
        random.choice(string.ascii_letters + string.digits) for _ in range(4)
    )
    # children see the group id (the reference exports MULTIRUN_ID for
    # wandb tagging); restored after the sweep so a later independent
    # sweep in the same process gets a fresh id
    os.environ["MULTIRUN_ID"] = group
    sweep_dir = os.path.join(
        "outputs", "multirun", time.strftime("%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(sweep_dir, exist_ok=True)
    combos = list(itertools.product(*(v for _, v in axes))) or [()]
    results = []
    try:
        with open(os.path.join(sweep_dir, "results.jsonl"), "w") as rf:
            for job, combo in enumerate(combos):
                job_ovs = fixed + [f"{k}={v}"
                                   for (k, _), v in zip(axes, combo)]
                workdir = os.path.join(sweep_dir, str(job))
                pipe, test = main(job_ovs + [f"workdir={workdir}"])
                with open(os.path.join(workdir, "multirun.json"), "w") as f:
                    json.dump({"group": group, "job": job,
                               "overrides": job_ovs}, f)
                line = {"group": group, "job": job,
                        "overrides": [f"{k}={v}"
                                      for (k, _), v in zip(axes, combo)],
                        "best": pipe.best, "test": test}
                rf.write(json.dumps(line, default=float) + "\n")
                rf.flush()
                results.append(line)
    finally:
        if prior_group is None:
            os.environ.pop("MULTIRUN_ID", None)
    return results


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    if "-m" in overrides or "--multirun" in overrides:
        overrides = [o for o in overrides if o not in ("-m", "--multirun")]
        return multirun(overrides)
    from vlgae_tpu.utils.config import ConfigComposer, resolve

    # hyperparameter-search bridge (the reference's NNICallback
    # equivalent, ref: src/utility/pl_callback.py:295-356): a sweeper
    # injects trial params as JSON overrides via VLGAE_SEARCH_PARAMS and
    # reads the watched metric back from VLGAE_SEARCH_RESULT.
    search_params = os.environ.get("VLGAE_SEARCH_PARAMS")
    if search_params:
        params = json.loads(search_params)
        overrides += [f"{k}={v}" for k, v in params.items()]

    config_dir = os.environ.get(
        "VLGAE_CONFIG_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
    )
    # reuse a previous run's overrides (ref: train.py:50-69)
    pre = []
    for ov in list(overrides):
        if ov.startswith("load_cfg_from_checkpoint="):
            run_dir = ov.split("=", 1)[1]
            saved = os.path.join(run_dir, "overrides.json")
            if os.path.exists(saved):
                with open(saved) as f:
                    pre = json.load(f)
            overrides.remove(ov)
    overrides = pre + overrides

    cfg = resolve(ConfigComposer(config_dir).compose("config_train",
                                                     overrides))

    seed = cfg.get("seed") or 0
    np.random.seed(seed)

    workdir = cfg.get("workdir") or os.path.join(
        "outputs", str(cfg.get("name", "run")), time.strftime("%Y-%m-%d_%H-%M-%S")
    )
    os.makedirs(os.path.join(workdir, "checkpoint"), exist_ok=True)
    with open(os.path.join(workdir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2, default=str)
    with open(os.path.join(workdir, "overrides.json"), "w") as f:
        json.dump(overrides, f)
    latest = os.path.join("outputs", "0_latest_run")
    try:
        if os.path.islink(latest):
            os.unlink(latest)
        os.makedirs("outputs", exist_ok=True)
        os.symlink(os.path.abspath(workdir), latest)
    except OSError:
        pass

    from vlgae_tpu.data import DepDataModule, VLParseDataModule
    from vlgae_tpu.training import Pipeline, build_model

    dm_cfg = dict(cfg["datamodule"])
    target = dm_cfg.pop("_target_", "VLParseDataModule")
    dm_cls = VLParseDataModule if "VLParse" in target else DepDataModule
    dm = dm_cls(**dm_cfg).setup()

    if cfg.get("embedding", {}).get("use_subword"):
        from vlgae_tpu.data.subword import HashSubwordTokenizer, HFTokenizer, attach_subwords

        model_path = (cfg["embedding"].get("transformer", {})
                      .get("args", {}).get("model", ""))
        tok = (HFTokenizer(model_path) if os.path.isdir(str(model_path))
               else HashSubwordTokenizer())
        attach_subwords(dm, tok)

    # persist vocabularies next to the run (ref: datamodule.py:222-224)
    for vname, vocab in dm.vocabs.items():
        vocab.save(os.path.join(workdir, f"vocab_{vname}.txt"))

    model = build_model(cfg, dm)
    pipe = Pipeline(model, dm, cfg, workdir=workdir)
    sample = next(dm.batches("train", shuffle=False))
    pipe.init_state(sample, seed=seed)
    trainer_cfg = cfg.get("trainer", {})

    # warm-start / resume (ref: train.py:76-77 resume vs load_from_checkpoint)
    warm = cfg.get("pipeline", {}).get("load_from_checkpoint")
    resume = trainer_cfg.get("resume_from_checkpoint")
    start_epoch = 0
    if warm:
        pipe.load_checkpoint(warm)  # params only (warm start)
    elif resume:
        # full restore: params + opt_state + RNG + counters + sampler
        pipe.load_checkpoint(resume, load_training_state=True)
        start_epoch = pipe.state.epoch + 1

    max_epochs = int(trainer_cfg.get("max_epochs", 50))
    max_steps = int(trainer_cfg.get("max_steps", -1) or -1)

    from vlgae_tpu.utils.logger import MetricLogger, WandbWatcher

    mlog = MetricLogger(workdir, use_wandb=bool(cfg.get("wandb")),
                        project=str(cfg.get("project", "vlgae_tpu")),
                        name=str(cfg.get("name", "run")),
                        config=cfg)
    if cfg.get("wandb") and cfg.get("watch_model") is not None:
        # gradient/param histogram watching — OPT-IN via a watch_model
        # config block, mirroring the reference's explicit callback
        # (ref: pl_callback.py:36-69 WatchModelWithWandb); it costs an
        # extra backward every log_freq steps
        pipe.watcher = WandbWatcher(**dict(cfg.get("watch_model") or {}))
    pipe.normalize_embeddings("begin")
    min_lr_stop = float(trainer_cfg.get("min_lr_stop", 0.0) or 0.0)
    val_check = float(trainer_cfg.get("val_check_interval", 1.0) or 1.0)

    # optional device profiling (jax.profiler trace into the run dir)
    if cfg.get("profile"):
        import jax

        jax.profiler.start_trace(os.path.join(workdir, "profile"))

    start_patience = int(trainer_cfg.get("start_patience", 0) or 0)

    def run_validation(epoch, mid_epoch=False):
        val, val_out = pipe.evaluate("dev")
        watch = val.get(pipe.watch_field.split("/", 1)[-1], val.get("loss"))
        # only track/save best after start_patience epochs
        # (ref: pl_callback.py:241-251)
        if epoch >= start_patience and pipe.is_better(watch):
            pipe.best = watch
            pipe.save_checkpoint("best")
            pipe.write_predictions(
                os.path.join(workdir, "dev.predict.txt"), "dev", val_out
            )
        if mid_epoch:
            # mid-epoch validations get their own log line so they are
            # not lost when the epoch line reports only the final one;
            # the window's per-term training loss means ride along
            mlog.log({**pipe.window_train_terms,
                      **{f"val/{k}": v for k, v in val.items()},
                      "epoch": epoch, "mid_epoch": True},
                     step=pipe.state.step)
        pipe.plateau_step(watch)
        return val

    for epoch in range(start_epoch, max_epochs):
        pipe.normalize_embeddings("epoch")
        stats = pipe.train_epoch(
            epoch,
            val_fn=lambda e=None: run_validation(epoch, mid_epoch=True),
            val_check_interval=val_check,
        )
        val = run_validation(epoch)
        line = {**stats, **{f"val/{k}": v for k, v in val.items()},
                "epoch": epoch}
        mlog.log(line, step=pipe.state.step)
        pipe.save_checkpoint("last")
        if 0 < max_steps <= pipe.state.step:
            break
        # early stop when the lr schedule decays below the floor
        # (ref: pl_callback.py:152-166)
        if min_lr_stop > 0 and pipe.current_lr() < min_lr_stop:
            print(json.dumps({"early_stop": "lr below min", "epoch": epoch}))
            break

    if cfg.get("profile"):
        import jax

        jax.profiler.stop_trace()

    # final test with the best checkpoint (ref: train.py:88-94)
    best_path = os.path.join(workdir, "checkpoint", "best")
    if os.path.exists(best_path):
        pipe.load_checkpoint(best_path)
    test, test_out = pipe.evaluate("test", metric_idx=1)
    mlog.log({f"test/{k}": v for k, v in test.items()}, step=pipe.state.step)
    pipe.write_predictions(
        os.path.join(workdir, "test.predict.txt"), "test", test_out
    )
    result_path = os.environ.get("VLGAE_SEARCH_RESULT")
    if result_path:
        with open(result_path, "w") as f:
            json.dump({"best": pipe.best, "test": test}, f, default=float)
    return pipe, test


if __name__ == "__main__":
    main()
