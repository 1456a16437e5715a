"""Training pipeline: jitted train/eval steps, epochs, checkpointing.

Re-designed from the reference Lightning pipeline (ref: src/pipeline.py)
and callbacks (ref: src/utility/pl_callback.py): the epoch/step loop is
explicit; train/eval steps are pure jitted functions compiled once per
(batch, length) bucket shape; the best-watcher, early LR stop, and
prediction writing are host-side.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import traverse_util

from ..data.conll import write_conll_rows
from ..models import (
    dmv_model,
    ldndmv_decode,
    loss_init_rules,
    loss_nll,
)
from ..parallel import (
    DEFAULT_MODEL_RULES,
    data_parallel_mesh,
    gather_predictions,
    pad_batch_to_devices,
    replicate,
    shard_batch,
    shard_params,
    sum_across_processes,
    tree_shardings,
)
from jax.sharding import NamedSharding, PartitionSpec
from ..utils.fn import coeff_at, parse_coeff_schedule, reduce_loss
from .metrics import (
    BoxRelMatchingMetric,
    DependencyParsingMetric,
    FactorImageMatchingMetric,
    MultiMetric,
)
from .optim import build_optimizer


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: int = 0
    epoch: int = 0
    rng: Any = None


def _progress_bar(it, total, desc, enable=True):
    """ASCII tqdm over training batches (counterpart of the reference's
    MyProgressBar, ref: pl_callback.py:72-149). Falls back to the raw
    iterator when disabled, not a tty, or tqdm is unavailable."""
    if not enable or not sys.stderr.isatty():
        return it
    try:
        from tqdm import tqdm
    except Exception:
        return it
    return tqdm(it, total=total, desc=desc, ascii=True, leave=False)


class Pipeline:
    """Owns model + params + optimizer + metrics (ref: pipeline.py:30-271)."""

    @staticmethod
    def setup_compile_cache(trainer_cfg: Dict[str, Any]) -> Optional[str]:
        """Enable JAX's persistent compilation cache (XLA compiles are
        identical run to run; on remote TPU backends a cold joint-model
        compile costs minutes). ``trainer.compile_cache``: true (default,
        ~/.cache/vlgae_tpu/xla), a path, or false. A cache dir already
        configured by the environment or tests always wins."""
        cache = trainer_cfg.get("compile_cache", True)
        if not cache or jax.config.jax_compilation_cache_dir:
            return None
        path = cache if isinstance(cache, str) else os.path.expanduser(
            "~/.cache/vlgae_tpu/xla"
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        return path

    def __init__(self, model, dm, cfg: Dict[str, Any], workdir: str = ".",
                 devices=None):
        self.setup_compile_cache(cfg.get("trainer", {}) or {})
        self.model = model
        self.dm = dm
        self.cfg = cfg
        self.workdir = workdir
        self.loss_reduction_mode = cfg.get("pipeline", {}).get(
            "loss_reduction_mode", "token"
        )
        self.is_joint = hasattr(model, "dependency")
        self.dep_cfg = model.dep_cfg if self.is_joint else model.cfg
        # ('data', 'model') mesh: batches sharded over 'data', params
        # replicated (or, with trainer.model_parallel > 1, the wide
        # visual/matching projections sharded over 'model'); XLA derives
        # the gradient psum / activation all-reduce over ICI (the
        # reference's DDP/NCCL equivalent, ref: src/__init__.py:93-105)
        mp = int(cfg.get("trainer", {}).get("model_parallel", 1) or 1)
        self.mesh = data_parallel_mesh(devices, model=mp)
        self.n_devices = len(self.mesh.devices.reshape(-1))
        self._register_mesh()
        self._rules = DEFAULT_MODEL_RULES if mp > 1 else ()
        # trainer.fsdp: ZeRO-style full sharding of params + optimizer
        # moments over 'data' (large leaves only; TP rules win). XLA
        # turns the annotations into all-gather-on-use/reduce-scatter.
        self._fsdp = bool(cfg.get("trainer", {}).get("fsdp", False))
        self._fsdp_min = int(
            cfg.get("trainer", {}).get("fsdp_min_size", 1 << 16)
        )
        self._repl = NamedSharding(self.mesh, PartitionSpec())
        self._data = NamedSharding(self.mesh, PartitionSpec("data"))
        # per-leaf param/opt shardings; filled by setup_optimizer
        self._pshard = None
        self._oshard = None
        self.metrics = self._build_metrics()
        self._jit_cache: Dict[Any, Callable] = {}
        self.alpha_schedule = None
        model_cfg = cfg.get("model", {})
        if isinstance(model_cfg.get("grounding_interpolation"), str):
            self.alpha_schedule = parse_coeff_schedule(
                model_cfg["grounding_interpolation"]
            )
        self.state: Optional[TrainState] = None
        self.plateau = None
        emb = getattr(
            model.dependency if self.is_joint else model, "embedding", None
        )
        # per-batch embedding re-whitening (ref: embedding.py:116-119)
        self._batch_normalize = any(
            item.kind == "static" and item.normalize_time == "batch"
            for item in getattr(emb, "items", ())
        )
        self.best = None
        self.watch_field = cfg.get("watch_field", "val/loss")
        self.watch_mode = cfg.get("watch_mode", "min")
        # per-term loss means of the latest mid-epoch training window
        self.window_train_terms: Dict[str, float] = {}
        # optional WandbWatcher (gradient/param histograms,
        # ref: pl_callback.py:36-69); attached by the train CLI
        self.watcher = None

    # -- setup -----------------------------------------------------------
    def _build_metric_node(self, node):
        """Instantiate a metric from a hydra-style config node: resolve
        ``_target_`` to a class in :mod:`.metrics` and recurse into
        sub-metric nodes (ref: config/model/metric/attachment_box_rel.yaml
        + src/utility/metric.py:253-281 MultiMetric). The ``main`` key's
        scores are reported unprefixed (they carry the watch field)."""
        from . import metrics as metrics_mod

        if not isinstance(node, dict) or "_target_" not in node:
            return None
        cls_name = str(node["_target_"]).rsplit(".", 1)[-1]
        cls = getattr(metrics_mod, cls_name, None)
        if cls is None:
            raise ValueError(f"unknown metric _target_: {node['_target_']}")
        if cls is MultiMetric:
            subs = {}
            for k, v in node.items():
                if k == "_target_":
                    continue
                if not (isinstance(v, dict) and "_target_" in v):
                    # same loud-failure contract as the leaf branch: a
                    # stray scalar / sub-node without _target_ is a
                    # config mistake, not something to silently drop
                    raise ValueError(
                        f"MultiMetric sub-node {k!r} is not a metric "
                        f"config (expected a dict with _target_): {v!r}"
                    )
                subs[k] = self._build_metric_node(v)
            return MultiMetric(subs.pop("main", None), **subs)
        # pass scalar config kwargs through so overrides are never
        # silently dropped (an unknown kwarg raises loudly)
        kwargs = {
            k: v for k, v in node.items()
            if k != "_target_" and not isinstance(v, dict)
        }
        return cls(**kwargs)

    def _build_metrics(self):
        """Two independent instances (dev / test) of the configured
        metric set; falls back to the flagship defaults when no metric
        config is given (bare-dict test harnesses)."""
        metric_cfg = self.cfg.get("metric") or {}
        built = self._build_metric_node(metric_cfg)
        if built is not None:
            return [built, self._build_metric_node(metric_cfg)]
        if self.is_joint:
            return [
                MultiMetric(
                    DependencyParsingMetric(),
                    box=BoxRelMatchingMetric(),
                    img=FactorImageMatchingMetric(),
                )
                for _ in range(2)
            ]
        return [DependencyParsingMetric() for _ in range(2)]

    def init_state(self, sample_batch, seed: int = 0):
        self._register_mesh()
        x, y = sample_batch
        inputs = {k: jnp.asarray(v) for k, v in x.items()}
        rng = jax.random.key(seed)
        params = jax.jit(self.model.init)(
            {"params": rng, "dropout": rng, "sample": rng}, inputs
        )
        # pretrained ViT backbone for the CLIP/ViT swap (BASELINE #5):
        # graft checkpoint weights over the random init
        # (vis_encoder.vit_weights -> load_vit_params/graft_vit_params)
        vit_weights = (self.cfg.get("vis_encoder") or {}).get("vit_weights")
        if vit_weights:
            from ..models.vis_encoder import (graft_vit_params,
                                              load_vit_params)

            vis = getattr(self.model, "vis_encoder", None)
            if vis is None or not hasattr(vis, "vit_config"):
                raise ValueError(
                    "vis_encoder.vit_weights is set but the model's "
                    "vis_encoder is not a VisViTPatchEncoder"
                )
            params = graft_vit_params(
                params, load_vit_params(str(vit_weights), vis.vit_config)
            )
        n_batches = max(
            1, len(self.dm.datasets.get("train", [1]))
            // max(self.cfg.get("datamodule", {})
                   .get("train_dataloader", {}).get("batch_size", 32), 1),
        )
        frozen = []
        emb_items = getattr(self.model, "embedding", None)
        # freeze transformer items with requires_grad=False
        emb = (self.model.dependency.embedding if self.is_joint
               else self.model.embedding)
        for item in emb.items:
            if item.kind == "transformer" and not item.requires_grad:
                frozen.append(rf"\b{item.name}\b.*bert")
        # a frozen ViT backbone must be frozen in the OPTIMIZER too, not
        # only stop_gradient'ed: weight decay / non-Adam transforms would
        # otherwise still move pretrained weights on exactly-zero grads
        vis = getattr(self.model, "vis_encoder", None)
        if (vis is not None and hasattr(vis, "vit_config")
                and not vis.requires_grad):
            frozen.append(r"vis_encoder\.vit\b")
        tx, schedule, plateau = build_optimizer(
            params,
            self.cfg.get("optimizer", {"args": {"lr": 1e-3}}),
            self.cfg.get("scheduler"),
            steps_per_epoch=n_batches,
            gradient_clip_val=self.cfg.get("trainer", {}).get(
                "gradient_clip_val", 0.0
            ),
            frozen_patterns=frozen,
        )
        self.tx = tx
        self._schedule = schedule
        self.plateau = plateau
        opt_state = tx.init(params)
        params = shard_params(params, self.mesh, self._rules,
                              fsdp=self._fsdp, fsdp_min_size=self._fsdp_min)
        opt_state = shard_params(opt_state, self.mesh, self._rules,
                                 fsdp=self._fsdp, fsdp_min_size=self._fsdp_min)
        self._pshard = tree_shardings(params)
        self._oshard = tree_shardings(opt_state)
        self.state = TrainState(params, opt_state, 0, 0, rng)
        return self.state

    # -- embedding normalization schedule (ref: embedding.py:116-119,
    #    pipeline.py:86-110) --------------------------------------------------
    def normalize_embeddings(self, when: str):
        from ..models.embedding import normalize_embedding_params

        emb = (self.model.dependency.embedding if self.is_joint
               else self.model.embedding)
        flat = traverse_util.flatten_dict(self.state.params)
        for item in emb.items:
            if item.kind != "static" or item.normalize_time != when:
                continue
            counts = None
            vocab = getattr(self.dm, "vocabs", {}).get(item.field)
            if vocab is not None and getattr(vocab, "word_count", None):
                counts = [
                    vocab.word_count.get(w, 1) for w in vocab.idx2word
                ]
            for path in flat:
                if item.name in path and path[-1] == "embedding":
                    self.state.params = normalize_embedding_params(
                        self.state.params, path, item.normalize_method,
                        counts=counts,
                    )
                    break

    def current_lr(self) -> float:
        base = float(
            self.cfg.get("optimizer", {}).get("args", {}).get("lr", 1e-3)
        )
        sched = getattr(self, "_schedule", None)
        if sched is not None:
            base = float(sched(self.state.step))
        plateau = getattr(self, "plateau", None)
        if plateau is not None:
            base *= plateau.scale
        return base

    def plateau_step(self, value):
        """Feed the watched metric to ReduceLROnPlateau and push the new
        LR scale into the opt_state (ref: scheduler.py:27-28; Lightning
        drives it from the monitored val metric)."""
        plateau = getattr(self, "plateau", None)
        if plateau is None or value is None:
            return
        base_lr = float(
            self.cfg.get("optimizer", {}).get("args", {}).get("lr", 1e-3)
        )
        scale = plateau.step(float(value), base_lr)
        inject = self.state.opt_state[-1]
        hp = dict(inject.hyperparams)
        hp["step_size"] = jnp.asarray(scale, jnp.float32)
        self.state.opt_state = self.state.opt_state[:-1] + (
            inject._replace(hyperparams=hp),
        )

    # -- loss assembly ------------------------------------------------------
    def _alpha(self, epoch: int) -> float:
        if self.alpha_schedule is not None:
            return float(coeff_at(self.alpha_schedule, epoch))
        return float(
            self.cfg.get("model", {}).get("grounding_interpolation", 0.5)
        )

    def _compute_loss(self, params, inputs, gold, rng, init_phase: bool,
                      alpha, train: bool):
        """``alpha`` is a traced device scalar, NOT a Python float baked
        into the compiled step: scheduled coefficients change every epoch
        (ref: base.py:144-164 treats them as runtime values) and keying
        the jit cache on them would recompile every bucket shape every
        epoch."""
        model = self.model
        rngs = {"dropout": rng, "sample": rng}
        out = model.apply(params, inputs, deterministic=not train,
                          rngs=rngs if train else {})
        lengths = inputs["seq_len"]
        weights = (lengths > 0).astype(jnp.float32)
        if init_phase:
            dep_loss, dep_aux = loss_init_rules(out, gold)
        else:
            dep_loss, dep_aux = loss_nll(
                out, lengths, viterbi=self.dep_cfg.viterbi_training
            )
        if self.is_joint and train and not init_phase:
            total, aux = model.apply(
                params, out, gold, inputs, dep_loss, dep_aux, alpha,
                method=model.loss,
            )
        else:
            total, aux = dep_loss, dep_aux
        num_token = jnp.maximum(lengths.sum(), 1)
        n_sent = jnp.maximum(weights.sum(), 1)
        total = reduce_loss(total, num_token, n_sent,
                            self.loss_reduction_mode)
        # per-term telemetry in the same reduction scale as the total
        # (ref: pipeline.py:120-125 logs the loss dict every step)
        aux = {
            k: reduce_loss(v, num_token, n_sent, self.loss_reduction_mode)
            for k, v in aux.items()
        }
        return total, (aux, out)

    # -- steps ----------------------------------------------------------------
    def _get_train_step(self, shape_key, init_phase: bool):
        # keyed on shape + phase ONLY; alpha is a device operand so a
        # scheduled grounding_interpolation never recompiles a bucket
        key = ("train", shape_key, init_phase)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def step(params, opt_state, inputs, gold, rng, alpha):
            def loss_fn(p):
                return self._compute_loss(
                    p, inputs, gold, rng, init_phase, alpha, train=True
                )

            (loss, (aux, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_opt, loss, aux

        # params/opt replicated, batch sharded over 'data': XLA inserts
        # the gradient all-reduce (ref DDP: src/__init__.py:93-105)
        fn = jax.jit(
            step,
            in_shardings=(self._pshard, self._oshard, self._data,
                          self._data, self._repl, self._repl),
            # pin outputs too: with them unspecified GSPMD is free to
            # re-shard returned params, breaking the next call's
            # in_shardings match
            out_shardings=(self._pshard, self._oshard, None, None),
            donate_argnums=(0, 1),
        )
        self._jit_cache[key] = fn
        return fn

    def _get_grad_step(self, shape_key, init_phase: bool):
        """Gradient-only step for accumulate_grad_batches > 1."""
        key = ("grad", shape_key, init_phase)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def step(params, inputs, gold, rng, alpha):
            def loss_fn(p):
                return self._compute_loss(
                    p, inputs, gold, rng, init_phase, alpha, train=True
                )

            (loss, (aux, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            return (loss, aux), grads

        fn = jax.jit(
            step,
            in_shardings=(self._pshard, self._data, self._data,
                          self._repl, self._repl),
            out_shardings=(None, self._pshard),
        )
        self._jit_cache[key] = fn
        return fn

    def _get_apply_step(self):
        key = ("apply",)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def step(params, opt_state, grads, scale):
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), new_opt

        fn = jax.jit(
            step,
            in_shardings=(self._pshard, self._oshard, self._pshard, None),
            out_shardings=(self._pshard, self._oshard),
            donate_argnums=(0, 1, 2),
        )
        self._jit_cache[key] = fn
        return fn

    def _get_eval_step(self, shape_key):
        key = ("eval", shape_key)
        if key in self._jit_cache:
            return self._jit_cache[key]

        def step(params, inputs, gold, alpha):
            out = self.model.apply(params, inputs, deterministic=True)
            lengths = inputs["seq_len"]
            dep_loss, dep_aux = loss_nll(
                out, lengths, viterbi=self.dep_cfg.viterbi_training
            )
            # val/loss watches the FULL model objective — for the joint
            # model the interpolated alpha*grounding + (1-alpha)*dep —
            # exactly what the reference's validation_step computes
            # (ref: src/pipeline.py:133-139, src/model/joint.py:693-711),
            # so best-checkpoint selection and the plateau scheduler see
            # the real training objective, not just the dependency NLL.
            if self.is_joint:
                total, _ = self.model.apply(
                    params, out, gold, inputs, dep_loss, dep_aux, alpha,
                    train=False, method=self.model.loss,
                )
            else:
                total = dep_loss
            heads = ldndmv_decode(
                out, lengths, mbr=self.dep_cfg.mbr_decoding
            )
            result = {"arc": heads, "loss": total}
            if self.is_joint and out.get("match_logit") is not None:
                g = self.model.apply(
                    params, out, inputs,
                    method=self.model.decode_grounding_device,
                )
                result["txt_to_img"] = g["txt_to_img"]
                if "txt_to_factor_idx" in g:  # on_factor mode
                    result["txt_to_factor_idx"] = g["txt_to_factor_idx"]
                    result["txt_mask"] = out["txt_packed"][1]
                    result["vis_split"] = jnp.asarray(out["vis_packed"][2])
            return result

        fn = jax.jit(
            step,
            in_shardings=(self._pshard, self._data, self._data,
                          self._repl),
        )
        self._jit_cache[key] = fn
        return fn

    # -- epoch loops -------------------------------------------------------------
    def _prep_batch(self, x, y, init_phase: bool):
        """Rule-count targets for the init warmup come precomputed from
        the datamodule (cached per instance, see DepDataModule.collate);
        no per-batch host-side generation happens here anymore
        (ref: good_init_nn.py:11-78 computes them via collate padders).
        Kept as a hook + loud guard."""
        if (init_phase and self.dep_cfg.init_method == "y"
                and "dec_rule" not in y):
            raise RuntimeError(
                "init_method='y' warmup needs dec_rule/attach_rule/"
                "root_rule in the batch; set dm.include_init_rules "
                "(Pipeline.train_epoch does this for DepDataModule)"
            )
        return x, y

    def _register_mesh(self):
        """Point the kernel layer's dispatch at THIS pipeline's mesh:
        pallas_calls then shard_map over 'data' (each chip fills only
        its local batch shard) instead of being all-gathered and run
        replicated by GSPMD, and match_kernel='auto' sees the true
        data-parallel degree. The registry is process-global, so it is
        refreshed at the entry of every loop that may (re)trace jitted
        steps — two pipelines with different meshes in one process
        (tests, notebook evals) would otherwise poison each other's
        trace-time dispatch with a foreign mesh."""
        from ..ops import set_data_parallel_mesh

        set_data_parallel_mesh(self.mesh)

    def train_epoch(self, epoch: int, log_every: int = 50,
                    val_fn: Optional[Callable] = None,
                    val_check_interval: float = 1.0):
        """One training epoch; ``val_fn`` is invoked mid-epoch when
        ``val_check_interval`` < 1 (ref: trainer val_check_interval)."""
        self._register_mesh()
        st = self.state
        st.epoch = epoch
        init_phase = (
            epoch < self.dep_cfg.init_epoch
            and self.dep_cfg.init_method == "y"
        )
        split = "train_init" if (
            init_phase and "train_init" in self.dm.datasets
        ) else "train"
        # ask the datamodule's collate for the (cached) warmup rule
        # targets only during init epochs; once the warmup ends, drop
        # the per-instance caches (O(L^2) host arrays per sentence —
        # they would otherwise pin memory for the whole remaining run)
        want_rules = init_phase and self.dep_cfg.init_method == "y"
        if getattr(self.dm, "include_init_rules", False) and not want_rules:
            for ds in getattr(self.dm, "datasets", {}).values():
                for inst in ds:
                    if isinstance(inst, dict):
                        inst.pop("_init_rules", None)
        self.dm.include_init_rules = want_rules
        alpha = jnp.asarray(self._alpha(epoch), jnp.float32)
        # loss/aux accumulate as DEVICE scalars (running sums) and are
        # fetched once per window / epoch: a per-step float()/device_get
        # would block the host on every step and defeat JAX's async
        # dispatch (the host could no longer overlap collate+padding of
        # batch i+1 with device compute of batch i). The progress-bar
        # postfix below doubles as a bounded sync every ``log_every``
        # steps so dispatch can't run unboundedly ahead.
        loss_sum = None  # device scalar
        loss_n = 0
        last_loss = None  # device scalar for the bar postfix
        aux_sums: Dict[str, Any] = {}  # device scalars
        aux_n = 0
        win_sums: Dict[str, Any] = {}  # device scalars
        win_n = 0
        t0 = time.time()
        sampler_len = len(self.dm.sampler(split))
        val_every = (
            max(1, int(sampler_len * val_check_interval))
            if val_fn is not None and 0 < val_check_interval < 1 else None
        )
        fast_dev_run = int(
            self.cfg.get("trainer", {}).get("fast_dev_run", 0) or 0
        )
        accum = int(
            self.cfg.get("trainer", {}).get("accumulate_grad_batches", 1)
            or 1
        )
        pending_grads, pending_n = None, 0
        bar = _progress_bar(self.dm.batches(split), total=sampler_len,
                            desc=f"epoch {epoch}",
                            enable=self.cfg.get("trainer", {})
                                       .get("progress_bar", True))
        for i, (x, y) in enumerate(bar):
            if fast_dev_run and i >= fast_dev_run:
                break
            if val_every and i > 0 and i % val_every == 0:
                # expose the mid-epoch window's per-term loss means so
                # the mid-epoch log line carries them
                self.window_train_terms = {
                    f"train/{k}": float(v) / max(win_n, 1)
                    for k, v in jax.device_get(win_sums).items()
                }
                win_sums, win_n = {}, 0
                val_fn()
            if self._batch_normalize:
                self.normalize_embeddings("batch")
            x, y = self._prep_batch(x, y, init_phase)
            x, _ = pad_batch_to_devices(x, self.n_devices, pow2=True)
            y, _ = pad_batch_to_devices(y, self.n_devices, pow2=True)
            shape_key = tuple(
                (k, v.shape) for k, v in sorted(x.items())
            )
            st.rng, sub = jax.random.split(st.rng)
            inputs = shard_batch(x, self.mesh)
            gold = shard_batch(y, self.mesh)
            aux = None
            if accum <= 1:
                if (self.watcher is not None
                        and self.watcher.should_log(st.step)):
                    # gradients of THIS update, i.e. at the pre-update
                    # params (one extra backward every log_freq steps)
                    wgrads = None
                    if self.watcher.wants_gradients:
                        _, wgrads = self._get_grad_step(
                            shape_key, init_phase
                        )(st.params, inputs, gold, sub, alpha)
                    self.watcher.log_trees(st.step, params=st.params,
                                           grads=wgrads)
                fn = self._get_train_step(shape_key, init_phase)
                st.params, st.opt_state, loss, aux = fn(
                    st.params, st.opt_state, inputs, gold, sub, alpha
                )
                st.step += 1
            else:
                gfn = self._get_grad_step(shape_key, init_phase)
                (loss, aux), grads = gfn(st.params, inputs, gold, sub,
                                         alpha)
                pending_grads = grads if pending_grads is None else (
                    jax.tree_util.tree_map(jnp.add, pending_grads, grads)
                )
                pending_n += 1
                if pending_n == accum:
                    if (self.watcher is not None
                            and self.watcher.should_log(st.step)):
                        # the accumulated mean IS this update's gradient
                        # — reuse it, no extra backward, one log per
                        # optimizer step (not per microbatch)
                        self.watcher.log_trees(
                            st.step, params=st.params,
                            grads=jax.tree_util.tree_map(
                                lambda g: g / pending_n, pending_grads
                            ) if self.watcher.wants_gradients else None,
                        )
                    st.params, st.opt_state = self._get_apply_step()(
                        st.params, st.opt_state, pending_grads,
                        1.0 / pending_n,
                    )
                    pending_grads, pending_n = None, 0
                    st.step += 1
            loss_sum = loss if loss_sum is None else loss_sum + loss
            loss_n += 1
            last_loss = loss
            if aux is not None:
                # per-term loss telemetry (ref: pipeline.py:120-125 logs
                # the detailed loss dict — nll / txt2vis / kl — per
                # step); sums stay on device until the window/epoch read
                for k, v in aux.items():
                    aux_sums[k] = v if k not in aux_sums else aux_sums[k] + v
                    win_sums[k] = v if k not in win_sums else win_sums[k] + v
                aux_n += 1
                win_n += 1
            if hasattr(bar, "set_postfix_str") and (i % log_every == 0):
                # float() here is the loop's only per-step-bounded host
                # sync: it waits for step i, capping dispatch run-ahead
                bar.set_postfix_str(f"loss={float(last_loss):.4f}")
        if pending_grads is not None and pending_n:
            st.params, st.opt_state = self._get_apply_step()(
                st.params, st.opt_state, pending_grads, 1.0 / pending_n
            )
            st.step += 1
        stats = {
            "train/loss": (
                float(loss_sum) / loss_n if loss_n else 0.0
            ),
            "train/time": time.time() - t0,
            "train/init_phase": init_phase,
        }
        for k, v in jax.device_get(aux_sums).items():
            stats[f"train/{k}"] = float(v) / max(aux_n, 1)
        return stats

    def evaluate(self, split: str = "dev", metric_idx: int = 0):
        self._register_mesh()
        metric = self.metrics[metric_idx]
        metric.reset()
        loss_sum, token_sum = 0.0, 0
        all_outputs = {}
        # the epoch's scheduled grounding interpolation, so val/loss is
        # the same interpolated objective training optimizes
        alpha = jnp.asarray(
            self._alpha(self.state.epoch if self.state else 0), jnp.float32
        )
        def consume(res, x, y, real):
            nonlocal loss_sum, token_sum
            res = {k: np.asarray(v) for k, v in res.items()}
            res = {k: v[:real] if (hasattr(v, "shape") and v.ndim > 0
                                   and v.shape[0] >= real and k != "vis_split")
                   else v for k, v in res.items()}
            # epoch loss is reduced over the epoch token count, not an
            # average of per-batch averages (which would weight small
            # final batches equally with full ones; ref reduces over the
            # epoch token count)
            loss_sum += float(res["loss"])
            token_sum += int(x["seq_len"].sum())
            mask = (
                np.arange(x["word"].shape[1])[None, :]
                < np.asarray(x["seq_len"])[:, None]
            )
            predict = {"arc": res["arc"]}
            if "txt_to_factor_idx" in res:
                vis_split = tuple(int(s) for s in res["vis_split"])
                box_index = x.get(
                    "vis_box_index",
                    np.tile(np.arange(vis_split[0])[None],
                            (res["arc"].shape[0], 1)),
                )
                predict["txt_to_factor"] = self.model.format_grounding(
                    res["txt_to_factor_idx"], vis_split,
                    np.asarray(x["seq_len"]), box_index,
                    res["txt_mask"],
                )
                predict["txt_to_img"] = [
                    res["txt_to_img"][j][res["txt_mask"][j]]
                    for j in range(res["arc"].shape[0])
                ]
            elif "txt_to_img" in res:
                # decode_grounding_mode='on_img': per-caption image only
                predict["txt_to_img"] = list(res["txt_to_img"])
            metric.update(predict, y, mask)
            for j, sid in enumerate(np.asarray(x["id"])):
                n = int(x["seq_len"][j])
                rec = {"arc": res["arc"][j, :n].tolist()}
                if "txt_to_factor" in predict:
                    tf = predict["txt_to_factor"][j]
                    rec["txt_to_factor"] = tf
                all_outputs[int(sid)] = rec

        # dispatch-ahead pipelining: keep up to 2 eval steps in flight
        # so device compute (and, on remote backends, the dispatch round
        # trip) overlaps the host-side metric/prediction assembly of
        # earlier batches; consume() is the only point that blocks
        pending: List[tuple] = []
        for x, y in self.dm.batches(split, shuffle=False):
            xp, real = pad_batch_to_devices(x, self.n_devices, pow2=True)
            yp, _ = pad_batch_to_devices(y, self.n_devices, pow2=True)
            shape_key = tuple((k, v.shape) for k, v in sorted(xp.items()))
            fn = self._get_eval_step(shape_key)
            inputs = shard_batch(xp, self.mesh)
            gold = shard_batch(yp, self.mesh)
            pending.append(
                (fn(self.state.params, inputs, gold, alpha), x, y, real)
            )
            if len(pending) > 2:
                consume(*pending.pop(0))
        for entry in pending:
            consume(*entry)
        # multi-host: sum metric states over DCN, merge predictions by
        # sample id (ref: pipeline.py:234-240, metric.py:21-26);
        # identity under the single-controller runtime
        metric.sync(sum_across_processes)
        all_outputs = gather_predictions(all_outputs)
        result = metric.compute()
        result["loss"] = float(
            sum_across_processes(np.array([loss_sum]))[0]
        ) / max(int(sum_across_processes(np.array([token_sum]))[0]), 1)
        return result, all_outputs

    # -- prediction writing (ref: joint.py:719-743, ldndmv.py:307-315) --------
    def write_predictions(self, path: str, split: str, outputs: Dict[int, dict]):
        ds = self.dm.datasets[split]
        tag_vocab = self.dm.vocabs.get("tag")
        # on_img grounding writes an 'X' ALIGN placeholder
        # (ref: joint.py:633-638 format_factor_prediction_on_img)
        on_img = (
            self.is_joint
            and getattr(self.model.cfg, "decode_grounding_mode", "")
            == "on_img"
        )
        word_only = (
            self.is_joint
            and getattr(self.model.cfg, "language_factor_mode", "word")
            == "word"
        )
        with open(path, "w", encoding="utf-8") as f:
            for inst in ds:
                sid = inst["id"]
                rec = outputs.get(sid)
                if rec is None:
                    continue
                n = inst["seq_len"]
                rows = []
                factors = rec.get("txt_to_factor")
                for i in range(n):
                    word = inst["raw_word"][i]
                    tag = inst["tag"][i] if "tag" in inst else "-"
                    head = rec["arc"][i] if i < len(rec["arc"]) else 0
                    row = [i + 1, word, tag, head]
                    if factors is not None:
                        row.append(self._format_factor(factors, i, n))
                    elif on_img:
                        row.append("X" if word_only else "X\tX")
                    rows.append(row)
                write_conll_rows(f, rows)

    @staticmethod
    def _format_factor(factors, idx, length):
        """ALIGN column (ref: joint.py:640-654)."""
        def conv(item):
            t, x = item
            if isinstance(x, tuple):
                return f"{t} {x[0]}-{x[1]}"
            return f"{t} {x}"

        # factors rows are mask-filtered: [words..., word arcs...]
        # (ref: joint.py:640-654)
        if len(factors) > length:
            word_row = factors[idx]
            arc_row = factors[idx + length]
            return "\t".join(
                ["|".join(map(conv, word_row)), "|".join(map(conv, arc_row))]
            )
        return "|".join(map(conv, factors[idx]))

    # -- best watcher (ref: pl_callback.py:169-292) -----------------------------
    def is_better(self, value: float) -> bool:
        if value is None or not math.isfinite(float(value)):
            # NaN guard on the monitored metric (ref: pl_callback.py:252-253)
            return False
        if self.best is None:
            return True
        return value < self.best if self.watch_mode == "min" else value > self.best

    def save_checkpoint(self, name: str = "last",
                        params_only: bool = False):
        """Full-fidelity checkpoint: params + optimizer state + RNG key
        (orbax), with step/epoch/best/plateau in a sidecar json — the
        scope of the reference's Lightning checkpoints
        (ref: pl_callback.py:169-292). ``params_only`` keeps the light
        export format."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.workdir, "checkpoint", name))
        ckptr = ocp.StandardCheckpointer()
        if params_only:
            tree = self.state.params
        else:
            tree = {
                "params": self.state.params,
                "opt_state": self.state.opt_state,
                "rng": jax.random.key_data(self.state.rng),
            }
        ckptr.save(path, tree, force=True)
        ckptr.wait_until_finished()
        meta = {"step": self.state.step, "epoch": self.state.epoch,
                "best": self.best,
                "format": "params" if params_only else "full"}
        plateau = getattr(self, "plateau", None)
        if plateau is not None:
            meta["plateau"] = {"best": plateau.best, "bad": plateau.bad,
                               "scale": plateau.scale}
        with open(os.path.join(self.workdir, "checkpoint", f"{name}.json"),
                  "w") as f:
            json.dump(meta, f)
        return path

    def load_checkpoint(self, path: str, load_training_state: bool = False):
        """Restore params (and, for resume, optimizer state + RNG +
        counters + sampler epoch). Accepts both full and params-only
        checkpoints; warm-starts (``load_from_checkpoint``) take only
        the params from a full checkpoint."""
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        meta = {}
        meta_path = path + ".json"
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
        fmt = meta.get("format", "params")

        ckptr = ocp.StandardCheckpointer()
        host = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
        if fmt == "full":
            target = {
                "params": host(self.state.params),
                "opt_state": host(self.state.opt_state),
                "rng": np.asarray(jax.random.key_data(self.state.rng)),
            }
            restored = ckptr.restore(path, target=target)
            self.state.params = shard_params(
                restored["params"], self.mesh, self._rules,
                fsdp=self._fsdp, fsdp_min_size=self._fsdp_min)
            if load_training_state:
                self.state.opt_state = shard_params(
                    restored["opt_state"], self.mesh, self._rules,
                    fsdp=self._fsdp, fsdp_min_size=self._fsdp_min
                )
                self.state.rng = jax.random.wrap_key_data(
                    jnp.asarray(restored["rng"])
                )
        else:
            target = host(self.state.params)
            restored = ckptr.restore(path, target=target)
            self.state.params = shard_params(restored, self.mesh,
                                             self._rules,
                                             fsdp=self._fsdp, fsdp_min_size=self._fsdp_min)

        if load_training_state and meta:
            self.state.step = int(meta.get("step", 0))
            self.state.epoch = int(meta.get("epoch", 0))
            self.best = meta.get("best")
            plateau = getattr(self, "plateau", None)
            if plateau is not None and meta.get("plateau"):
                p = meta["plateau"]
                plateau.best, plateau.bad, plateau.scale = (
                    p["best"], p["bad"], p["scale"]
                )
            # same shuffles as the uninterrupted run from the next epoch
            if hasattr(self.dm, "set_sampler_epoch"):
                self.dm.set_sampler_epoch(self.state.epoch + 1)
        return self.state.params
