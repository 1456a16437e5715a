"""Round-3 integration seams.

Pins the parity/efficiency contracts the round-2 review called out:
  - val/loss is the FULL interpolated joint objective
    (ref: src/pipeline.py:133-139, src/model/joint.py:693-711)
  - scheduled grounding_interpolation never recompiles the jitted steps
    (alpha is a device operand, ref: src/model/base.py:144-164)
  - per-term loss telemetry survives the jitted step
    (ref: src/pipeline.py:120-125)
  - metric assembly is config-driven, incl. CaptionImageMatchingMetric
    (ref: src/utility/metric.py:64-105, config/model/metric/*)
  - init-phase rule targets are generated once per instance, not per
    batch per epoch (ref: src/model/dmv_helper/good_init_nn.py:11-78)
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_models import build_ldndmv, make_inputs
from vlgae_tpu.models import DependencyBoxRel, DependencyBoxRelConfig, loss_nll
from vlgae_tpu.models.vis_encoder import VisBoxRelSimpleEncoder
from vlgae_tpu.training import Pipeline
from vlgae_tpu.training.metrics import (
    BoxRelMatchingMetric,
    CaptionImageMatchingMetric,
    DependencyParsingMetric,
    MultiMetric,
)

B, L, P = 8, 6, 5


def _build_joint(**cfg_kw):
    dep = build_ldndmv()
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    cfg = DependencyBoxRelConfig(
        add_rel=True, add_attr=True, add_image=True, match_hidden=16,
        fuse_num_heads=2, **cfg_kw,
    )
    return DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )


def _joint_batch(seed=3):
    rng = np.random.default_rng(seed)
    x = {k: np.asarray(v) for k, v in make_inputs(rng, B=B, L=L).items()}
    x["id"] = np.arange(B, dtype=np.int32)
    x["vis_box_feat"] = rng.standard_normal((B, P, 10)).astype(np.float32)
    x["vis_box_mask"] = np.tile(np.arange(P) < 4, (B, 1))
    x["vis_available"] = np.ones(B, bool)
    y = {"arc": np.zeros((B, L), np.int32)}
    for b in range(B):
        n = int(x["seq_len"][b])
        y["arc"][b, 1:n] = np.arange(1, n)  # right-branching gold
    return x, y


class StubDM:
    """Minimal datamodule: one fixed pre-padded joint batch."""

    def __init__(self, batch, n_batches=1):
        self.batch = batch
        self.n = n_batches
        self.datasets = {"train": [None] * (8 * n_batches)}
        self.vocabs = {}

    def make_sampler(self, name, shuffle=None):
        return list(range(self.n))

    def sampler(self, name, shuffle=None):
        # the production accessor returns the cached sampler batches()
        # iterates; the stub's "sampler" is just the batch index list
        return self.make_sampler(name, shuffle)

    def batches(self, name, shuffle=None):
        for _ in range(self.n):
            yield self.batch


def _pipe(model, cfg=None, n_batches=1):
    batch = _joint_batch()
    dm = StubDM(batch, n_batches)
    pipe = Pipeline(model, dm, cfg or {
        "optimizer": {"args": {"lr": 1e-3}},
        "trainer": {"progress_bar": False},
    })
    pipe.init_state(batch, seed=0)
    return pipe, batch


@pytest.mark.slow
def test_eval_step_loss_is_full_interpolated_objective():
    """val/loss == model.loss (dep + grounding, same alpha) on the same
    batch — what the reference's validation_step computes."""
    model = _build_joint()
    pipe, (x, y) = _pipe(model)
    alpha = 0.7
    shape_key = tuple((k, v.shape) for k, v in sorted(x.items()))
    fn = pipe._get_eval_step(shape_key)
    res = fn(pipe.state.params, x, y, jnp.float32(alpha))

    out = model.apply(pipe.state.params, x, deterministic=True)
    dep_loss, dep_aux = loss_nll(
        out, jnp.asarray(x["seq_len"]), viterbi=model.dep_cfg.viterbi_training
    )
    want, _ = model.apply(
        pipe.state.params, out, y, x, dep_loss, dep_aux, alpha,
        train=False, method=model.loss,
    )
    assert float(res["loss"]) == pytest.approx(float(want), rel=1e-5)
    # grounding really contributes: full loss != dep-only loss
    assert abs(float(want) - float(dep_loss)) > 1e-3


@pytest.mark.slow
def test_scheduled_alpha_does_not_recompile():
    """3 epochs under a [0@0,0.5@2] schedule: alpha changes every epoch
    but the jit cache must not grow after epoch 0."""
    model = _build_joint()
    pipe, _ = _pipe(model, cfg={
        "optimizer": {"args": {"lr": 1e-3}},
        "trainer": {"progress_bar": False},
        "model": {"grounding_interpolation": "[0@0,0.5@2]"},
    })
    assert pipe.alpha_schedule is not None
    assert pipe._alpha(0) != pipe._alpha(1) != pipe._alpha(2)
    pipe.train_epoch(0)
    n_compiled = len(pipe._jit_cache)
    for epoch in (1, 2):
        pipe.train_epoch(epoch)
    assert len(pipe._jit_cache) == n_compiled


@pytest.mark.slow
def test_per_term_loss_telemetry_sums_to_total():
    """train/<term> means are emitted and recombine (weighted by alpha)
    into train/loss — the reference's per-step detailed loss dict."""
    model = _build_joint()
    alpha = 0.5
    pipe, _ = _pipe(model, cfg={
        "optimizer": {"args": {"lr": 1e-3}},
        "trainer": {"progress_bar": False},
        "model": {"grounding_interpolation": alpha},
    })
    stats = pipe.train_epoch(0)
    for term in ("train/nll", "train/txt2vis", "train/mt_vis2txt"):
        assert term in stats, sorted(stats)
    mt = stats["train/txt2vis"] + stats["train/mt_vis2txt"]
    dep = stats["train/nll"]
    assert stats["train/loss"] == pytest.approx(
        alpha * mt + (1 - alpha) * dep, rel=1e-5
    )


@pytest.mark.slow
def test_metric_assembly_is_config_driven():
    model = _build_joint()
    base = {"optimizer": {"args": {"lr": 1e-3}},
            "trainer": {"progress_bar": False}}
    T = "vlgae_tpu.training.metrics."
    cap_cfg = {**base, "metric": {
        "_target_": T + "MultiMetric",
        "main": {"_target_": T + "DependencyParsingMetric"},
        "caption": {"_target_": T + "CaptionImageMatchingMetric"},
    }}
    box_cfg = {**base, "metric": {
        "_target_": T + "MultiMetric",
        "main": {"_target_": T + "DependencyParsingMetric"},
        "box": {"_target_": T + "BoxRelMatchingMetric"},
    }}
    dm = StubDM(_joint_batch())
    cap = Pipeline(model, dm, cap_cfg)
    box = Pipeline(model, dm, box_cfg)
    assert isinstance(cap.metrics[0], MultiMetric)
    assert isinstance(cap.metrics[0].others["caption"],
                      CaptionImageMatchingMetric)
    assert isinstance(cap.metrics[0].main, DependencyParsingMetric)
    assert set(box.metrics[0].others) == {"box"}
    assert isinstance(box.metrics[0].others["box"], BoxRelMatchingMetric)
    # dev/test instances are independent objects
    assert cap.metrics[0] is not cap.metrics[1]
    assert cap.metrics[0].others["caption"] is not \
        cap.metrics[1].others["caption"]


@pytest.mark.slow
def test_cap_img_mode_reports_caption_metric():
    """loss_grounding_mode='cap_img|ce' end to end: evaluate() reports
    caption/acc (previously the metric was implemented but unreachable)."""
    model = _build_joint(
        gather_logit_mode="reduced",
        loss_grounding_mode="cap_img|ce",
        decode_grounding_mode="on_img",
    )
    T = "vlgae_tpu.training.metrics."
    pipe, (x, y) = _pipe(model, cfg={
        "optimizer": {"args": {"lr": 1e-3}},
        "trainer": {"progress_bar": False},
        "metric": {
            "_target_": T + "MultiMetric",
            "main": {"_target_": T + "DependencyParsingMetric"},
            "caption": {"_target_": T + "CaptionImageMatchingMetric"},
        },
    })
    result, outputs = pipe.evaluate("dev")
    assert "caption/acc" in result
    assert 0 <= result["caption/acc"] <= 100
    assert "uas" in result
    # training also runs (cap_img CE loss path)
    stats = pipe.train_epoch(0)
    assert np.isfinite(stats["train/loss"])


def test_init_rules_cached_per_instance(tmp_path):
    """generate_rule_1o runs once per instance; later epochs hit the
    cache (the reference computes rule targets once per dataset)."""
    import synth_data
    from vlgae_tpu.data import DepDataModule
    from vlgae_tpu.models import dmv_init

    synth_data.make_corpus(tmp_path, n_imgs=2, feat_dim=8, n_box=4)
    dm = DepDataModule(
        train_path=str(tmp_path / "train.conll"),
        num_lex=0,
        train_dataloader={"batch_size": 4, "num_bucket": 1},
    ).setup()
    dm.include_init_rules = True
    calls = {"n": 0}
    orig = dmv_init.generate_rule_1o

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    dmv_init.generate_rule_1o = counting
    try:
        for _ in dm.batches("train", shuffle=False):
            pass
        first = calls["n"]
        assert first == len(dm.datasets["train"])
        for x, y in dm.batches("train", shuffle=False):
            assert {"dec_rule", "attach_rule", "root_rule"} <= set(y)
        assert calls["n"] == first  # epoch 2: all cached
    finally:
        dmv_init.generate_rule_1o = orig
    # flag off -> no rule targets in the batch
    dm.include_init_rules = False
    _, y = next(dm.batches("train", shuffle=False))
    assert "dec_rule" not in y


def test_wandb_watcher_logs_histograms(monkeypatch):
    """WandbWatcher (ref: pl_callback.py:36-69) behind the import guard:
    with a live wandb module it logs gradient + parameter histograms on
    the log_freq schedule; without one it is inert."""
    import sys
    import types

    calls = []

    fake = types.ModuleType("wandb")

    class _Hist:
        def __init__(self, arr):
            self.arr = np.asarray(arr)

    fake.Histogram = _Hist
    fake.run = object()
    fake.log = lambda payload, step=None: calls.append((step, payload))
    monkeypatch.setitem(sys.modules, "wandb", fake)

    from vlgae_tpu.utils.logger import WandbWatcher

    watcher = WandbWatcher(log="all", log_freq=2)
    assert watcher.active
    assert watcher.should_log(0) and not watcher.should_log(1)

    params = {"dense": {"kernel": jnp.ones((3, 4)),
                        "bias": jnp.zeros((4,))}}
    grads = {"dense": {"kernel": jnp.full((3, 4), 0.5),
                       "bias": jnp.full((4,), -1.0)}}
    watcher.log_trees(7, params=params, grads=grads)
    assert len(calls) == 1
    step, payload = calls[0]
    assert step == 7
    assert "parameters/dense/kernel" in payload
    assert "gradients/dense/bias" in payload
    assert isinstance(payload["gradients/dense/bias"], _Hist)
    np.testing.assert_allclose(
        payload["gradients/dense/bias"].arr, -1.0
    )

    # gradients-only mode drops the parameter histograms
    calls.clear()
    WandbWatcher(log="gradients", log_freq=1).log_trees(
        1, params=params, grads=grads
    )
    assert all(k.startswith("gradients/") for k in calls[0][1])

    # inert without the package
    monkeypatch.delitem(sys.modules, "wandb")
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    inert = WandbWatcher()
    assert not inert.active
    inert.log_trees(0, params=params, grads=grads)  # no-op, no crash


@pytest.mark.slow
def test_compact_rel_training_graph_matches_full():
    """compact_rel_train builds the relation group on the inclusive
    upper triangle through the whole training graph (encoder incidence
    GEMM, fusion log-multiplicity, compact matching axis). It must be
    mathematically identical to the full P^2 path: same training loss,
    same gradients."""
    from test_models import build_ldndmv, make_inputs
    from vlgae_tpu.models import (
        DependencyBoxRel, DependencyBoxRelConfig, loss_nll,
    )
    from vlgae_tpu.models.vis_encoder import VisBoxRelSimpleEncoder

    rng = np.random.default_rng(13)
    Bm, Lm, P = 4, 5, 5
    inputs = make_inputs(rng, B=Bm, L=Lm)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((Bm, P, 10)), jnp.float32)
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 4, (Bm, 1)))
    inputs["vis_available"] = jnp.ones(Bm, bool)

    def build(compact):
        dep = build_ldndmv()
        cfg = DependencyBoxRelConfig(
            match_hidden=16, fuse_num_heads=2, fuse_dropout=0.0,
            word_encoder_dropout=0.0, compact_rel_train=compact,
            match_kernel="xla",
        )
        return DependencyBoxRel(
            cfg=cfg, dep_cfg=dep.cfg, dependency=dep,
            vis_encoder=VisBoxRelSimpleEncoder(
                n_hidden=24, img_feat=True, use_attr=True, use_img=False),
            pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
        )

    m_c = build(True)
    m_f = build(False)
    params = m_c.init(jax.random.key(0), inputs)

    def loss(model, p):
        o = model.apply(p, inputs, deterministic=False,
                        rngs={"dropout": jax.random.key(1),
                              "sample": jax.random.key(2)})
        dep_loss, dep_aux = loss_nll(o, inputs["seq_len"], viterbi=True)
        t, _ = model.apply(p, o, None, inputs, dep_loss, dep_aux, 0.7,
                           method=model.loss)
        return t

    lc, gc = jax.value_and_grad(lambda p: loss(m_c, p))(params)
    lf, gf = jax.value_and_grad(lambda p: loss(m_f, p))(params)
    assert float(lc) == pytest.approx(float(lf), rel=1e-5)
    for (path, a), b in zip(jax.tree_util.tree_leaves_with_path(gc),
                            jax.tree_util.tree_leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5, err_msg=str(path))

    # eval forward is identical (always the full axis)
    oc = m_c.apply(params, inputs, deterministic=True)
    of = m_f.apply(params, inputs, deterministic=True)
    np.testing.assert_allclose(np.asarray(oc["match_logit"]),
                               np.asarray(of["match_logit"]), rtol=1e-6)
