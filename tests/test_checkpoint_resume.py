"""Full-fidelity checkpoint/resume.

The reference's Lightning checkpoints carry optimizer state, RNG, and
epoch counters (ref: src/utility/pl_callback.py:169-292); a resumed run
continues the uninterrupted trajectory. These tests kill training after
one epoch, resume from the saved checkpoint into a FRESH pipeline, and
assert the remaining epochs reproduce the uninterrupted run exactly
(same losses, same final params).
"""

import numpy as np
import pytest

import jax

import synth_data

from vlgae_tpu.data import DepDataModule
from vlgae_tpu.training import Pipeline, build_model

pytestmark = pytest.mark.slow  # heavyweight e2e/pipeline runs (see pytest.ini addopts)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vlparse_ckpt")
    synth_data.make_corpus(root, n_imgs=3, feat_dim=16, n_box=6)
    return root


def _cfg():
    return {
        "model": {
            "_target_": "vlgae_tpu.models.DiscriminativeNDMV",
            "init_method": "none", "init_epoch": 0,
            "attach_rank": 4, "dec_rank": 4, "root_rank": 4,
            "root_emb_dim": 6, "dec_emb_dim": 6,
            "head_ff": {"n_hidden": 16},
        },
        "embedding": {
            "use_word": True, "use_tag": True,
            "word_embedding": {"args": {"embedding_dim": 8}},
            "tag_embedding": {"args": {"embedding_dim": 4}},
        },
        "encoder": {"_target_": "vlgae_tpu.models.MLPEncoder",
                    "n_hidden": 16},
        "optimizer": {"args": {"lr": 1e-3}},
        "trainer": {"fast_dev_run": 2, "progress_bar": False},
        "datamodule": {"train_dataloader": {"batch_size": 8}},
    }


def _build(corpus, workdir):
    dm = DepDataModule(
        train_path=str(corpus / "train.conll"),
        dev_path=str(corpus / "val.conll"),
        num_lex=0,
        train_dataloader={"batch_size": 8, "num_bucket": 1},
        dev_dataloader={"batch_size": 8, "num_bucket": 1},
    ).setup()
    cfg = _cfg()
    model = build_model(cfg, dm)
    pipe = Pipeline(model, dm, cfg, workdir=str(workdir))
    pipe.init_state(next(dm.batches("train", shuffle=False)), seed=0)
    return pipe


def test_resume_matches_uninterrupted_run(corpus, tmp_path):
    # uninterrupted: epochs 0, 1, 2
    full = _build(corpus, tmp_path / "full")
    losses_full = [full.train_epoch(e)["train/loss"] for e in range(3)]

    # interrupted: epoch 0, checkpoint, die
    part = _build(corpus, tmp_path / "part")
    loss0 = part.train_epoch(0)["train/loss"]
    assert loss0 == pytest.approx(losses_full[0], rel=1e-6)
    ckpt = part.save_checkpoint("last")
    del part

    # fresh process state: new datamodule, new pipeline, restore, go on
    resumed = _build(corpus, tmp_path / "resumed")
    resumed.load_checkpoint(ckpt, load_training_state=True)
    assert resumed.state.epoch == 0
    losses_resumed = [
        resumed.train_epoch(e)["train/loss"] for e in (1, 2)
    ]
    # Adam moments, RNG stream, and sampler shuffles all restored:
    # the loss trajectory continues exactly
    np.testing.assert_allclose(losses_resumed, losses_full[1:], rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(full.state.params),
                    jax.tree_util.tree_leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    assert resumed.state.step == full.state.step


def test_resume_under_fsdp_matches_replicated(corpus, tmp_path):
    """Checkpoint/resume with trainer.fsdp=true: save gathers the
    ZeRO-sharded params/moments to host, restore re-shards them over
    'data', and the resumed trajectory continues an uninterrupted FSDP
    run exactly. Losses also match the REPLICATED run (FSDP is a
    layout, not a math change) — but params are only compared
    FSDP-vs-FSDP: the factorized scorers' project2 biases shift scores
    by a per-head constant that the child-axis log-softmax cancels, so
    they are loss-null directions whose ~zero gradients Adam amplifies
    into layout-dependent random walks."""
    full = _build(corpus, tmp_path / "fr_full")
    losses_full = [full.train_epoch(e)["train/loss"] for e in range(2)]

    def build_fsdp(workdir):
        dm = DepDataModule(
            train_path=str(corpus / "train.conll"),
            dev_path=str(corpus / "val.conll"),
            num_lex=0,
            train_dataloader={"batch_size": 8, "num_bucket": 1},
            dev_dataloader={"batch_size": 8, "num_bucket": 1},
        ).setup()
        cfg = _cfg()
        cfg["trainer"].update(fsdp=True, fsdp_min_size=64)
        model = build_model(cfg, dm)
        pipe = Pipeline(model, dm, cfg, workdir=str(workdir))
        pipe.init_state(next(dm.batches("train", shuffle=False)), seed=0)
        return pipe

    def n_sharded(tree):
        return sum(
            1 for leaf in jax.tree_util.tree_leaves(tree)
            if hasattr(leaf, "sharding")
            and not leaf.sharding.is_fully_replicated
        )

    full_fsdp = build_fsdp(tmp_path / "fr_full_fsdp")
    assert n_sharded(full_fsdp.state.params)
    losses_fsdp = [
        full_fsdp.train_epoch(e)["train/loss"] for e in range(2)
    ]
    # layout-parity: the FSDP trajectory IS the replicated trajectory
    np.testing.assert_allclose(losses_fsdp, losses_full, rtol=1e-5)

    part = build_fsdp(tmp_path / "fr_part")
    loss0 = part.train_epoch(0)["train/loss"]
    assert loss0 == pytest.approx(losses_fsdp[0], rel=1e-6)
    ckpt = part.save_checkpoint("last")
    del part

    resumed = build_fsdp(tmp_path / "fr_resumed")
    resumed.load_checkpoint(ckpt, load_training_state=True)
    # restore re-sharded params AND Adam moments over 'data'
    assert n_sharded(resumed.state.params)
    assert n_sharded(resumed.state.opt_state)
    loss1 = resumed.train_epoch(1)["train/loss"]
    assert loss1 == pytest.approx(losses_fsdp[1], rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(full_fsdp.state.params),
                    jax.tree_util.tree_leaves(resumed.state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_params_only_checkpoint_roundtrip(corpus, tmp_path):
    pipe = _build(corpus, tmp_path / "po")
    pipe.train_epoch(0)
    path = pipe.save_checkpoint("export", params_only=True)
    other = _build(corpus, tmp_path / "po2")
    other.load_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(pipe.state.params),
                    jax.tree_util.tree_leaves(other.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # warm start must NOT touch the optimizer state or counters
    assert other.state.step == 0


def test_full_checkpoint_warm_start_takes_params_only(corpus, tmp_path):
    pipe = _build(corpus, tmp_path / "ws")
    pipe.train_epoch(0)
    path = pipe.save_checkpoint("last")
    other = _build(corpus, tmp_path / "ws2")
    other.load_checkpoint(path)  # no load_training_state
    for a, b in zip(jax.tree_util.tree_leaves(pipe.state.params),
                    jax.tree_util.tree_leaves(other.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert other.state.step == 0
    # the optimizer state stayed at init (zero Adam moments)
    mu = [x for x in jax.tree_util.tree_leaves(other.state.opt_state)]
    assert any(np.allclose(np.asarray(m), 0.0) for m in mu)
