"""Multi-chip data parallelism through the REAL Pipeline.

The reference's only parallelism is Lightning DDP over NCCL
(ref: src/__init__.py:93-105, src/pipeline.py:234-240). Here the
production ``Pipeline`` shards every train/eval batch over a 1-D
``data`` mesh (8 virtual CPU devices in tests, set by conftest.py) with
params replicated, and XLA derives the gradient psum. These tests
assert that (a) batches are ACTUALLY sharded on the mesh, and (b) an
8-device run reproduces the 1-device run on the same data.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import synth_data

from vlgae_tpu.data import DepDataModule
from vlgae_tpu.parallel import pad_batch_to_devices, shard_batch
from vlgae_tpu.training import Pipeline, build_model

pytestmark = pytest.mark.slow  # heavyweight e2e/pipeline runs (see pytest.ini addopts)


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vlparse_par")
    synth_data.make_corpus(root, n_imgs=4, feat_dim=16, n_box=6)
    return root


def _make_dm(corpus):
    return DepDataModule(
        train_path=str(corpus / "train.conll"),
        dev_path=str(corpus / "val.conll"),
        test_path=str(corpus / "test.conll"),
        num_lex=0,
        train_dataloader={"batch_size": 8, "num_bucket": 1},
        dev_dataloader={"batch_size": 8, "num_bucket": 1},
        test_dataloader={"batch_size": 8, "num_bucket": 1},
    ).setup()


def _cfg():
    return {
        "model": {
            "_target_": "vlgae_tpu.models.DiscriminativeNDMV",
            "init_method": "none",
            "init_epoch": 0,
            "attach_rank": 4, "dec_rank": 4, "root_rank": 4,
            "root_emb_dim": 6, "dec_emb_dim": 6,
            "head_ff": {"n_hidden": 24},
        },
        "embedding": {
            "use_word": True, "use_tag": True,
            "word_embedding": {"args": {"embedding_dim": 12}},
            "tag_embedding": {"args": {"embedding_dim": 6}},
        },
        "encoder": {"_target_": "vlgae_tpu.models.MLPEncoder",
                    "n_hidden": 24},
        "optimizer": {"args": {"lr": 1e-3}},
        "trainer": {"fast_dev_run": 2, "progress_bar": False},
        "datamodule": {"train_dataloader": {"batch_size": 8}},
    }


def _build(corpus, devices=None, workdir="."):
    dm = _make_dm(corpus)
    cfg = _cfg()
    model = build_model(cfg, dm)
    pipe = Pipeline(model, dm, cfg, workdir=workdir, devices=devices)
    sample = next(dm.batches("train", shuffle=False))
    pipe.init_state(sample, seed=0)
    return pipe


def test_batches_are_sharded_on_the_mesh(corpus, tmp_path):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    pipe = _build(corpus, workdir=str(tmp_path))
    assert pipe.n_devices == 8
    x, _ = next(pipe.dm.batches("train", shuffle=False))
    xp, real = pad_batch_to_devices(x, pipe.n_devices, pow2=True)
    sharded = shard_batch(xp, pipe.mesh)
    word = sharded["word"]
    # the batch axis is genuinely split: 8 addressable shards of B/8 rows
    assert not word.sharding.is_fully_replicated
    assert len(word.sharding.device_set) == 8
    shards = word.addressable_shards
    assert len(shards) == 8
    assert all(s.data.shape[0] == word.shape[0] // 8 for s in shards)
    # params stay replicated
    leaf = jax.tree_util.tree_leaves(pipe.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_eight_devices_match_single_device(corpus, tmp_path):
    pipe8 = _build(corpus, workdir=str(tmp_path / "p8"))
    pipe1 = _build(corpus, devices=jax.devices()[:1],
                   workdir=str(tmp_path / "p1"))
    assert pipe8.n_devices == 8 and pipe1.n_devices == 1

    # identical init (same seed, same sample batch)
    l8 = jax.tree_util.tree_leaves(pipe8.state.params)
    l1 = jax.tree_util.tree_leaves(pipe1.state.params)
    for a, b in zip(l8, l1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # deterministic eval: loss and UAS must agree across mesh sizes
    val8, out8 = pipe8.evaluate("dev")
    val1, out1 = pipe1.evaluate("dev")
    assert val8["uas"] == pytest.approx(val1["uas"], abs=1e-9)
    assert val8["loss"] == pytest.approx(val1["loss"], rel=1e-5)
    assert set(out8) == set(out1)
    for sid in out8:
        assert out8[sid]["arc"] == out1[sid]["arc"]

    # gradients of one sharded batch == single-device gradients (the
    # psum-derived all-reduce reproduces the unsharded computation;
    # post-Adam params are NOT compared because the first Adam steps are
    # ~lr*sign(g), which amplifies reduction-order float noise)
    x, y = next(pipe8.dm.batches("train", shuffle=False))
    for pipe in (pipe8, pipe1):
        xp, _ = pad_batch_to_devices(x, pipe.n_devices, pow2=True)
        yp, _ = pad_batch_to_devices(y, pipe.n_devices, pow2=True)
        shape_key = tuple((k, v.shape) for k, v in sorted(xp.items()))
        gfn = pipe._get_grad_step(shape_key, False)
        (loss, _), grads = gfn(
            pipe.state.params, shard_batch(xp, pipe.mesh),
            shard_batch(yp, pipe.mesh), jax.random.key(7),
            jnp.float32(0.5),
        )
        pipe._probe = (float(loss), grads)
    loss8, g8 = pipe8._probe
    loss1, g1 = pipe1._probe
    assert loss8 == pytest.approx(loss1, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g8),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)

    # one short train epoch on the same data order: same loss trajectory
    stats8 = pipe8.train_epoch(0)
    stats1 = pipe1.train_epoch(0)
    assert stats8["train/loss"] == pytest.approx(
        stats1["train/loss"], rel=1e-4
    )
    # params still replicated after sharded updates
    leaf = jax.tree_util.tree_leaves(pipe8.state.params)[0]
    assert leaf.sharding.is_fully_replicated


def test_dryrun_model_parallel_mesh():
    """The driver-facing dryrun drives the joint Pipeline on a
    ('data', 'model') = (4, 2) mesh: batches data-sharded, the visual
    projections tensor-parallel (asserted inside on the real param
    shardings)."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_fsdp_shards_params_and_matches_replicated(corpus, tmp_path):
    """trainer.fsdp=true: params + Adam moments fully shard over 'data'
    (ZeRO-style, shape-based: largest divisible axis, leaves below
    fsdp_min_size replicate). XLA derives the all-gather-on-use /
    reduce-scatter from the annotations, so the FSDP run must reproduce
    the replicated run's eval and training trajectory exactly (the
    reference has no parameter sharding; this is TPU-native headroom)."""
    dm = _make_dm(corpus)
    cfg_f = _cfg()
    # tiny threshold so the test model's small leaves actually shard
    cfg_f["trainer"].update(fsdp=True, fsdp_min_size=64)
    model = build_model(cfg_f, dm)
    pipe_f = Pipeline(model, dm, cfg_f, workdir=str(tmp_path / "fsdp"))
    sample = next(dm.batches("train", shuffle=False))
    pipe_f.init_state(sample, seed=0)
    pipe_r = _build(corpus, workdir=str(tmp_path / "repl"))

    # at least one large param leaf (and its mirrored Adam moments) is
    # ACTUALLY sharded over 'data'; small leaves stay replicated
    def sharded_leaves(tree):
        out = []
        for leaf in jax.tree_util.tree_leaves(tree):
            if hasattr(leaf, "sharding") and not (
                leaf.sharding.is_fully_replicated
            ):
                out.append(leaf)
        return out

    ps = sharded_leaves(pipe_f.state.params)
    assert ps, "fsdp sharded no param leaves"
    for leaf in ps:
        shard = leaf.addressable_shards[0].data
        assert shard.size * 8 == leaf.size, (shard.shape, leaf.shape)
    assert sharded_leaves(pipe_f.state.opt_state), (
        "Adam moments not sharded"
    )
    assert not sharded_leaves(pipe_r.state.params)

    # identical init values
    for a, b in zip(jax.tree_util.tree_leaves(pipe_f.state.params),
                    jax.tree_util.tree_leaves(pipe_r.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # eval + one epoch reproduce the replicated run
    val_f, out_f = pipe_f.evaluate("dev")
    val_r, out_r = pipe_r.evaluate("dev")
    assert val_f["uas"] == pytest.approx(val_r["uas"], abs=1e-9)
    assert val_f["loss"] == pytest.approx(val_r["loss"], rel=1e-5)
    for sid in out_r:
        assert out_f[sid]["arc"] == out_r[sid]["arc"]
    stats_f = pipe_f.train_epoch(0)
    stats_r = pipe_r.train_epoch(0)
    assert stats_f["train/loss"] == pytest.approx(
        stats_r["train/loss"], rel=1e-4
    )
    # updates preserved the FSDP layout (out_shardings pin it)
    assert sharded_leaves(pipe_f.state.params)


def test_mesh_registration_scoped_per_pipeline(corpus, tmp_path):
    """Two Pipelines with different meshes in one process must not
    poison each other's kernel dispatch: the registry is refreshed at
    every loop entry, so whichever pipeline runs owns the registered
    mesh for its own (re)traces."""
    import vlgae_tpu.ops.dmv_pallas as dp

    pipe8 = _build(corpus, workdir=str(tmp_path / "m8"))
    assert dp._DATA_MESH is pipe8.mesh

    cfg1 = _cfg()
    dm1 = _make_dm(corpus)
    model1 = build_model(cfg1, dm1)
    pipe1 = Pipeline(model1, dm1, cfg1, workdir=str(tmp_path / "m1"),
                     devices=jax.devices()[:1])
    sample = next(dm1.batches("train", shuffle=False))
    pipe1.init_state(sample, seed=0)
    assert dp._DATA_MESH is pipe1.mesh  # last constructor wins ...

    # ... but each loop re-registers its own mesh on entry
    pipe8.evaluate("dev")
    assert dp._DATA_MESH is pipe8.mesh
    pipe1.evaluate("dev")
    assert dp._DATA_MESH is pipe1.mesh
    stats = pipe8.train_epoch(0)
    assert dp._DATA_MESH is pipe8.mesh
    assert np.isfinite(stats["train/loss"])
