"""End-to-end: train the joint VLGAE model on the synthetic corpus,
write predictions, and score them with the standalone evaluator."""

import json
import os
import subprocess
import sys

import pytest

import synth_data

pytestmark = pytest.mark.slow  # heavyweight e2e/pipeline runs (see pytest.ini addopts)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("vlparse_e2e")
    synth_data.make_corpus(root, n_imgs=4, feat_dim=32, n_box=8)
    return root


def test_train_eval_roundtrip(corpus, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, REPO)
    import train as train_cli

    overrides = [
        "exp=vlgae",
        f"root={corpus.parent}",
        f"datamodule.train_path={corpus}/train",
        f"datamodule.train_init_path={corpus}/init",
        f"datamodule.dev_path={corpus}/val",
        f"datamodule.test_path={corpus}/test",
        f"datamodule.sg_path={corpus}/vlparse.json",
        "datamodule.pad_boxes=8",
        "datamodule.sample_boxes=5",
        "datamodule.train_dataloader.batch_size=8",
        "datamodule.train_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.batch_size=8",
        "datamodule.test_dataloader.num_bucket=1",
        "datamodule.test_dataloader.batch_size=8",
        "trainer.max_epochs=2",
        "model.init_epoch=1",
        "_hidden_size=32",
        "_match_hidden_size=16",
        "_rank=4",
        "model.dep_model_cfg.mid_ff.n_bottleneck=8",
        "vis_encoder.n_in=32",
        "vis_encoder.n_hidden=32",
    ]
    pipe, test_result = train_cli.main(overrides)
    assert "uas" in test_result
    run_dir = pipe.workdir
    dev_pred = os.path.join(run_dir, "dev.predict.txt")
    assert os.path.exists(dev_pred)

    # prediction file format: ID FORM POS HEAD ALIGN(word)\tALIGN(arc)
    with open(dev_pred) as f:
        first_block = f.read().split("\n\n")[0].splitlines()
    assert len(first_block) >= 3
    cols = first_block[0].split("\t")
    assert len(cols) >= 5
    assert cols[0] == "1"

    # standalone evaluator parity check on the produced file
    import eval as eval_cli

    counts = eval_cli.main([
        "--file", dev_pred, "--dataroot", str(corpus)
    ])
    assert counts["obj"][1] > 0
    assert counts["rel"][1] > 0

    # prediction-dumping CLI restores the run's overrides + checkpoint
    import test as test_cli

    ckpt = os.path.join(run_dir, "checkpoint", "best")
    test_cli.main([f"checkpoint={ckpt}"])
    assert os.path.exists("unnamed_dev.conll")
    with open("unnamed_dev.conll") as f:
        assert len(f.read().strip()) > 0


def test_vlgae_vit_swap_e2e(tmp_path_factory, tmp_path, monkeypatch):
    """BASELINE config #5 (CLIP/ViT swap): exp=vlgae_vit trains from raw
    pixels through a frozen ViT patch grid, decodes, and writes
    predictions — the CLI run differs from exp=vlgae only in the config."""
    corpus = tmp_path_factory.mktemp("vlparse_vit")
    synth_data.make_corpus(corpus, n_imgs=4, feat_dim=32, n_box=8,
                           image_size=32)
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, REPO)
    import train as train_cli

    overrides = [
        "exp=vlgae_vit",
        f"root={corpus.parent}",
        f"datamodule.train_path={corpus}/train",
        f"datamodule.train_init_path={corpus}/init",
        f"datamodule.dev_path={corpus}/val",
        f"datamodule.test_path={corpus}/test",
        f"datamodule.sg_path={corpus}/vlparse.json",
        "datamodule.vit_image_size=32",
        "datamodule.vit_patch_size=16",
        "datamodule.train_dataloader.batch_size=8",
        "datamodule.train_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.batch_size=8",
        "datamodule.test_dataloader.num_bucket=1",
        "datamodule.test_dataloader.batch_size=8",
        "trainer.max_epochs=2",
        "model.init_epoch=1",
        "embedding.use_subword=false",
        "embedding.use_word=true",
        "_hidden_size=32",
        "_match_hidden_size=16",
        "_rank=4",
        "model.dep_model_cfg.mid_ff.n_bottleneck=8",
        "vis_encoder.vit_hidden_size=16",
        "vis_encoder.vit_num_layers=1",
        "vis_encoder.vit_num_heads=2",
        "vis_encoder.vit_intermediate_size=32",
    ]
    pipe, test_result = train_cli.main(overrides)
    assert "uas" in test_result and "box/acc" in test_result
    run_dir = pipe.workdir
    dev_pred = os.path.join(run_dir, "dev.predict.txt")
    assert os.path.exists(dev_pred)
    with open(dev_pred) as f:
        first_block = f.read().split("\n\n")[0].splitlines()
    cols = first_block[0].split("\t")
    assert len(cols) >= 5 and cols[0] == "1"
    # alignments reference patch ids (0..3 for the 2x2 grid of a 32/16
    # ViT): every aligned box id must stay within the patch-factor range
    import re

    for line in first_block:
        for align in line.split("\t")[4:]:
            for m in re.finditer(r"(\d+)", align):
                assert 0 <= int(m.group(1)) < 4, line

    # the standalone evaluator scores ViT predictions once the proposal
    # boxes are the patch grid (scripts/make_patch_roi_boxes.py)
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import eval as eval_cli
    import make_patch_roi_boxes

    roi_out = str(tmp_path / "patch_roi_boxes.json")
    make_patch_roi_boxes.main([
        "--dataroot", str(corpus), "--split", "val",
        "--image-size", "32", "--patch-size", "16", "--out", roi_out,
    ])
    import shutil

    shutil.copy(roi_out, str(corpus / "dev_roi_boxes.json"))
    counts = eval_cli.main(["--file", dev_pred, "--dataroot", str(corpus)])
    assert counts["obj"][1] > 0  # obj alignments were scored

    # frozen backbone: requires_grad=false now routes the ViT subtree to
    # the optimizer's __frozen__ (set_to_zero) label, so its leaves are
    # MASKED OUT of Adam's moments entirely (stronger than the old
    # zero-moment check: weight decay can't leak either). Masked leaves
    # show up as zero-size placeholders in the multi_transform state.
    import jax
    import numpy as np
    from flax import traverse_util

    mu = next(s for s in jax.tree_util.tree_leaves(
        pipe.state.opt_state, is_leaf=lambda x: hasattr(x, "mu")
    ) if hasattr(s, "mu")).mu
    vit_mu = {k: v for k, v in traverse_util.flatten_dict(mu).items()
              if "vit" in "/".join(map(str, k))}
    assert vit_mu, "expected ViT param slots in the optimizer state"
    for v in vit_mu.values():
        arr = np.asarray(v)
        assert arr.size == 0 or float(np.abs(arr).max()) == 0.0, (
            "frozen ViT received gradients"
        )
    head_mu = {k: v for k, v in traverse_util.flatten_dict(mu).items()
               if "head" in "/".join(map(str, k))}
    assert any(float(np.abs(np.asarray(v)).max()) > 0.0
               for v in head_mu.values()), "factor head never trained"


def test_classic_dmv_e2e(corpus):
    """Classic DMV EM on the synthetic corpus: UAS computable, EM runs."""
    import numpy as np
    import jax.numpy as jnp

    from vlgae_tpu.data import DepDataModule
    from vlgae_tpu.models import dmv_model
    from vlgae_tpu.training.metrics import DependencyParsingMetric

    dm = DepDataModule(
        train_path=str(corpus / "train.conll"),
        dev_path=str(corpus / "val.conll"),
        test_path=str(corpus / "test.conll"),
        num_lex=0,
        train_dataloader={"batch_size": 16, "num_bucket": 1},
        dev_dataloader={"batch_size": 16, "num_bucket": 1},
        test_dataloader={"batch_size": 16, "num_bucket": 1},
    ).setup()
    n_token = len(dm.vocabs["token"])
    token_seqs = [
        [dm.vocabs["token"][t] for t in inst["token"]]
        for inst in dm.datasets["train"]
    ]
    cfg = dmv_model.DMVConfig(init_method="km", n_token=n_token, smooth=0.1)
    params = dmv_model.init_params(cfg, token_seqs=token_seqs)
    em = dmv_model.EMAccumulator(smooth=0.1)
    for _ in range(2):
        for x, y in dm.batches("train", shuffle=False):
            counts = dmv_model.expected_counts(
                params, jnp.asarray(x["token"]), jnp.asarray(x["seq_len"])
            )
            em.accumulate(counts)
        params = em.apply(params)
    metric = DependencyParsingMetric()
    for x, y in dm.batches("dev", shuffle=False):
        heads = dmv_model.decode(
            params, jnp.asarray(x["token"]), jnp.asarray(x["seq_len"]),
            mbr=True,
        )
        mask = (
            np.arange(x["token"].shape[1])[None, :]
            < np.asarray(x["seq_len"])[:, None]
        )
        metric.update({"arc": np.asarray(heads)}, {"arc": y["arc"]}, mask)
    result = metric.compute()
    assert 0 <= result["uas"] <= 100


def test_lang_only_exp(corpus, tmp_path, monkeypatch):
    """Text-only recipe: RNN encoder + word/tag embeddings + exponential
    LR schedule (exercises exp=lang_only end to end)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, REPO)
    import importlib
    import train as train_cli

    overrides = [
        "exp=lang_only",
        f"root={corpus.parent}",
        f"datamodule.train_path={corpus}/train",
        f"datamodule.train_init_path={corpus}/init",
        f"datamodule.dev_path={corpus}/val",
        f"datamodule.test_path={corpus}/test",
        f"datamodule.sg_path={corpus}/vlparse.json",
        "datamodule.pad_boxes=8",
        "datamodule.train_dataloader.batch_size=8",
        "datamodule.train_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.batch_size=8",
        "datamodule.test_dataloader.num_bucket=1",
        "datamodule.test_dataloader.batch_size=8",
        "trainer.max_epochs=2",
        "trainer.accumulate_grad_batches=2",
        "model.init_epoch=1",
        "_hidden_size=32",
        "_rank=4",
        "encoder.hidden_size=16",
        "encoder.num_layers=1",
        "model.root_emb_dim=8",
        "model.dec_emb_dim=8",
    ]
    pipe, test_result = train_cli.main(overrides)
    assert "uas" in test_result
    assert 0 <= test_result["uas"] <= 100
    assert os.path.exists(os.path.join(pipe.workdir, "dev.predict.txt"))


def test_multirun_sweep(corpus, tmp_path, monkeypatch):
    """Hydra ``-m`` subset (ref: train.py:43-48): a 2-point lr sweep
    produces numbered run dirs under one sweep dir, a shared group id
    in each run's metadata, and one JSONL result line per job."""
    monkeypatch.chdir(tmp_path)
    monkeypatch.delenv("MULTIRUN_ID", raising=False)
    sys.path.insert(0, REPO)
    import train as train_cli

    overrides = [
        "-m",
        "exp=lang_only",
        f"root={corpus.parent}",
        f"datamodule.train_path={corpus}/train",
        f"datamodule.train_init_path={corpus}/init",
        f"datamodule.dev_path={corpus}/val",
        f"datamodule.test_path={corpus}/test",
        f"datamodule.sg_path={corpus}/vlparse.json",
        "datamodule.pad_boxes=8",
        "datamodule.train_dataloader.batch_size=8",
        "datamodule.train_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.batch_size=8",
        "datamodule.test_dataloader.num_bucket=1",
        "datamodule.test_dataloader.batch_size=8",
        "trainer.max_epochs=1",
        "model.init_epoch=1",
        "_hidden_size=32",
        "_rank=4",
        "encoder.hidden_size=16",
        "encoder.num_layers=1",
        "model.root_emb_dim=8",
        "model.dec_emb_dim=8",
        "optimizer.args.lr=0.001,0.002",   # <- the sweep axis
    ]
    results = train_cli.main(overrides)
    assert len(results) == 2
    assert results[0]["group"] == results[1]["group"]
    assert results[0]["overrides"] == ["optimizer.args.lr=0.001"]
    assert results[1]["overrides"] == ["optimizer.args.lr=0.002"]

    sweep_dirs = list((tmp_path / "outputs" / "multirun").iterdir())
    assert len(sweep_dirs) == 1
    sweep = sweep_dirs[0]
    lines = [json.loads(l) for l in
             (sweep / "results.jsonl").read_text().splitlines()]
    assert len(lines) == 2 and all("test" in l for l in lines)
    for job in ("0", "1"):
        meta = json.loads((sweep / job / "multirun.json").read_text())
        assert meta["group"] == results[0]["group"]
        # each job is a full run: config + predictions written
        assert (sweep / job / "config.json").exists()
        assert (sweep / job / "test.predict.txt").exists()
    # the two jobs really composed different lr's
    cfg0 = json.loads((sweep / "0" / "config.json").read_text())
    cfg1 = json.loads((sweep / "1" / "config.json").read_text())
    assert cfg0["optimizer"]["args"]["lr"] == 0.001
    assert cfg1["optimizer"]["args"]["lr"] == 0.002


def test_search_bridge(corpus, tmp_path, monkeypatch):
    """Hyperparameter-search bridge: params in via VLGAE_SEARCH_PARAMS,
    watched metric out via VLGAE_SEARCH_RESULT (NNICallback counterpart)."""
    monkeypatch.chdir(tmp_path)
    sys.path.insert(0, REPO)
    import train as train_cli

    result_path = str(tmp_path / "trial_result.json")
    monkeypatch.setenv(
        "VLGAE_SEARCH_PARAMS",
        json.dumps({"optimizer.args.lr": 0.002, "trainer.max_epochs": 1}),
    )
    monkeypatch.setenv("VLGAE_SEARCH_RESULT", result_path)
    overrides = [
        "exp=lang_only",
        f"root={corpus.parent}",
        f"datamodule.train_path={corpus}/train",
        f"datamodule.train_init_path={corpus}/init",
        f"datamodule.dev_path={corpus}/val",
        f"datamodule.test_path={corpus}/test",
        f"datamodule.sg_path={corpus}/vlparse.json",
        "datamodule.pad_boxes=8",
        "datamodule.train_dataloader.batch_size=8",
        "datamodule.train_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.num_bucket=1",
        "datamodule.dev_dataloader.batch_size=8",
        "datamodule.test_dataloader.num_bucket=1",
        "datamodule.test_dataloader.batch_size=8",
        "model.init_epoch=0",
        "_hidden_size=32",
        "_rank=4",
        "encoder.hidden_size=16",
        "encoder.num_layers=1",
        "model.root_emb_dim=8",
        "model.dec_emb_dim=8",
    ]
    pipe, _ = train_cli.main(overrides)
    # injected trial params took effect
    assert pipe.cfg["trainer"]["max_epochs"] == 1
    assert pipe.cfg["optimizer"]["args"]["lr"] == pytest.approx(0.002)
    # metric reported back for the sweeper
    with open(result_path) as f:
        result = json.load(f)
    assert "best" in result and "test" in result
    assert "uas" in result["test"]
