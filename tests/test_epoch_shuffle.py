"""Batches must reshuffle across epochs (cached epoch-seeded samplers)."""

import numpy as np


def test_batches_reshuffle_across_epochs(tmp_path):
    import synth_data
    from vlgae_tpu.data import DepDataModule

    synth_data.make_corpus(tmp_path, n_imgs=6, feat_dim=8, n_box=4)
    dm = DepDataModule(
        train_path=str(tmp_path / "train.conll"),
        dev_path=str(tmp_path / "val.conll"),
        test_path=str(tmp_path / "test.conll"),
        num_lex=0,
        train_dataloader={"batch_size": 4, "num_bucket": 1},
        dev_dataloader={"batch_size": 4, "num_bucket": 1},
        test_dataloader={"batch_size": 4, "num_bucket": 1},
    ).setup()
    e1 = [tuple(x["id"].tolist()) for x, _ in dm.batches("train")]
    e2 = [tuple(x["id"].tolist()) for x, _ in dm.batches("train")]
    assert e1 != e2
    assert sorted(i for b in e1 for i in b) == sorted(
        i for b in e2 for i in b
    )
    # eval order is deterministic
    d1 = [tuple(x["id"].tolist()) for x, _ in dm.batches("dev", shuffle=False)]
    d2 = [tuple(x["id"].tolist()) for x, _ in dm.batches("dev", shuffle=False)]
    assert d1 == d2
