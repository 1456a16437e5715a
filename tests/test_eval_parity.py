"""eval.py protocol parity on hand-constructed predictions.

Builds a prediction file where the correct/incorrect alignments are
known by construction (synthetic scene graphs align gold boxes exactly
with proposal boxes), and checks the reported accuracies.
"""

import json

import numpy as np
import pytest

import synth_data


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalp")
    synth_data.make_corpus(root, n_imgs=4, feat_dim=8, n_box=6)
    return root


def _write_predictions(path, corpus, obj_choice, rel_choice):
    """One prediction block per dev caption: token1=obj, token2=rel."""
    from vlgae_tpu.data import read_conll

    sents = read_conll(corpus / "val.conll")
    with open(path, "w") as f:
        for sent in sents:
            n = len(sent["raw_word"])
            for i in range(n):
                align = "X"
                if i == 1:
                    align = f"obj {obj_choice}"
                elif i == 2:
                    align = f"rel {rel_choice[0]}-{rel_choice[1]}"
                f.write(
                    f"{i+1}\t{sent['raw_word'][i]}\t{sent['tag'][i]}\t"
                    f"{sent['arc'][i]}\t{align}\n"
                )
            f.write("\n")


def test_eval_all_correct(corpus, tmp_path):
    import eval as eval_cli

    pred = tmp_path / "pred.txt"
    # gold OBJ for token 1 is object 0 == proposal box 0; gold REL is
    # (obj 0, obj 1) == proposal boxes (0, 1)
    _write_predictions(pred, corpus, obj_choice=0, rel_choice=(0, 1))
    counts = eval_cli.main(["--file", str(pred), "--dataroot", str(corpus)])
    assert counts["obj"][0] == counts["obj"][1] > 0
    assert counts["rel"][0] == counts["rel"][1] > 0


def test_eval_reversed_rel_counts(corpus, tmp_path):
    import eval as eval_cli

    pred = tmp_path / "pred_rev.txt"
    # reversed endpoints must still count (either orientation)
    _write_predictions(pred, corpus, obj_choice=0, rel_choice=(1, 0))
    counts = eval_cli.main(["--file", str(pred), "--dataroot", str(corpus)])
    assert counts["rel"][0] == counts["rel"][1] > 0


def test_eval_all_wrong(corpus, tmp_path):
    import eval as eval_cli

    pred = tmp_path / "pred_bad.txt"
    # box 5 does not overlap gold objects (random boxes, IoU<0.5 whp);
    # use an out-of-scene-graph proposal index
    _write_predictions(pred, corpus, obj_choice=5, rel_choice=(5, 4))
    counts = eval_cli.main(["--file", str(pred), "--dataroot", str(corpus)])
    # obj accuracy must drop strictly below perfect
    assert counts["obj"][0] < counts["obj"][1]
