"""Synthetic VLParse-format corpus generator for tests.

Produces the full on-disk contract of the reference data layer
(ref: src/datamodule/task/vlparse.py:135-172 and eval.py:22-47):
  - {split}.conll              id word tag head (tab-separated)
  - id_list/{split}.txt        one img_id per line (5 captions each)
  - det_feats/{img_id}.npy     [n_box, feat_dim + 4]
  - vlparse.json               scene graphs + txt2sg alignments
  - dev_roi_boxes.json         proposal boxes per image
"""

import json
import os
from pathlib import Path

import numpy as np

TAGS = ["NN", "VBZ", "DT", "JJ", "IN", "NNS"]
WORDS = {
    "NN": ["dog", "cat", "man", "ball", "tree"],
    "NNS": ["dogs", "cats"],
    "VBZ": ["runs", "sees", "holds"],
    "DT": ["the", "a"],
    "JJ": ["big", "red", "small"],
    "IN": ["on", "under"],
}


def random_projective_tree(rng, n):
    """Random single-root projective tree via recursive splitting."""
    heads = [0] * (n + 1)

    def build(lo, hi, head):
        # positions lo..hi (inclusive), all eventually dominated by head
        if lo > hi:
            return
        r = rng.integers(lo, hi + 1)
        heads[r] = head
        build(lo, r - 1, r)
        build(r + 1, hi, r)

    root = int(rng.integers(1, n + 1))
    heads[root] = 0
    build(1, root - 1, root)
    build(root + 1, n, root)
    return heads[1:]


def make_corpus(root, n_imgs=8, feat_dim=64, n_box=12, seed=0,
                grammar="random", grounded=False, len_range=(3, 7),
                image_size=0):
    """grammar: 'random' (random projective trees) or 'right'
    (right-branching: head = previous word) -- the latter gives a
    learnable deterministic structure for training-dynamics tests.

    grounded=True makes the corpus visually learnable: every caption of
    an image uses the image's object word at token 1, and proposal box 0
    carries a feature channel identifying that word -- so the matching
    loss has real signal tying token 1 to box 0 (the gold alignment)."""
    root = Path(root)
    (root / "id_list").mkdir(parents=True, exist_ok=True)
    (root / "det_feats").mkdir(exist_ok=True)
    rng = np.random.default_rng(seed)

    sg_entries = []
    splits = {"train": [], "init": [], "val": [], "test": []}
    img_ids = {
        "train": list(range(100, 100 + n_imgs)),
        "val": list(range(200, 200 + max(2, n_imgs // 2))),
        "test": list(range(300, 300 + max(2, n_imgs // 2))),
    }
    img_ids["init"] = img_ids["train"]
    roi_boxes = {}

    all_imgs = sorted(set(sum(img_ids.values(), [])))
    obj_words = WORDS["NN"]
    img_word = {
        img_id: obj_words[rng.integers(len(obj_words))]
        for img_id in all_imgs
    }
    for img_id in all_imgs:
        feats = rng.standard_normal((n_box, feat_dim)).astype(np.float32)
        if grounded:
            wid = obj_words.index(img_word[img_id])
            feats[0, :] *= 0.1
            feats[0, wid] = 8.0  # identifiable box-0 channel
        boxes = np.abs(rng.standard_normal((n_box, 4))) * 50
        boxes[:, 2:] = boxes[:, :2] + 20 + boxes[:, 2:]
        np.save(root / "det_feats" / f"{img_id}.npy",
                np.concatenate([feats, boxes], 1).astype(np.float32))
        roi_boxes[str(img_id)] = boxes.tolist()
        if image_size:  # raw pixels for the ViT-swap recipe (exp=vlgae_vit)
            (root / "imgs").mkdir(exist_ok=True)
            np.save(
                root / "imgs" / f"{img_id}.npy",
                rng.standard_normal(
                    (image_size, image_size, 3)
                ).astype(np.float32),
            )

        # scene graph: objects aligned to proposal boxes (IoU=1 on purpose)
        n_obj = 3
        objs = []
        for k in range(n_obj):
            b = boxes[k]
            objs.append({
                "id": k,
                "x": float(b[0]), "y": float(b[1]),
                "width": float(b[2] - b[0]), "height": float(b[3] - b[1]),
            })
        rels = [{
            "id": n_obj, "subj": 0, "obj": 1,
            "x": 0.0, "y": 0.0, "width": 1.0, "height": 1.0,
        }]
        txt2sg = []
        for s in range(5):
            # token 1 = OBJ aligned to obj 0; token 2 = REL
            txt2sg.append({
                "1": {"type": "OBJ", "preferred": 0,
                      "candidates": [[0, 1.0]]},
                "2": {"type": "REL", "preferred": n_obj,
                      "candidates": [[n_obj, 1.0]]},
            })
        sg_entries.append({
            "coco_id": img_id, "obj": objs, "rel": rels, "txt2sg": txt2sg,
        })

    with open(root / "vlparse.json", "w") as f:
        json.dump(sg_entries, f)
    with open(root / "dev_roi_boxes.json", "w") as f:
        json.dump(roi_boxes, f)
    with open(root / "dev_gold_boxes.json", "w") as f:
        json.dump(roi_boxes, f)

    for split, ids in img_ids.items():
        name = {"init": "init"}.get(split, split)
        lines = []
        sents = []
        for img_id in ids:
            for s in range(5):
                n = int(rng.integers(len_range[0], len_range[1]))
                tags = [TAGS[rng.integers(len(TAGS))] for _ in range(n)]
                words = [
                    WORDS[t][rng.integers(len(WORDS[t]))] for t in tags
                ]
                if grammar == "right":
                    heads = list(range(n))
                else:
                    heads = random_projective_tree(rng, n)
                if grounded:
                    tags[1] = "NN"
                    words[1] = img_word[img_id]
                sents.append((words, tags, heads))
            lines.append(str(img_id))
        with open(root / "id_list" / f"{name}.txt", "w") as f:
            f.write("\n".join(lines) + "\n")
        with open(root / f"{name}.conll", "w") as f:
            for words, tags, heads in sents:
                for i, (w, t, h) in enumerate(zip(words, tags, heads), 1):
                    f.write(f"{i}\t{w}\t{t}\t{h}\n")
                f.write("\n")
    return root
