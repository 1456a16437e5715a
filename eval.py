"""Standalone grounding evaluator (protocol-parity with reference eval.py).

Reads a prediction file in the framework's CoNLL format
(``ID FORM POS HEAD ALIGN``), the gold scene graphs (vlparse.json) and
proposal/gold boxes, and reports IoU@0.5 accuracy for obj / attr / rel
alignments plus the combined "0-order" score
(ref: /root/reference/eval.py:88-171).

    python eval.py --file outputs/0_latest_run/dev.predict.txt \
                   --dataroot data/vlparse [--gold]
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path


def parse_conll_predictions(path):
    """Parse blocks of ``ID FORM POS HEAD ALIGN`` rows."""
    sentences = []
    current = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                if current:
                    sentences.append(current)
                    current = []
                continue
            cols = line.split("\t")
            current.append({
                "ID": cols[0],
                "FORM": cols[1] if len(cols) > 1 else "",
                "POS": cols[2] if len(cols) > 2 else "",
                "HEAD": cols[3] if len(cols) > 3 else "",
                "ALIGN": cols[4] if len(cols) > 4 else "",
            })
    if current:
        sentences.append(current)
    return sentences


def get_position(item):
    return (item["x"], item["y"], item["x"] + item["width"],
            item["y"] + item["height"])


def bb_iou(a, b):
    xa, ya = max(a[0], b[0]), max(a[1], b[1])
    xb, yb = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0, xb - xa + 1) * max(0, yb - ya + 1)
    area_a = (a[2] - a[0] + 1) * (a[3] - a[1] + 1)
    area_b = (b[2] - b[0] + 1) * (b[3] - b[1] + 1)
    return inter / float(area_a + area_b - inter)


def hit(a, b):
    return bb_iou(a, b) >= 0.5


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--gold", action="store_true")
    parser.add_argument("--file",
                        default="outputs/0_latest_run/dev.predict.txt")
    parser.add_argument("--dataroot", default="data/vlparse")
    args = parser.parse_args(argv)

    boxes_file = "dev_gold_boxes.json" if args.gold else "dev_roi_boxes.json"
    with open(f"{args.dataroot}/{boxes_file}") as f:
        img2boxes = {int(k): v for k, v in json.load(f).items()}
    with open(f"{args.dataroot}/vlparse.json") as f:
        gold = {item["coco_id"]: item for item in json.load(f)
                if isinstance(item, dict)}

    id_list = Path(f"{args.dataroot}/id_list/val.txt").read_text().splitlines()
    img_ids = [int(x) for x in id_list for _ in range(5)]
    sent_ids = [s for _ in id_list for s in range(5)]
    predict = parse_conll_predictions(args.file)
    has_vg = [i in gold for i in img_ids]
    img_ids = [i for i, flag in zip(img_ids, has_vg) if flag]
    sent_ids = [s for s, flag in zip(sent_ids, has_vg) if flag]
    print(len(sent_ids), len(predict))

    counts = {"obj": [0, 0], "attr": [0, 0], "rel": [0, 0]}

    for idx in range(len(predict)):
        img_id, sent_id = img_ids[idx], sent_ids[idx]
        txt2sg = gold[img_id]["txt2sg"][sent_id]
        for word_idx, data in txt2sg.items():
            kind = data["type"].lower()
            if kind not in counts:
                continue
            counts[kind][1] += 1
            token = predict[idx][int(word_idx)]
            correct = False
            for item in token["ALIGN"].split("|"):
                parts = item.split()
                if len(parts) != 2:
                    continue
                pred_type, pred_id = parts
                if kind == "obj" and pred_type == "obj":
                    box = img2boxes[img_id][int(pred_id)]
                    for obj_id, _ in data["candidates"]:
                        if hit(box, get_position(gold[img_id]["obj"][obj_id])):
                            correct = True
                            break
                elif kind == "attr" and pred_type == "attr":
                    box = img2boxes[img_id][int(pred_id)]
                    for obj_id, _ in data["candidates"]:
                        if hit(box, get_position(gold[img_id]["obj"][obj_id])):
                            correct = True
                            break
                elif kind == "rel" and pred_type == "rel":
                    o1, o2 = pred_id.split("-")
                    b1 = img2boxes[img_id][int(o1)]
                    b2 = img2boxes[img_id][int(o2)]
                    for rel_id, _ in data["candidates"]:
                        rel_item = gold[img_id]["rel"][
                            rel_id - len(gold[img_id]["obj"])
                        ]
                        assert rel_item["id"] == rel_id
                        g1 = get_position(gold[img_id]["obj"][rel_item["subj"]])
                        g2 = get_position(gold[img_id]["obj"][rel_item["obj"]])
                        if (hit(b1, g1) and hit(b2, g2)) or (
                                hit(b2, g1) and hit(b1, g2)):
                            correct = True
                            break
                if correct:
                    break
            if correct:
                counts[kind][0] += 1

    for kind in ("obj", "attr", "rel"):
        c, t = counts[kind]
        print(kind, c / t if t else 0.0, t)
    total_c = sum(c for c, _ in counts.values())
    total_t = sum(t for _, t in counts.values())
    print("0-order", total_c / total_t if total_t else 0.0)
    return counts


if __name__ == "__main__":
    main()
