"""Generate HOST-PROTOCOL golden fixtures FROM THE REFERENCE implementation.

Extends the math-layer goldens (scripts/make_golden_fixtures.py) to the
host side:

1. ``eval_ref.json`` — the reference evaluator's printed scores
   (/root/reference/eval.py) on a crafted prediction file over the
   synthetic corpus. The crafted file mixes hits, reversed-rel hits,
   wrong-box misses, and type-mismatch misses so the counts are
   discriminative. The reference script needs the ``conllu`` package
   (absent here); a minimal parser stub (scripts/_ref_stubs/conllu.py)
   reproduces exactly the slice of its behavior the script uses
   (tab-split fields, blank-line sentence blocks, extra columns
   dropped). All SCORING logic that runs is reference code.

2. ``init_ref.npz`` — the reference ``km_init`` / ``good_init`` DMV
   tables (/root/reference/src/model/dmv_helper/) on fixed token/tree
   sequences. Their fastNLP data-iteration shims are stubbed (DataSet
   field access, same-length batching, 0-padding); the COUNTING and
   NORMALIZATION math that defines the tables is reference code.
   (numpy>=1.24 removed np.int/np.long which the reference uses; they
   are aliased to int before import.)

Only OUTPUT artifacts are committed; no reference code is copied.

Usage: python scripts/make_host_golden.py [reference_path]
"""

from __future__ import annotations

import importlib.util
import json
import os
import shutil
import subprocess
import sys
import types

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "tests", "golden")
FIXTURE = os.path.join(OUT, "eval_fixture")
STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "_ref_stubs")
sys.path.insert(0, os.path.join(REPO, "tests"))

import synth_data  # noqa: E402


# ---------------------------------------------------------------------------
# 1. reference eval.py on a crafted prediction file
# ---------------------------------------------------------------------------

def craft_predictions(root):
    """Write val.predict.txt with a deterministic mix of correctness.

    Gold layout of the synthetic corpus (tests/synth_data.py): every
    caption aligns token 1 -> OBJ candidate obj#0 (proposal box 0,
    IoU=1) and token 2 -> REL candidate (subj obj#0, obj obj#1).
    Proposal boxes 0..2 ARE the gold objects; higher box ids are random
    (IoU hits are accidental only).
    """
    with open(os.path.join(root, "vlparse.json")) as f:
        n_box = {e["coco_id"]: len(json.load(open(os.path.join(
            root, "dev_roi_boxes.json")))[str(e["coco_id"])])
            for e in json.load(f) if isinstance(e, dict)}
    id_list = [int(x) for x in open(
        os.path.join(root, "id_list", "val.txt")).read().split()]
    sents = []
    with open(os.path.join(root, "val.conll")) as f:
        block = []
        for line in f:
            if line.strip():
                block.append(line.split("\t"))
            elif block:
                sents.append(block)
                block = []
        if block:
            sents.append(block)

    path = os.path.join(root, "val.predict.txt")
    with open(path, "w") as f:
        for idx, rows in enumerate(sents):
            img_id = id_list[idx // 5]
            nb = n_box[img_id]
            for i, row in enumerate(rows):
                tok_id, form, pos, head = row[0], row[1], row[2], \
                    row[3].strip()
                if i == 0:  # gold ATTR -> obj#2 (injected below)
                    align = [
                        "attr 2",              # hit (proposal 2 == obj 2)
                        f"attr {min(5, nb - 1)}",  # random box: miss
                        "obj 0",               # type mismatch: miss
                    ][idx % 3]
                elif i == 1:  # gold OBJ -> obj#0
                    align = [
                        "attr 2|obj 0",        # 2nd item hits
                        f"obj {min(3, nb - 1)}",  # random box: miss
                        "attr 0",              # type mismatch: miss
                    ][idx % 3]
                elif i == 2:  # gold REL -> (obj0, obj1)
                    align = [
                        "rel 0-1",             # hit
                        "obj 2|rel 1-0",       # reversed-orientation hit
                        f"rel 2-{min(3, nb - 1)}",  # miss
                        "obj 0",               # type mismatch: miss
                    ][idx % 4]
                else:
                    align = f"obj {i % nb}"   # no gold alignment here
                arc_align = f"rel {i % nb}-{(i + 1) % nb}"  # 6th column,
                # dropped by the 5-field conllu parse like real files
                f.write("\t".join(
                    [tok_id, form, pos, head, align, arc_align]) + "\n")
            f.write("\n")
    return path


def write_conllu_stub():
    os.makedirs(STUBS, exist_ok=True)
    with open(os.path.join(STUBS, "conllu.py"), "w") as f:
        f.write('''"""Minimal conllu.parse_incr stub for running the
reference evaluator (the real package is absent in this environment).
Reproduces exactly the parsing slice /root/reference/eval.py uses:
blank-line-separated blocks, tab-split columns zipped with the given
fields (extra columns dropped), '#' comment lines skipped."""


def parse_incr(f, fields=None):
    current = []
    for line in f:
        line = line.rstrip("\\n")
        if not line.strip():
            if current:
                yield current
                current = []
            continue
        if line.startswith("#"):
            continue
        current.append(dict(zip(fields, line.split("\\t"))))
    if current:
        yield current
''')


def run_reference_eval(root, predict_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = STUBS + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REF, "eval.py"),
         "--file", predict_path, "--dataroot", str(root)],
        capture_output=True, text=True, env=env, check=True,
    )
    lines = res.stdout.strip().splitlines()
    counts = {}
    for line in lines:
        parts = line.split()
        if parts[0] in ("obj", "attr", "rel"):
            acc, total = float(parts[1]), int(parts[2])
            counts[parts[0]] = [round(acc * total), total]
        elif parts[0] == "0-order":
            counts["zero_order"] = float(parts[1])
    return counts, res.stdout


def make_eval_golden():
    if os.path.isdir(FIXTURE):
        shutil.rmtree(FIXTURE)
    synth_data.make_corpus(FIXTURE, n_imgs=6, feat_dim=8, n_box=6, seed=5)
    # the .npy region features are irrelevant to the evaluator; drop
    # them so the committed fixture stays tiny
    shutil.rmtree(os.path.join(FIXTURE, "det_feats"), ignore_errors=True)
    # the synthetic scene graphs carry only OBJ/REL alignments; give
    # every caption an ATTR alignment too (token 0 -> obj#2) so all
    # three scoring sections of the reference evaluator are exercised
    vl_path = os.path.join(FIXTURE, "vlparse.json")
    with open(vl_path) as f:
        entries = json.load(f)
    for e in entries:
        for sent in e["txt2sg"]:
            sent["0"] = {"type": "ATTR", "preferred": 2,
                         "candidates": [[2, 1.0]]}
    with open(vl_path, "w") as f:
        json.dump(entries, f)
    predict_path = craft_predictions(FIXTURE)
    write_conllu_stub()
    counts, stdout = run_reference_eval(FIXTURE, predict_path)
    assert counts["obj"][0] > 0 and counts["obj"][0] < counts["obj"][1], counts
    assert counts["rel"][0] > 0 and counts["rel"][0] < counts["rel"][1], counts
    with open(os.path.join(OUT, "eval_ref.json"), "w") as f:
        json.dump({"counts": counts, "stdout": stdout}, f, indent=2)
    print("eval_ref.json:", counts)


# ---------------------------------------------------------------------------
# 2. reference km_init / good_init tables
# ---------------------------------------------------------------------------

class _Field:
    def __init__(self, content):
        self.content = content


class _StubDataSet:
    def __init__(self, insts):
        self.insts = insts

    def __len__(self):
        return len(self.insts)

    def __iter__(self):
        return iter(self.insts)

    def __getitem__(self, name):
        return _Field([i[name] for i in self.insts])


def _register_ref_stubs():
    np.int = int  # noqa: NPY001 — the reference predates numpy 1.24
    np.long = int

    fastnlp = types.ModuleType("fastNLP")
    fastnlp.DataSet = _StubDataSet

    class AutoPadder:
        def __call__(self, contents, name, dtype, dim):
            n = max(len(c) for c in contents)
            out = np.zeros((len(contents), n), np.int64)
            for i, c in enumerate(contents):
                out[i, : len(c)] = c
            return out

    fastnlp.AutoPadder = AutoPadder

    class DataSetIter:
        """Same-length batches (the reference passes
        force_same_len=True with an unbounded token budget)."""

        def __init__(self, dataset, batch_sampler=None, as_numpy=True):
            self.dataset = dataset
            self.groups = batch_sampler.groups

        def __iter__(self):
            for idx in self.groups:
                toks = np.asarray(
                    [self.dataset.insts[i]["token"] for i in idx])
                yield {"token": toks}, {}

    fastnlp.DataSetIter = DataSetIter
    fastnlp.RandomSampler = object
    fastnlp.SequentialSampler = object
    sys.modules["fastNLP"] = fastnlp

    sampler_mod = types.ModuleType("src.datamodule.sampler")

    class ConstantTokenNumSampler:
        def __init__(self, seq_len, max_token, max_sentence, num_bucket,
                     force_same_len=False):
            assert force_same_len
            by_len = {}
            for i, n in enumerate(seq_len):
                by_len.setdefault(n, []).append(i)
            self.groups = [by_len[k] for k in sorted(by_len)]

    sampler_mod.ConstantTokenNumSampler = ConstantTokenNumSampler

    # import the REAL reference torch_struct.dmv for the constants
    sys.path.insert(0, os.path.join(REF, "src", "model"))
    import torch_struct.dmv as ref_dmv  # noqa: E402

    for name in ("src", "src.datamodule", "src.model", "src.model.dmv_helper",
                 "src.model.torch_struct"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["src.datamodule.sampler"] = sampler_mod
    sys.modules["src.model.torch_struct.dmv"] = ref_dmv


def _load_ref(name):
    path = os.path.join(REF, "src", "model", "dmv_helper", f"{name}.py")
    spec = importlib.util.spec_from_file_location(f"ref_{name}", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def make_init_golden():
    _register_ref_stubs()
    ref_km = _load_ref("km_init")
    ref_good = _load_ref("good_init")

    rng = np.random.default_rng(17)
    n_token, smooth = 9, 0.1
    insts = []
    for n in (5, 3, 5, 4, 6, 3, 2, 5, 4, 6):
        toks = rng.integers(0, n_token, n).tolist()
        heads = synth_data.random_projective_tree(rng, n)
        insts.append({"token": toks, "arc": heads, "seq_len": n})
    ds = _StubDataSet(insts)

    km_dec, km_trans, km_root = ref_km.km_init(ds, n_token, smooth)
    gd_dec, gd_trans, gd_root = ref_good.good_init(ds, n_token, smooth)

    np.savez(
        os.path.join(OUT, "init_ref.npz"),
        tokens=np.array([i["token"] + [0] * (6 - len(i["token"]))
                         for i in insts], np.int64),
        heads=np.array([i["arc"] + [0] * (6 - len(i["arc"]))
                        for i in insts], np.int64),
        seq_len=np.array([i["seq_len"] for i in insts], np.int64),
        n_token=np.int64(n_token), smooth=np.float64(smooth),
        km_dec=km_dec, km_trans=km_trans, km_root=km_root,
        good_dec=gd_dec, good_trans=gd_trans, good_root=gd_root,
    )
    print("init_ref.npz: km_root[:3] =", km_root[:3])


if __name__ == "__main__":
    make_eval_golden()
    make_init_golden()
