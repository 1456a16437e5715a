"""End-to-end accuracy A/B of trainer.precision=bf16 (the fused
matching kernel engages via match_kernel='auto') vs the shipped
precision=32 (f32 einsum matching) — VERDICT r4 #1b.

Two identical soak-style trainings on the learnable synthetic corpus
(right-branching grammar + grounded box-0 signal), differing ONLY in
`trainer.precision`. Records per-config: final val/test UAS + box
metrics, the standalone evaluator's obj score, and train wall time.
The verdict gates the production recipe flip (configs/trainer/prod.yaml
or an exp=vlgae precision override): bf16 is acceptable when its final
UAS and box/obj are within 1 point of f32 on this corpus.

Run detached on the TPU (NEVER timeout-kill a TPU client):
  nohup python scripts/ab_precision_e2e.py > /tmp/ab_prec.log 2>&1 &
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _tpu_drive_common import run_eval, setup  # noqa: E402

setup("/tmp/ab_precision", 7000, "AB_PRECISION")

from pathlib import Path  # noqa: E402

from synth_data import make_corpus  # noqa: E402

make_corpus(Path("vlparse"), n_imgs=300, feat_dim=2048, n_box=36,
            grammar="right", grounded=True, len_range=(3, 15))
print("corpus done", flush=True)
import train as train_cli  # noqa: E402

BASE = [
    "exp=vlgae", "root=.",
    "datamodule.train_path=vlparse/train",
    "datamodule.train_init_path=vlparse/init",
    "datamodule.dev_path=vlparse/val",
    "datamodule.test_path=vlparse/test",
    "datamodule.sg_path=vlparse/vlparse.json",
    "datamodule.pad_boxes=36", "datamodule.sample_boxes=35",
    "datamodule.train_dataloader.num_bucket=3",
    "datamodule.dev_dataloader.num_bucket=2",
    "datamodule.test_dataloader.num_bucket=2",
    "trainer.max_epochs=10", "model.init_epoch=2",
    "embedding.use_subword=false", "embedding.use_word=true",
    "seed=7",
]

results = {}
for name, precision in [("f32_shipped", "32"), ("bf16_kernel", "bf16")]:
    t0 = time.time()
    pipe, test_result = train_cli.main(
        BASE + [f"trainer.precision={precision}", f"name={name}"])
    wall = round(time.time() - t0, 1)
    preds = sorted(glob.glob("outputs/0_latest_run/dev.predict.txt"))
    if not preds:
        raise SystemExit(f"{name}: no dev.predict.txt written")
    print(f"== {name}: eval.py on {preds[-1]}", flush=True)
    run_eval(preds[-1], "vlparse")
    results[name] = {
        "precision": precision,
        "bf16_matmul": bool(pipe.model.cfg.bf16_matmul),
        "match_kernel": str(pipe.model.cfg.match_kernel),
        "wall_s": wall,
        **{k: float(v) for k, v in test_result.items()},
    }
    print(f"== {name} done in {wall}s: {results[name]}", flush=True)

print(json.dumps(results, indent=2), flush=True)
f32, b16 = results["f32_shipped"], results["bf16_kernel"]
d_uas = b16.get("uas", 0) - f32.get("uas", 0)
d_obj = b16.get("box/obj", 0) - f32.get("box/obj", 0)
print(f"DELTA bf16-f32: uas {d_uas:+.2f}  box/obj {d_obj:+.2f}  "
      f"wall {b16['wall_s'] - f32['wall_s']:+.1f}s", flush=True)
ok = abs(d_uas) <= 1.0 and abs(d_obj) <= 1.0
print("AB_PRECISION VERDICT:", "bf16 ACCEPTABLE" if ok else
      "bf16 DEGRADES — keep f32 default, record dead end", flush=True)
