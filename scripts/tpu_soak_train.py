"""Realistic-scale training soak on the real TPU: 2,000 sentences,
len 3-14, 2048-d features, 36 boxes, bucketed sampler with multiple
compile shapes, full vlgae recipe (init warmup -> joint epochs).
The right-branching grammar + grounded box-0 signal make both the
parse and the grounding learnable: expect UAS and box/obj to climb
(measured on v5e: UAS 100 from the init phase on, box/obj 13 -> 99
over 12 epochs, eval.py obj 0.98 over 1,000 dev sentences).
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _tpu_drive_common import run_eval, setup  # noqa: E402

setup("/tmp/soak_tpu", 5400, "SOAK")

from pathlib import Path  # noqa: E402

from synth_data import make_corpus  # noqa: E402

make_corpus(Path("vlparse"), n_imgs=400, feat_dim=2048, n_box=36,
            grammar="right", grounded=True, len_range=(3, 15))
print("corpus done", flush=True)
import train as train_cli  # noqa: E402

t0 = time.time()
pipe, test_result = train_cli.main([
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
    "trainer.max_epochs=12", "model.init_epoch=2",
    "embedding.use_subword=false", "embedding.use_word=true",
])
print("SOAK TRAIN DONE in", round(time.time() - t0, 1), "s", flush=True)
print("test_result:", test_result, flush=True)
preds = sorted(glob.glob("outputs/0_latest_run/dev.predict.txt"))
if not preds:
    raise SystemExit("no dev.predict.txt written — soak FAILED")
run_eval(preds[-1], "vlparse")
print("SOAK OK", flush=True)
