"""E2E CLI drive of the production train.py on the real TPU (tunnel).

Tiny synthetic VLParse corpus, 1 bucket, 3 epochs (1 init + 2 joint),
then eval.py scoring of the written predictions. Validates the full
production path (datamodule, jitted sharded steps, async host loop,
eval dispatch-ahead, checkpointing, prediction writer, evaluator) on
hardware.
"""
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _tpu_drive_common import run_eval, setup  # noqa: E402

setup("/tmp/e2e_tpu", 3600, "E2E")

from pathlib import Path  # noqa: E402

from synth_data import make_corpus  # noqa: E402

make_corpus(Path("vlparse"), n_imgs=4, feat_dim=16, n_box=6)
import train as train_cli  # noqa: E402

t0 = time.time()
pipe, test_result = train_cli.main([
    "exp=vlgae", "root=.",
    "datamodule.train_path=vlparse/train",
    "datamodule.train_init_path=vlparse/init",
    "datamodule.dev_path=vlparse/val",
    "datamodule.test_path=vlparse/test",
    "datamodule.sg_path=vlparse/vlparse.json",
    "datamodule.pad_boxes=6", "datamodule.sample_boxes=5",
    "datamodule.train_dataloader.batch_size=8",
    "datamodule.train_dataloader.num_bucket=1",
    "datamodule.dev_dataloader.num_bucket=1",
    "datamodule.dev_dataloader.batch_size=8",
    "datamodule.test_dataloader.num_bucket=1",
    "datamodule.test_dataloader.batch_size=8",
    "trainer.max_epochs=3", "model.init_epoch=1",
    "embedding.use_subword=false", "embedding.use_word=true",
    "_hidden_size=32", "_match_hidden_size=16", "_rank=4",
    "vis_encoder.n_in=16", "vis_encoder.n_hidden=32",
])
print("TRAIN DONE in", round(time.time() - t0, 1), "s", flush=True)
print("test_result:", test_result, flush=True)
preds = sorted(glob.glob("outputs/0_latest_run/dev.predict.txt"))
if not preds:
    raise SystemExit("no dev.predict.txt written — e2e FAILED")
run_eval(preds[-1], "vlparse")
print("E2E TPU DRIVE OK", flush=True)
