"""E2E CLI drive of the production train.py on the real TPU (tunnel).

Tiny synthetic VLParse corpus, 1 bucket, 3 epochs (1 init + 2 joint),
then eval.py scoring of the written predictions. Validates the full
production path (datamodule, jitted sharded steps, async host loop,
eval dispatch-ahead, checkpointing, prediction writer, evaluator) on
hardware for the first time.
"""
import os, sys, time, threading
def watchdog():
    time.sleep(3600)
    print("E2E WATCHDOG: 60 min cap hit", flush=True); os._exit(3)
threading.Thread(target=watchdog, daemon=True).start()

os.chdir("/tmp/e2e_tpu")
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from pathlib import Path
from synth_data import make_corpus
corpus = make_corpus(Path("vlparse"), n_imgs=8, feat_dim=64, n_box=8)
import train as train_cli
t0 = time.time()
pipe, test_result = train_cli.main([
    "exp=vlgae", "root=.",
    "datamodule.train_path=vlparse/train",
    "datamodule.train_init_path=vlparse/init",
    "datamodule.dev_path=vlparse/val",
    "datamodule.test_path=vlparse/test",
    "datamodule.sg_path=vlparse/vlparse.json",
    "datamodule.pad_boxes=8", "datamodule.sample_boxes=6",
    "datamodule.train_dataloader.batch_size=8",
    "datamodule.train_dataloader.num_bucket=1",
    "datamodule.dev_dataloader.num_bucket=1",
    "datamodule.dev_dataloader.batch_size=8",
    "datamodule.test_dataloader.num_bucket=1",
    "datamodule.test_dataloader.batch_size=8",
    "trainer.max_epochs=3", "model.init_epoch=1",
    "embedding.use_subword=false", "embedding.use_word=true",
    "_hidden_size=64", "_match_hidden_size=32", "_rank=8",
    "vis_encoder.n_in=64", "vis_encoder.n_hidden=64",
])
print("TRAIN DONE in", round(time.time()-t0, 1), "s", flush=True)
print("test_result:", test_result, flush=True)
import glob, subprocess
preds = sorted(glob.glob("outputs/**/dev.predict.txt", recursive=True))
print("prediction files:", preds, flush=True)
if preds:
    r = subprocess.run([sys.executable, "/root/repo/eval.py",
                        "--file", preds[-1], "--dataroot", "vlparse"],
                       capture_output=True, text=True)
    print(r.stdout, r.stderr, flush=True)
print("E2E TPU DRIVE OK", flush=True)
