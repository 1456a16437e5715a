"""Realistic-scale training soak on the real TPU: 2,000 sentences,
len 3-14, 2048-d features, 36 boxes, bucketed sampler with multiple
compile shapes, full vlgae recipe (init warmup -> joint epochs).
The right-branching grammar + grounded box-0 signal make both the
parse and the grounding learnable: expect UAS and box/obj to climb.
"""
import os, sys, time, threading
def watchdog():
    time.sleep(5400); print("SOAK WATCHDOG: 90 min cap", flush=True); os._exit(3)
threading.Thread(target=watchdog, daemon=True).start()

os.makedirs("/tmp/soak_tpu", exist_ok=True)
os.chdir("/tmp/soak_tpu")
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
from pathlib import Path
from synth_data import make_corpus
make_corpus(Path("vlparse"), n_imgs=400, feat_dim=2048, n_box=36,
            grammar="right", grounded=True, len_range=(3, 15))
print("corpus done", flush=True)
import train as train_cli
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
print("SOAK TRAIN DONE in", round(time.time()-t0, 1), "s", flush=True)
print("test_result:", test_result, flush=True)
import glob, subprocess
preds = sorted(glob.glob("outputs/0_latest_run/dev.predict.txt"))
if preds:
    r = subprocess.run([sys.executable, "/root/repo/eval.py",
                        "--file", preds[-1], "--dataroot", "vlparse"],
                       capture_output=True, text=True)
    print(r.stdout, r.stderr, flush=True)
print("SOAK OK", flush=True)
