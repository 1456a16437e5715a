#!/bin/sh
# End-to-end demo on a synthetic VLParse-format corpus:
#   generate data -> train the joint VLGAE model -> dump predictions ->
#   score them with the standalone IoU evaluator.
# Runs on whatever JAX backend is available (TPU or CPU).
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
WORK="${1:-/tmp/vlgae_quickstart}"
mkdir -p "$WORK"
cd "$WORK"

python -c "
import sys; sys.path.insert(0, '$REPO/tests')
import synth_data
synth_data.make_corpus('$WORK/data', n_imgs=8, feat_dim=64, n_box=12,
                       grammar='right', grounded=True)
print('synthetic corpus at $WORK/data')
"

PYTHONPATH="$REPO:$PYTHONPATH" python "$REPO/train.py" exp=vlgae "root=$WORK" \
  datamodule.train_path="$WORK/data/train" \
  datamodule.train_init_path="$WORK/data/init" \
  datamodule.dev_path="$WORK/data/val" \
  datamodule.test_path="$WORK/data/test" \
  datamodule.sg_path="$WORK/data/vlparse.json" \
  datamodule.pad_boxes=12 datamodule.sample_boxes=0 \
  vis_encoder.n_in=64 trainer.max_epochs=3 model.init_epoch=1 \
  _hidden_size=64 _match_hidden_size=32 _rank=8 \
  model.dep_model_cfg.mid_ff.n_bottleneck=16

PYTHONPATH="$REPO:$PYTHONPATH" python "$REPO/eval.py" \
  --file "$WORK/outputs/0_latest_run/dev.predict.txt" \
  --dataroot "$WORK/data"
