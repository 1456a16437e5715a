"""Prediction-dumping CLI (ref: /root/reference/test.py).

    python test.py checkpoint=outputs/<run>/checkpoint/best [overrides...]

Loads the run's saved overrides next to the checkpoint, restores params,
runs eval over train/dev/test and writes ``predict_{split}.conll``.
"""

from __future__ import annotations

import json
import os
import sys


def main(argv=None):
    overrides = list(argv if argv is not None else sys.argv[1:])
    from vlgae_tpu.utils.config import ConfigComposer, resolve

    config_dir = os.environ.get(
        "VLGAE_CONFIG_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
    )

    # restore the training run's overrides (ref: test.py:31-54)
    ckpt = None
    rest = []
    for ov in overrides:
        if ov.startswith("checkpoint="):
            ckpt = ov.split("=", 1)[1]
        else:
            rest.append(ov)
    assert ckpt, "pass checkpoint=<path to checkpoint dir>"
    run_dir = os.path.dirname(os.path.dirname(os.path.abspath(ckpt)))
    saved = os.path.join(run_dir, "overrides.json")
    saved_overrides = []
    if os.path.exists(saved):
        with open(saved) as f:
            saved_overrides = json.load(f)
    cfg = resolve(
        ConfigComposer(config_dir).compose(
            "config_train", saved_overrides + rest
        )
    )

    from vlgae_tpu.data import DepDataModule, VLParseDataModule
    from vlgae_tpu.training import Pipeline, build_model

    dm_cfg = dict(cfg["datamodule"])
    target = dm_cfg.pop("_target_", "VLParseDataModule")
    dm_cls = VLParseDataModule if "VLParse" in target else DepDataModule
    dm = dm_cls(**dm_cfg).setup()
    if cfg.get("embedding", {}).get("use_subword"):
        from vlgae_tpu.data.subword import HashSubwordTokenizer, HFTokenizer, attach_subwords

        model_path = (cfg["embedding"].get("transformer", {})
                      .get("args", {}).get("model", ""))
        tok = (HFTokenizer(model_path) if os.path.isdir(str(model_path))
               else HashSubwordTokenizer())
        attach_subwords(dm, tok)

    model = build_model(cfg, dm)
    pipe = Pipeline(model, dm, cfg, workdir=run_dir)
    sample = next(dm.batches("test", shuffle=False))
    pipe.init_state(sample)
    pipe.load_checkpoint(ckpt)

    name = cfg.get("name", "model")
    for split in ("train", "dev", "test"):
        if split not in dm.datasets:
            continue
        result, outputs = pipe.evaluate(split)
        print(json.dumps({f"{split}/{k}": v for k, v in result.items()}))
        pipe.write_predictions(f"{name}_{split}.conll", split, outputs)


if __name__ == "__main__":
    main()
