"""Generate the eval.py proposal-boxes json for a ViT-swap run.

Under ``exp=vlgae_vit`` the visual "boxes" are the ViT patch
rectangles (identical grid for every image), so the standalone
grounding evaluator just needs a ``dev_roi_boxes.json`` mapping every
image id to that grid:

    python scripts/make_patch_roi_boxes.py --dataroot data/vlparse \
        --split val --image-size 224 --patch-size 32

writes ``<dataroot>/dev_roi_boxes.json`` (or ``--out``), after which
``eval.py --file <run>/dev.predict.txt --dataroot <dataroot>`` scores
ViT-swap predictions unchanged.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vlgae_tpu.models.vis_encoder import patch_boxes  # noqa: E402


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataroot", required=True)
    ap.add_argument("--split", default="val")
    ap.add_argument("--image-size", type=int, default=224)
    ap.add_argument("--patch-size", type=int, default=32)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    with open(os.path.join(args.dataroot, "id_list",
                           f"{args.split}.txt")) as f:
        img_ids = sorted({int(line.strip()) for line in f if line.strip()})
    grid = patch_boxes(args.image_size, args.patch_size).tolist()
    out = args.out or os.path.join(args.dataroot, "dev_roi_boxes.json")
    with open(out, "w") as f:
        json.dump({str(i): grid for i in img_ids}, f)
    print(f"wrote {out}: {len(img_ids)} images x {len(grid)} patch boxes")
    return out


if __name__ == "__main__":
    main()
