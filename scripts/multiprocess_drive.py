"""Exercise the multi-PROCESS branches of ``parallel/mesh.py`` for real.

Launched once per rank under ``jax.distributed`` (CPU backend), this
drives the exact code paths the single-controller suite can only take
as identities (``jax.process_count() == 1``):

  * ``sum_across_processes`` — torchmetrics ``dist_reduce_fx='sum'``
    counterpart (ref: src/utility/metric.py:21-26), here applied to a
    real ``DependencyParsingMetric`` state vector via ``metric.sync``,
  * ``gather_predictions`` — the ``all_gather_object`` + merge path
    (ref: src/pipeline.py:234-240, src/utility/fn.py:166-175) on
    per-rank disjoint id->record dicts of uneven pickled sizes,
  * prediction writing from the merged dict.

Each rank writes a JSON result; the test compares every rank's merged
view against a single-process run over the union of the shards.

Usage (one process per rank):
    python scripts/multiprocess_drive.py --rank R --procs N \
        --coord localhost:PORT --out OUT.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rank_shard(rank: int, procs: int):
    """Deterministic per-rank eval shard: disjoint sample ids, ragged
    record payloads (uneven pickle sizes exercise the padded gather)."""
    import numpy as np

    rng = np.random.default_rng(1234)  # same stream on every rank
    shard_preds = {}
    shard_golds = {}
    for sid in range(24):
        n = int(rng.integers(2, 7))
        arc = rng.integers(0, n + 1, n).tolist()
        gold = [a if rng.random() < 0.7 else int((a + 1) % (n + 1))
                for a in arc]
        if sid % procs == rank:
            shard_preds[sid] = {"arc": arc,
                                "txt_to_factor": [[("o", sid % 5)]] * n}
            shard_golds[sid] = gold
    return shard_preds, shard_golds


def run(rank: int, procs: int) -> dict:
    import numpy as np

    from vlgae_tpu.parallel import gather_predictions, sum_across_processes
    from vlgae_tpu.training.metrics import DependencyParsingMetric

    preds, golds = rank_shard(rank, procs)
    metric = DependencyParsingMetric()
    for sid, rec in preds.items():
        arc = np.asarray([rec["arc"]])
        gold = np.asarray([golds[sid]])
        metric.update({"arc": arc}, {"arc": gold},
                      np.ones_like(arc, bool))
    metric.sync(sum_across_processes)
    scores = {k: float(v) for k, v in metric.compute().items()}

    merged = gather_predictions(preds)
    lines = [
        f"{sid} {' '.join(map(str, merged[sid]['arc']))}"
        for sid in sorted(merged)
    ]
    return {
        "rank": rank,
        "process_count": procs,
        "scores": scores,
        "merged_ids": sorted(merged),
        "prediction_text": "\n".join(lines),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rank", type=int, required=True)
    ap.add_argument("--procs", type=int, required=True)
    ap.add_argument("--coord", default="")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if a.procs > 1:
        jax.distributed.initialize(
            coordinator_address=a.coord,
            num_processes=a.procs,
            process_id=a.rank,
        )
        assert jax.process_count() == a.procs, jax.process_count()

    result = run(a.rank, a.procs)
    with open(a.out, "w", encoding="utf-8") as f:
        json.dump(result, f)
    print(f"rank {a.rank}: ok", flush=True)


if __name__ == "__main__":
    main()
