"""Multi-PROCESS collective paths, executed with real process_count > 1.

Round-3 verdict: the ``jax.process_count() > 1`` branches of
``sum_across_processes`` / ``gather_predictions``
(``parallel/mesh.py``) had only ever run as identities. Here two
``jax.distributed`` CPU processes execute them for real and their
merged predictions/metrics must equal a single-process run over the
union of the per-rank shards (ref: src/pipeline.py:234-240,
src/utility/metric.py:21-26).
"""

import json
import os
import socket
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVE = os.path.join(ROOT, "scripts", "multiprocess_drive.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(rank, procs, coord, out):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # no TPU tunnel in workers
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, DRIVE, "--rank", str(rank), "--procs",
         str(procs), "--coord", coord, "--out", out],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        cwd=ROOT, text=True,
    )


@pytest.mark.slow
def test_two_process_gather_matches_single(tmp_path):
    coord = f"localhost:{_free_port()}"
    outs = [str(tmp_path / f"rank{r}.json") for r in range(2)]
    procs = [_spawn(r, 2, coord, outs[r]) for r in range(2)]
    for r, p in enumerate(procs):
        try:
            stdout, stderr = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {r} timed out")
        assert p.returncode == 0, (
            f"rank {r} failed:\n{stdout}\n{stderr[-4000:]}"
        )

    # single-process reference over the union of the shards
    single = str(tmp_path / "single.json")
    p = _spawn(0, 1, "", single)
    stdout, stderr = p.communicate(timeout=420)
    assert p.returncode == 0, stderr[-4000:]
    ref = json.load(open(single))

    results = [json.load(open(o)) for o in outs]
    for res in results:
        assert res["process_count"] == 2
        # every rank sees the same merged, full prediction set
        assert res["merged_ids"] == ref["merged_ids"] == list(range(24))
        assert res["prediction_text"] == ref["prediction_text"]
        # metric states were summed over processes before compute
        assert res["scores"] == pytest.approx(ref["scores"])
