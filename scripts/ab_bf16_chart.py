"""bf16 chart-storage A/B at the len-64 stretch shape (VERDICT r3 #10).

Times the forward partition (the no-save v3 inside fill, where
CHART_STORE_DTYPE applies) with f32 vs bf16 VMEM-resident charts, and
sweeps the accuracy cost against the f32 fill and the pure-JAX oracle.
One leg per process (VMEM faults crash the worker). Usage:

  python scripts/ab_bf16_chart.py f32|bf16|accuracy [N]
  python scripts/ab_bf16_chart.py          # all legs via subprocesses
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N = int(os.environ.get("AB_BF16_N", "64"))
B = int(os.environ.get("AB_BF16_B", "256"))
ITERS = int(os.environ.get("AB_BF16_ITERS", "16"))


def _fwd_time(dtype_name: str) -> float:
    import jax
    import jax.numpy as jnp

    import bench
    import vlgae_tpu.ops.dmv_pallas as dp

    dp.CHART_STORE_DTYPE = jnp.bfloat16 if dtype_name == "bf16" \
        else jnp.float32
    dec, attach, lengths = map(
        jnp.asarray, bench.make_inputs(B, N, seed=2))

    def make_many(n_it):
        @jax.jit
        def many(d, a, l):
            def body(acc, i):
                return acc + jnp.sum(
                    dp.dmv_partition_pallas(d, a + i * 1e-6, l)
                ), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_it))
            return acc

        return lambda: many(dec, attach, lengths)

    return bench.diff_time(make_many, ITERS, repeats=3) * 1e3


def leg_time(dtype_name: str):
    ms = _fwd_time(dtype_name)
    print(json.dumps({"leg": dtype_name, "N": N, "B": B,
                      "ms_per_fwd": round(ms, 4),
                      "sent_per_sec": round(B / (ms / 1e3))}), flush=True)


def leg_accuracy():
    import jax
    import jax.numpy as jnp

    import bench
    import vlgae_tpu.ops.dmv_pallas as dp
    from vlgae_tpu.struct import LogSemiring, dmv_partition

    out = {"leg": "accuracy", "N": N}
    for n in (12, 30, N):
        dec, attach, lengths = map(
            jnp.asarray, bench.make_inputs(128, n, seed=1))
        want = dmv_partition(dec, attach, lengths, LogSemiring)
        row = {}
        for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            dp.CHART_STORE_DTYPE = dt
            # fresh lambda per dtype: the trace-time flag is invisible
            # to jit's (fun, avals) executable cache
            try:
                got = jax.jit(
                    lambda d, a, l: dp.dmv_partition_pallas(d, a, l)
                )(dec, attach, lengths)
                err = jnp.abs(got - want)
                row[name] = {
                    "abs_max": float(err.max()),
                    "rel_max": float((err / jnp.abs(want)).max()),
                }
            except Exception as e:  # noqa: BLE001 - Mosaic bf16 reject
                row[name] = {"error": f"{type(e).__name__}: "
                             + str(e).splitlines()[0][:160]}
        dp.CHART_STORE_DTYPE = jnp.float32
        out[f"n{n}"] = row
    print(json.dumps(out), flush=True)


def main():
    if len(sys.argv) > 1:
        leg = sys.argv[1]
        if len(sys.argv) > 2:
            global N
            N = int(sys.argv[2])
        if leg == "accuracy":
            return leg_accuracy()
        return leg_time(leg)
    rows = []
    for leg in ("f32", "bf16", "accuracy"):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), leg],
                capture_output=True, text=True, cwd=REPO, timeout=1800,
            )
        except subprocess.TimeoutExpired:
            rows.append({"leg": leg, "error": "timeout"})
            continue
        for line in proc.stdout.splitlines():
            if line.startswith("{"):
                rows.append(json.loads(line))
        if proc.returncode:
            rows.append({"leg": leg,
                         "error": f"exit {proc.returncode}"})
            sys.stderr.write(f"[ab_bf16] {leg} failed:\n"
                             + proc.stderr[-2000:] + "\n")
    print(json.dumps({"summary": rows}), flush=True)


if __name__ == "__main__":
    main()
