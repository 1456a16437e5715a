"""Same-window A/B of the fused fwd+bwd chart kernel vs the fallback.

Usage: python scripts/ab_fused.py {fused|fallback}

Prints one JSON line with inside+outside (value_and_grad) throughput at
the stretch config (len64/b1024) and the headline config (len30/b256),
using bench.py's differential-timing methodology. Run the two modes
back-to-back (same tunnel window) for a meaningful comparison.
"""

import json
import sys

sys.path.insert(0, ".")

import vlgae_tpu.ops.dmv_pallas as dp  # noqa: E402

mode = sys.argv[1] if len(sys.argv) > 1 else "fused"
dp.USE_FUSED = mode == "fused"

import bench  # noqa: E402

out = {"mode": mode, "use_fused": dp.USE_FUSED}
out["len30_b256_sps"] = round(bench.bench_stretch(length=30, batch=256,
                                                  iters=64), 1)
out["len64_b1024_sps"] = round(bench.bench_stretch(length=64, batch=1024,
                                                   iters=16), 1)
print(json.dumps(out), flush=True)
