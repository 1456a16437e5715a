"""Same-window A/B: fused kernel with (m,s) adjoint accumulators vs plain.

Usage: python scripts/ab_ms.py {auto|ms0} {len30|len64}

``ms0`` forces the plain logaddexp adjoint representation by pinning the
(m,s)-table selector to 0; ``auto`` uses the production VMEM-driven
choice. One leg per process: a worker crash must not poison the other
legs, and source files stay untouched while legs import them.
"""

import json
import sys


def main():
    mode, leg = sys.argv[1], sys.argv[2]
    sys.path.insert(0, ".")
    import bench

    if mode == "ms0":
        from vlgae_tpu.ops import dmv_pallas as dp

        dp._fused_ms_tables = lambda n1, grid: 0
    if leg == "len30":
        sps, _ = bench.bench_tpu()
    else:
        sps = bench.bench_stretch()
    print(json.dumps({"mode": mode, "leg": leg, "sps": round(sps, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
