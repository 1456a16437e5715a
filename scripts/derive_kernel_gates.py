"""Re-derive the device-tuned kernel gate constants on the attached
device and print recommended values.

The shipped constants were measured on a v5e through the axon tunnel
(see the definitions for their provenance); on a different part (v4,
next-gen) re-run this script and update:

  - ``vlgae_tpu.ops.dmv_pallas.MS_COMBINE_MIN_N1`` — chart size above
    which the outside pass keeps channel combines in (m, s) form,
  - ``vlgae_tpu.ops.match_pallas._VMEM_BUDGET`` — per-grid-step VMEM
    budget that sizes the matching kernel's q-blocks,
  - the fused/v3/outside launch caps in ``dmv_pallas`` (validated, not
    re-fit: they derive from per-shape VMEM formulas whose only free
    constant is the budget).

Every probe runs in a SUBPROCESS: a mis-sized kernel faults VMEM and
crashes the worker process (which restarts, cheaply — see
.claude/skills/verify/SKILL.md's TPU rules), and the driver must
survive that. Usage:

  python scripts/derive_kernel_gates.py            # full derivation
  python scripts/derive_kernel_gates.py ms 31      # one probe leg
  python scripts/derive_kernel_gates.py match_budget 56
  python scripts/derive_kernel_gates.py launch 65
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MS_PROBE_N1 = (31, 40, 48, 56, 65)
MATCH_BUDGET_MB = (32, 48, 56, 64, 80)
LAUNCH_N1 = (31, 65)
ITERS = int(os.environ.get("DERIVE_ITERS", "24"))
BATCH = int(os.environ.get("DERIVE_BATCH", "256"))


def _time_inside_outside(n1: int) -> float:
    """ms per inside-outside (value_and_grad of the partition) at n1."""
    import jax
    import jax.numpy as jnp

    import bench
    from vlgae_tpu.ops.dmv_pallas import dmv_partition_pallas

    N = n1 - 1
    dec, attach, lengths = bench.make_inputs(BATCH, N)
    dec, attach, lengths = (jnp.asarray(x) for x in (dec, attach, lengths))

    def io(d, a, l):
        return jax.value_and_grad(
            lambda aa: dmv_partition_pallas(d, aa, l).sum()
        )(a)

    def make_many(n_it):
        @jax.jit
        def many(d, a, l):
            def body(acc, i):
                v, g = io(d, a + i * 1e-6, l)
                return acc + v + g.sum(), None

            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_it))
            return acc

        return lambda: many(dec, attach, lengths)

    return bench.diff_time(make_many, ITERS, repeats=3) * 1e3


def leg_ms(n1: int):
    """A/B the (m,s)-combine gate at one chart size: forced ON vs OFF."""
    import vlgae_tpu.ops.dmv_pallas as dp

    out = {"leg": "ms", "n1": n1}
    for mode, gate in (("on", 0), ("off", 1 << 30)):
        dp.MS_COMBINE_MIN_N1 = gate  # read at trace time inside _outside_fill
        out[f"ms_{mode}"] = round(_time_inside_outside(n1), 4)
    out["winner"] = "on" if out["ms_on"] <= out["ms_off"] else "off"
    print(json.dumps(out), flush=True)


def leg_match_budget(mb: int):
    """Compile + run the matching kernel fwd+bwd at the recipe shape
    with the given VMEM budget (which sizes the q-blocks)."""
    import jax
    import jax.numpy as jnp

    import vlgae_tpu.ops.match_pallas as mp

    mp._VMEM_BUDGET = mb * 1024 * 1024
    A, B, Q, V, D = 64, 64, 101, 703, 130  # exp=vlgae joint scale
    plan = mp._plan(V, D, B, Q)
    if plan is None:
        print(json.dumps({"leg": "match_budget", "mb": mb, "ok": False,
                          "reason": "no legal q-block"}), flush=True)
        return
    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.standard_normal((A, V, D)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((B, Q, D)), jnp.bfloat16)

    @jax.jit
    def f(v_, t_):
        def loss(v, t):
            m, mv = mp.match_maxes_pallas(v, t)
            return jnp.sum(m) + jnp.sum(mv)

        return jax.value_and_grad(loss, argnums=(0, 1))(v_, t_)

    val, grads = f(vis, txt)
    ok = bool(np.isfinite(float(val)))
    print(json.dumps({"leg": "match_budget", "mb": mb, "ok": ok,
                      "blkQ": int(plan[0]), "nQB": int(plan[1])}),
          flush=True)


def leg_launch(n1: int):
    """Validate the derived launch caps: run a partition+grad at the
    cap the VMEM formulas pick for this chart size."""
    import jax
    import jax.numpy as jnp

    import bench
    import vlgae_tpu.ops.dmv_pallas as dp

    caps = {
        "fused": dp._fused_max_launch(n1),
        "v3_save": dp._v3_max_launch(n1, save=True),
        "outside": dp._outside_max_launch(n1),
    }
    B = max((v for v in caps.values() if v), default=dp._MAX_LAUNCH_B)
    N = n1 - 1
    dec, attach, lengths = bench.make_inputs(B, N)
    val, g = jax.jit(
        lambda d, a, l: jax.value_and_grad(
            lambda aa: dp.dmv_partition_pallas(d, aa, l).sum()
        )(a)
    )(jnp.asarray(dec), jnp.asarray(attach), jnp.asarray(lengths))
    ok = bool(np.isfinite(float(val))
              and np.all(np.isfinite(np.asarray(g))))
    print(json.dumps({"leg": "launch", "n1": n1, "caps": caps,
                      "ran_at_B": int(B), "ok": ok}), flush=True)


def _run_leg(*args) -> dict | None:
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), *map(str, args)],
            capture_output=True, text=True, cwd=REPO,
            timeout=int(os.environ.get("DERIVE_LEG_TIMEOUT", "900")),
        )
    except subprocess.TimeoutExpired:
        sys.stderr.write(f"[derive] leg {args} timed out\n")
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(
        f"[derive] leg {args} failed (exit {proc.returncode}):\n"
        + proc.stderr[-2000:] + "\n"
    )
    return None


def main():
    if len(sys.argv) > 1:
        leg = sys.argv[1]
        if leg == "ms":
            return leg_ms(int(sys.argv[2]))
        if leg == "match_budget":
            return leg_match_budget(int(sys.argv[2]))
        if leg == "launch":
            return leg_launch(int(sys.argv[2]))
        raise SystemExit(f"unknown leg {leg!r}")

    import jax

    dev = jax.devices()[0]
    print(f"# deriving kernel gates on: {dev.device_kind}", flush=True)

    ms_rows = [r for n1 in MS_PROBE_N1 if (r := _run_leg("ms", n1))]
    on_n1 = [r["n1"] for r in ms_rows if r["winner"] == "on"]
    off_n1 = [r["n1"] for r in ms_rows if r["winner"] == "off"]
    if on_n1 and (not off_n1 or min(on_n1) > max(off_n1)):
        lo = max(off_n1) if off_n1 else 0
        rec_ms = (lo + min(on_n1) + 1) // 2
    elif on_n1:
        rec_ms = min(on_n1)  # noisy crossover: earliest on-win
    else:
        rec_ms = 1 << 30  # (m,s) never wins here: disable

    budgets = [r for mb in MATCH_BUDGET_MB
               if (r := _run_leg("match_budget", mb))]
    ok_mb = [r["mb"] for r in budgets if r.get("ok")]
    rec_budget = max(ok_mb) if ok_mb else None

    launches = [r for n1 in LAUNCH_N1 if (r := _run_leg("launch", n1))]
    launch_ok = all(r.get("ok") for r in launches) and bool(launches)

    print(json.dumps({
        "device": dev.device_kind,
        "recommended": {
            "dmv_pallas.MS_COMBINE_MIN_N1": rec_ms,
            "match_pallas._VMEM_BUDGET_MB": rec_budget,
            "launch_caps_validated": launch_ok,
        },
        "probes": {"ms": ms_rows, "match_budget": budgets,
                   "launch": launches},
    }), flush=True)


if __name__ == "__main__":
    main()
