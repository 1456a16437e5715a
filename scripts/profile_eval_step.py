"""Cost breakdown of the batched joint eval/decode step on the device.

The `joint_decode` bench leg (bench.bench_joint_decode, BASELINE #4's
batched-decode half) measures: deterministic forward + MBR dependency
decode + map-free grounding decode at recipe scale. This script ablates
that step to attribute its cost:

  - deterministic forward alone (embeddings + encoder + DMV scorer +
    vis encoder + lang_feat DPs + eval-mode matching)
  - deterministic forward, text-only inputs (matching + vis skipped)
  - decode-only on a fixed forward `out` (ldndmv_decode mbr +
    decode_grounding_device)
  - grounding decode alone (diag [B,Q,V] recompute + heuristics + topk)

Every variant perturbs exactly the tensors it reads per scan iteration:
XLA's while-loop invariant code motion would otherwise hoist a
fixed-input computation out of the timing loop entirely.

Writes PROFILE_OUT (default PROFILE_EVAL.md). Run on the TPU:
    python scripts/profile_eval_step.py
Env: PROFILE_B/L/P/ITERS as in profile_train_step.py; PROFILE_BF16=1
for the bf16/kernel configuration (default f32, as the bench leg runs).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (diff_time, make_joint)

B = int(os.environ.get("PROFILE_B", "64"))
L = int(os.environ.get("PROFILE_L", "50"))
P = int(os.environ.get("PROFILE_P", "36"))
ITERS = int(os.environ.get("PROFILE_ITERS", "8"))
BF16 = bool(int(os.environ.get("PROFILE_BF16", "0")))


def main():
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.models import ldndmv_decode

    model, inputs, params = bench.make_joint(B, L, P, bf16=BF16)
    txt_inputs = {k: v for k, v in inputs.items()
                  if not k.startswith("vis_")}
    rng = np.random.default_rng(5)
    noise = jnp.asarray(
        rng.standard_normal((4, B, P, 2048)).astype(np.float32) * 0.01
    )
    tnoise = jnp.asarray(
        (rng.standard_normal(4) * 1e-6 + 1e-6).astype(np.float32)
    )

    def time_fn(fn, *args):
        def make_many(n_it):
            @jax.jit
            def many(args):
                def body(acc, i):
                    return acc + fn(*args, i), None

                acc, _ = jax.lax.scan(
                    body, jnp.zeros((), jnp.float32), jnp.arange(n_it)
                )
                return acc

            return lambda: many(args)

        return bench.diff_time(make_many, ITERS, repeats=5)

    def vary(x, i):
        xi = dict(x)
        xi["vis_box_feat"] = x["vis_box_feat"] + noise[i % 4]
        return xi

    def vary_params(p, i):
        eps = tnoise[i % 4]
        return jax.tree_util.tree_map(
            lambda v: v + eps.astype(v.dtype) if v.dtype.kind == "f" else v,
            p,
        )

    def vary_out(out, i, dep=True, ground=True):
        """Perturb the tensors the decode variants read."""
        eps = tnoise[i % 4]
        o = dict(out)
        if dep:
            dr = out.get("dep_reuse")
            if dr is not None:
                o["dep_reuse"] = {
                    k: tuple(v[:2]) + (v[2] + eps,) + tuple(v[3:])
                    for k, v in dr.items()
                }
            else:
                o["merged_attach"] = out["merged_attach"] + eps
        if ground:
            tp = out["txt_packed"]
            o["txt_packed"] = (tp[0] + eps.astype(tp[0].dtype),) + tuple(
                tp[1:])
            o["match_logit"] = out["match_logit"] + eps
        return o

    def fsum(tree):
        return sum(
            jnp.sum(v).astype(jnp.float32) * 1e-6
            for v in jax.tree_util.tree_leaves(tree)
            if hasattr(v, "dtype") and v.dtype.kind == "f"
        )

    rows = []

    # 1. the full eval step, exactly as the bench leg runs it
    def full_step(p, x, i):
        xi = vary(x, i)
        out = model.apply(p, xi, deterministic=True)
        heads = ldndmv_decode(out, xi["seq_len"], mbr=True)
        g = model.apply(p, out, xi, method=model.decode_grounding_device)
        return (jnp.sum(heads) + jnp.sum(g["txt_to_factor_idx"])
                + jnp.sum(g["txt_to_img"])).astype(jnp.float32)

    dt_full = time_fn(full_step, params, inputs)
    rows.append(("full eval step (fwd + MBR dep decode + grounding decode)",
                 dt_full))

    # 2. deterministic forward alone
    def fwd_only(p, x, i):
        out = model.apply(p, vary(x, i), deterministic=True)
        return fsum(out)

    dt_fwd = time_fn(fwd_only, params, inputs)
    rows.append(("deterministic forward alone", dt_fwd))

    # 3. forward on text-only inputs: matching + vis encoder + lang_feat
    #    all skipped (has_vis=False). Inputs are integer ids, so the
    #    per-iteration variation goes through the params instead.
    def fwd_txt(p, x, i):
        out = model.apply(vary_params(p, i), x, deterministic=True)
        return fsum(out)

    dt_txt = time_fn(fwd_txt, params, txt_inputs)
    rows.append(("deterministic forward, text-only inputs "
                 "(matching + vis + lang_feat skipped)", dt_txt))

    # 4. decode-only on a fixed forward out. `out` holds static
    # metadata (vis_split python ints) that jit would turn into traced
    # arrays, breaking the decode's static slicing downstream — so the
    # array leaves travel as jit args and the static leaves are
    # reattached from the closure inside the trace.
    out_fixed = model.apply(params, inputs, deterministic=True)
    _leaves, _treedef = jax.tree_util.tree_flatten(out_fixed)
    _is_arr = [hasattr(v, "dtype") for v in _leaves]
    out_arrs = [v for v, a in zip(_leaves, _is_arr) if a]

    def rebuild(arrs):
        it = iter(arrs)
        merged = [next(it) if a else v for v, a in zip(_leaves, _is_arr)]
        return jax.tree_util.tree_unflatten(_treedef, merged)

    def dec_only(p, arrs, x, i):
        o = vary_out(rebuild(arrs), i)
        heads = ldndmv_decode(o, x["seq_len"], mbr=True)
        g = model.apply(p, o, x, method=model.decode_grounding_device)
        return (jnp.sum(heads) + jnp.sum(g["txt_to_factor_idx"])
                + jnp.sum(g["txt_to_img"])).astype(jnp.float32)

    dt_dec = time_fn(dec_only, params, out_arrs, inputs)
    rows.append(("decode only, fixed forward out "
                 "(MBR dep + grounding decode)", dt_dec))

    # 5. MBR dependency decode alone
    def dep_dec_only(arrs, x, i):
        o = vary_out(rebuild(arrs), i, ground=False)
        heads = ldndmv_decode(o, x["seq_len"], mbr=True)
        return jnp.sum(heads).astype(jnp.float32)

    dt_dep = time_fn(dep_dec_only, out_arrs, inputs)
    rows.append(("MBR dependency decode alone", dt_dep))

    # 6. grounding decode alone (diag recompute + POS prior + heuristics
    #    + top-k)
    def ground_only(p, arrs, x, i):
        o = vary_out(rebuild(arrs), i, dep=False)
        g = model.apply(p, o, x, method=model.decode_grounding_device)
        return (jnp.sum(g["txt_to_factor_idx"])
                + jnp.sum(g["txt_to_img"])).astype(jnp.float32)

    dt_ground = time_fn(ground_only, params, out_arrs, inputs)
    rows.append(("grounding decode alone (diag [B,Q,V] + heuristics + topk)",
                 dt_ground))

    dev = None
    try:
        dev = jax.devices()[0].device_kind
    except Exception:
        pass
    rep = ["# Joint eval/decode cost breakdown (measured on device)", ""]
    rep.append(
        f"Batch {B}, len {L}, {P} boxes; "
        f"{'bf16/kernel' if BF16 else 'f32/streamed'} matching; "
        f"device: {dev}."
    )
    rep.append(f"Differential timing over jitted {ITERS}-iteration scans "
               "(see bench.py).")
    rep.append("")
    rep.append("| component | ms/batch | sent/s | share of full |")
    rep.append("|---|---|---|---|")
    for name, dt in rows:
        rep.append(
            f"| {name} | {dt * 1e3:.2f} | {B / dt:,.0f} | "
            f"{100 * dt / dt_full:.0f}% |"
        )
    rep.append("")
    rep.append(
        "Derived attribution: matching + vis + lang_feat DPs (fwd − "
        f"text-only fwd) ≈ {(dt_fwd - dt_txt) * 1e3:.2f} ms; decode tail "
        f"(full − fwd) ≈ {(dt_full - dt_fwd) * 1e3:.2f} ms."
    )
    rep.append("")
    report = "\n".join(rep)
    path = os.environ.get("PROFILE_OUT") or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PROFILE_EVAL.md",
    )
    with open(path, "w") as f:
        f.write(report)
    print(report)


if __name__ == "__main__":
    main()
