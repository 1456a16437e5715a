"""Micro-ablation of decode_grounding_device at recipe scale.

PROFILE_EVAL.md attributes ~65% of the joint eval step to the grounding
decode; this script splits that 5.7 ms between its pieces:

  - _diag_att recompute (one [B,Q,V] batched GEMM + masks)
  - decode_grounding_logits (diag + POS prior + heuristics)
  - jax.lax.top_k(logit, 5) over V
  - factor2img argmax over the [B,A,Q] maxima

Run on the TPU:  python scripts/profile_ground_decode.py
Env: PROFILE_B/L/P/ITERS.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

B = int(os.environ.get("PROFILE_B", "64"))
L = int(os.environ.get("PROFILE_L", "50"))
P = int(os.environ.get("PROFILE_P", "36"))
ITERS = int(os.environ.get("PROFILE_ITERS", "8"))


def main():
    import jax
    import jax.numpy as jnp

    model, inputs, params = bench.make_joint(B, L, P, bf16=False)
    rng = np.random.default_rng(5)
    tnoise = jnp.asarray(
        (rng.standard_normal(4) * 1e-6 + 1e-6).astype(np.float32)
    )

    out_fixed = model.apply(params, inputs, deterministic=True)
    _leaves, _treedef = jax.tree_util.tree_flatten(out_fixed)
    _is_arr = [hasattr(v, "dtype") for v in _leaves]
    out_arrs = [v for v, a in zip(_leaves, _is_arr) if a]

    def rebuild(arrs):
        it = iter(arrs)
        merged = [next(it) if a else v for v, a in zip(_leaves, _is_arr)]
        return jax.tree_util.tree_unflatten(_treedef, merged)

    def vary_out(out, i):
        eps = tnoise[i % 4]
        o = dict(out)
        tp = out["txt_packed"]
        o["txt_packed"] = (tp[0] + eps.astype(tp[0].dtype),) + tuple(tp[1:])
        o["match_logit"] = out["match_logit"] + eps
        return o

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

    rows = []

    def full(p, arrs, x, i):
        o = vary_out(rebuild(arrs), i)
        g = model.apply(p, o, x, method=model.decode_grounding_device)
        return (jnp.sum(g["txt_to_factor_idx"])
                + jnp.sum(g["txt_to_img"])).astype(jnp.float32)

    rows.append(("decode_grounding_device (full)",
                 time_fn(full, params, out_arrs, inputs)))

    def diag_only(p, arrs, x, i):
        o = vary_out(rebuild(arrs), i)
        att = model.apply(p, o, x, False, method=model._diag_att)
        return jnp.sum(att * 1e-9).astype(jnp.float32)

    rows.append(("_diag_att alone ([B,Q,V] GEMM + masks)",
                 time_fn(diag_only, params, out_arrs, inputs)))

    def logits_only(p, arrs, x, i):
        o = vary_out(rebuild(arrs), i)
        lg = model.apply(p, o, x, method=model.decode_grounding_logits)
        return jnp.sum(lg * 1e-9).astype(jnp.float32)

    rows.append(("decode_grounding_logits (diag + prior + heuristics)",
                 time_fn(logits_only, params, out_arrs, inputs)))

    # fixed post-edit logits for the top_k-alone leg
    lg_fixed = model.apply(params, out_fixed, inputs,
                           method=model.decode_grounding_logits)

    def topk_only(lg, i):
        l2 = lg + tnoise[i % 4]
        _, idx = jax.lax.top_k(l2, 5)
        return jnp.sum(idx).astype(jnp.float32)

    rows.append(("jax.lax.top_k(logit, 5) alone",
                 time_fn(topk_only, lg_fixed)))

    def argmax_only(arrs, i):
        o = vary_out(rebuild(arrs), i)
        m = o["match_logit"]
        m = m if m.ndim == 3 else m.max(-1)
        return jnp.sum(m.argmax(1)).astype(jnp.float32)

    rows.append(("factor2img argmax over [B,A,Q]",
                 time_fn(argmax_only, out_arrs)))

    dt_full = rows[0][1]
    print(f"\nB={B} L={L} P={P} device="
          f"{jax.devices()[0].device_kind}")
    print("| piece | ms | share |")
    print("|---|---|---|")
    for name, dt in rows:
        print(f"| {name} | {dt * 1e3:.3f} | {100 * dt / dt_full:.0f}% |")


if __name__ == "__main__":
    main()
