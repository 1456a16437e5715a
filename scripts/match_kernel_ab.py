"""Standalone same-window timing of the matching-maxes formulations at
reference train-step scale (A=B=64 images, V=703 compact factors,
Q=22 queries, D=130 features).

Legs (one per process — worker crashes must not poison other legs):
  pallas_fwd   fused kernel, primal only
  pallas_io    fused kernel, value_and_grad
  xla_fwd      einsum + maxes, primal only
  xla_io       einsum + maxes, value_and_grad

Usage: python scripts/match_kernel_ab.py <leg>
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

A, B, Q, V, D = 64, 64, 22, 703, 130
ITERS = 128


def main():
    leg = sys.argv[1]
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.ops.match_pallas import match_maxes_pallas

    rng = np.random.default_rng(0)
    vis = jnp.asarray(rng.standard_normal((A, V, D)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((B, Q, D)), jnp.bfloat16)

    def f_pallas(v_, t_):
        m, mv = match_maxes_pallas(v_, t_)
        return jnp.sum(jnp.tanh(m)) + jnp.sum(jnp.tanh(mv))

    def f_xla(v_, t_):
        att = jnp.einsum("avd,bqd->baqv", v_, t_,
                         preferred_element_type=jnp.float32)
        return (jnp.sum(jnp.tanh(att.max(-1)))
                + jnp.sum(jnp.tanh(att.max(-2))))

    base = {"pallas": f_pallas, "xla": f_xla}[leg.split("_")[0]]
    if leg.endswith("_io"):
        def fn(v_, t_):
            val, grads = jax.value_and_grad(base, argnums=(0, 1))(v_, t_)
            return val + sum(jnp.sum(x).astype(jnp.float32)
                             for x in grads)
    elif leg.endswith("_fwd"):
        fn = base
    else:
        raise SystemExit(f"unknown leg {leg!r}")

    def make_many(n_it):
        @jax.jit
        def many(v_, t_):
            def body(acc, i):
                return acc + fn(v_ + jnp.asarray(i, v_.dtype) * 1e-6,
                                t_), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_it))
            return acc

        return lambda: many(vis, txt)

    dt = bench.diff_time(make_many, ITERS, repeats=3)
    print(json.dumps({"leg": leg, "ms": round(dt * 1e3, 3)}), flush=True)


if __name__ == "__main__":
    main()
