"""Standalone same-window timing of the matching-maxes formulations at
reference train-step scale. Default shape is the exp=vlgae joint scale
(A=B=64 images, V=703 compact factors, Q=101 queries = 1+L+L at the
recipe's max_len 50, D=130 features); override any of A/B/Q/V/D/ITERS
via MATCH_AB_<NAME> env vars.

Legs (one per process — worker crashes must not poison other legs):
  pallas_fwd   fused kernel (mask fold: D+2 features), primal only
  pallas_io    fused kernel (mask fold), value_and_grad
  pallasb_fwd  fused kernel, PRODUCTION layout: raw D-width features +
               [A,V]/[B,Q] additive -1e9 bias operands, primal only
  pallasb_io   bias-operand layout, value_and_grad
  xla_fwd      einsum + maxes, primal only
  xla_io       einsum + maxes, value_and_grad
  parity       kernel vs einsum values + one-winner grads on device
  parityb      bias-operand kernel vs post-product bias add on device

The pallas/xla legs take the folded width (D env default 130); the
pallasb/parityb legs drop the two fold columns and contract at D-2
(128 = one lane tile) with the masks riding the bias operands.

Usage: python scripts/match_kernel_ab.py <leg>
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _env(name, default):
    return int(os.environ.get(f"MATCH_AB_{name}", default))


A, B, Q, V, D = (_env("A", 64), _env("B", 64), _env("Q", 101),
                 _env("V", 703), _env("D", 130))
ITERS = _env("ITERS", 128)


def run_parity():
    """Device parity: kernel fwd bit-equals the f32-accumulated einsum
    maxes; bwd routes cotangents to the first argmax winner."""
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.ops.match_pallas import match_maxes_fits, match_maxes_pallas

    assert match_maxes_fits(A, V, D, B, Q), "gate must admit this shape"
    rng = np.random.default_rng(7)
    # bf16-exact quarter-integers: f32 einsum == bf16 GEMM w/ f32 acc
    vis = jnp.asarray(rng.integers(-8, 9, (A, V, D)) * 0.25, jnp.float32)
    txt = jnp.asarray(rng.integers(-8, 9, (B, Q, D)) * 0.25, jnp.float32)
    wm = jnp.asarray(rng.integers(-8, 9, (B, A, Q)) * 0.25, jnp.float32)
    wmv = jnp.asarray(rng.integers(-8, 9, (B, A, V)) * 0.25, jnp.float32)

    @jax.jit
    def kern(v_, t_):
        def loss(v, t):
            m, mv = match_maxes_pallas(v, t)
            return jnp.sum(m * wm) + jnp.sum(mv * wmv), (m, mv)
        (_, (m, mv)), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(v_, t_)
        return m, mv, g

    m, mv, (dvis, dtxt) = jax.tree.map(np.asarray, kern(vis, txt))
    att = np.einsum("avd,bqd->baqv", np.asarray(vis), np.asarray(txt),
                    dtype=np.float32)
    np.testing.assert_array_equal(m, att.max(-1))
    np.testing.assert_array_equal(mv, att.max(-2))
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from oracles import route_one_winner  # shared reference oracle

    want_dvis, want_dtxt = route_one_winner(
        att, np.asarray(wm), np.asarray(wmv), vis, txt)
    np.testing.assert_allclose(dvis, want_dvis, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dtxt, want_dtxt, rtol=1e-5, atol=1e-5)
    print(json.dumps({"leg": "parity", "shape": [A, B, Q, V, D],
                      "ok": True}), flush=True)


def run_parity_bias():
    """Device parity for the bias-operand layout: kernel fwd equals the
    einsum maxes plus post-product [A,V]/[B,Q] bias adds bit-for-bit;
    bwd routes to the biased first argmax winner; bias grads are 0."""
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.ops.match_pallas import match_maxes_fits, match_maxes_pallas

    Db = D - 2   # the raw feature width (the fold adds 2 columns)
    assert match_maxes_fits(A, V, Db, B, Q), "gate must admit this shape"
    rng = np.random.default_rng(7)
    vis = jnp.asarray(rng.integers(-8, 9, (A, V, Db)) * 0.25, jnp.float32)
    txt = jnp.asarray(rng.integers(-8, 9, (B, Q, Db)) * 0.25, jnp.float32)
    vb = jnp.asarray(-1e9 * (rng.random((A, V)) < 0.1), jnp.float32)
    tb = jnp.asarray(-1e9 * (rng.random((B, Q)) < 0.1), jnp.float32)
    wm = jnp.asarray(rng.integers(-8, 9, (B, A, Q)) * 0.25, jnp.float32)
    wmv = jnp.asarray(rng.integers(-8, 9, (B, A, V)) * 0.25, jnp.float32)

    @jax.jit
    def kern(v_, t_):
        def loss(v, t):
            m, mv = match_maxes_pallas(v, t, False, vb, tb)
            return jnp.sum(m * wm) + jnp.sum(mv * wmv), (m, mv)
        (_, (m, mv)), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(v_, t_)
        return m, mv, g

    m, mv, (dvis, dtxt) = jax.tree.map(np.asarray, kern(vis, txt))
    att = (np.einsum("avd,bqd->baqv", np.asarray(vis), np.asarray(txt),
                     dtype=np.float32)
           + np.asarray(vb)[None, :, None, :]
           + np.asarray(tb)[:, None, :, None]).astype(np.float32)
    np.testing.assert_array_equal(m, att.max(-1))
    np.testing.assert_array_equal(mv, att.max(-2))
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    from oracles import route_one_winner

    want_dvis, want_dtxt = route_one_winner(
        att, np.asarray(wm), np.asarray(wmv), vis, txt)
    np.testing.assert_allclose(dvis, want_dvis, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dtxt, want_dtxt, rtol=1e-5, atol=1e-5)
    print(json.dumps({"leg": "parityb", "shape": [A, B, Q, V, Db],
                      "ok": True}), flush=True)


def main():
    leg = sys.argv[1]
    if leg == "parity":
        return run_parity()
    if leg == "parityb":
        return run_parity_bias()
    import jax
    import jax.numpy as jnp

    from vlgae_tpu.ops.match_pallas import match_maxes_pallas

    rng = np.random.default_rng(0)
    Db = D - 2 if leg.startswith("pallasb") else D
    vis = jnp.asarray(rng.standard_normal((A, V, Db)), jnp.bfloat16)
    txt = jnp.asarray(rng.standard_normal((B, Q, Db)), jnp.bfloat16)
    vbias = jnp.asarray(-1e9 * (rng.random((A, V)) < 0.1), jnp.float32)
    tbias = jnp.asarray(-1e9 * (rng.random((B, Q)) < 0.1), jnp.float32)

    def f_pallas(v_, t_):
        m, mv = match_maxes_pallas(v_, t_)
        return jnp.sum(jnp.tanh(m)) + jnp.sum(jnp.tanh(mv))

    def f_pallasb(v_, t_):
        m, mv = match_maxes_pallas(v_, t_, False, vbias, tbias)
        return jnp.sum(jnp.tanh(m)) + jnp.sum(jnp.tanh(mv))

    def f_xla(v_, t_):
        att = jnp.einsum("avd,bqd->baqv", v_, t_,
                         preferred_element_type=jnp.float32)
        return (jnp.sum(jnp.tanh(att.max(-1)))
                + jnp.sum(jnp.tanh(att.max(-2))))

    base = {"pallas": f_pallas, "pallasb": f_pallasb,
            "xla": f_xla}[leg.split("_")[0]]
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
