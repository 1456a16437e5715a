"""Hardware parity sweep: every production kernel path vs its pure-JAX oracle,
run on the real TPU backend.

Run this after any kernel/dispatch change that landed while only CPU testing
was available (the interpret-mode tests catch logic bugs, but Mosaic
compilation, VMEM layout, and the (m,s) fast paths only exist on hardware).

Covers (30 checks + the round-4/5 extensions):
  - log-semiring inside (partition) fwd at N in {10, 30, 47, 48, 64}
    (both sides of MS_COMBINE_MIN_N1, the v3-fill gate boundary, and the
    stretch shape)
  - value_and_grad through the fused fwd+bwd kernel (default path) AND the
    save-charts + standalone-outside fallback (USE_FUSED=False)
  - max-semiring fwd + argmax-indicator grads
  - mixed lengths (ragged masking on device)
  - the fused matching kernel fwd + bwd vs the f32 einsum oracle
  - round-4/5: the BIAS-OPERAND matching kernel (mask biases as [A,V] /
    [B,Q] operands, blocked q-grid) at recipe/stretch/soak shapes
  - round-4/5: the dep_reuse straight-through linearization of the joint
    dependency loss — value + parameter grads + decode vs the fresh-DP
    formulation, on device, in both the f32 and bf16(kernel) configs
  - round-4/5: match_maxes_pallas_sharded single-chip reduction under a
    registered 1-device data mesh (== the unsharded kernel == oracle)
Prints PASS/FAIL per leg and exits nonzero on any failure.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from vlgae_tpu.ops import dmv_pallas as dp
from vlgae_tpu.ops import (
    dmv_max_pallas,
    dmv_partition_pallas,
    match_maxes_pallas,
)
from vlgae_tpu.struct import LogSemiring, MaxSemiring, dmv_marginals, dmv_partition

FAILS = []


def check(name, got, want, tol):
    got = np.asarray(got)
    want = np.asarray(want)
    err = float(np.abs(got - want).max()) if got.size else 0.0
    ok = np.isfinite(err) and err <= tol
    print(f"[{'PASS' if ok else 'FAIL'}] {name}: max abs err {err:.3e} (tol {tol:g})",
          flush=True)
    if not ok:
        FAILS.append(name)


def dmv_case(N, B, seed, mixed_lengths=True):
    rng = np.random.default_rng(seed)
    dec = jnp.asarray(rng.standard_normal((B, N + 1, 2, 2, 2)), jnp.float32)
    attach = jnp.asarray(rng.standard_normal((B, N + 1, N + 1, 2)), jnp.float32)
    if mixed_lengths:
        lengths = jnp.asarray(rng.integers(max(2, N // 2), N + 1, B), jnp.int32)
    else:
        lengths = jnp.full((B,), N, jnp.int32)
    return dec, attach, lengths


def run_dmv_leg(N, B, seed):
    dec, attach, lengths = dmv_case(N, B, seed)
    # oracle (pure-JAX scan, CPU-validated layer)
    want_z = dmv_partition(dec, attach, lengths, LogSemiring)
    _, want_g = dmv_marginals(dec, attach, lengths, LogSemiring)
    want_zmax = dmv_partition(dec, attach, lengths, MaxSemiring)

    got_z = dmv_partition_pallas(dec, attach, lengths)
    check(f"N={N} log fwd", got_z, want_z, 2e-4 * max(1, N // 16))

    def loss(a):
        return jnp.sum(dmv_partition_pallas(dec, a, lengths))

    v, g = jax.value_and_grad(loss)(attach)
    check(f"N={N} log bwd (fused={dp.USE_FUSED})", g, want_g, 5e-4 * max(1, N // 16))

    got_zm = dmv_max_pallas(dec, attach, lengths)
    check(f"N={N} max fwd", got_zm, want_zmax, 1e-5)

    gm = jax.grad(lambda a: jnp.sum(dmv_max_pallas(dec, a, lengths)))(attach)
    _, want_gm = dmv_marginals(dec, attach, lengths, MaxSemiring)
    check(f"N={N} max bwd (argmax indicators)", gm, want_gm, 1e-5)


def run_fallback_leg(N, B, seed):
    dec, attach, lengths = dmv_case(N, B, seed)
    _, want_g = dmv_marginals(dec, attach, lengths, LogSemiring)
    saved = dp.USE_FUSED
    dp.USE_FUSED = False
    try:
        g = jax.grad(
            lambda a: jnp.sum(dmv_partition_pallas(dec, a, lengths))
        )(attach)
        check(f"N={N} log bwd save-charts fallback", g, want_g,
              5e-4 * max(1, N // 16))
    finally:
        dp.USE_FUSED = saved


def run_match_leg(A, B, Q, V, D, seed):
    rng = np.random.default_rng(seed)
    vis = jnp.asarray(rng.standard_normal((A, V, D)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, Q, D)), jnp.float32)

    def oracle(vis_b, txt_b):
        att = jnp.einsum("bqd,avd->baqv", txt_b, vis_b,
                         preferred_element_type=jnp.float32)
        return att.max(axis=3), att.max(axis=2)

    def loss_k(v_, t_):
        mq, mv = match_maxes_pallas(v_, t_)
        return jnp.sum(jnp.tanh(mq)) + jnp.sum(jnp.tanh(mv))

    def loss_o(v_, t_):
        mq, mv = oracle(v_, t_)
        return jnp.sum(jnp.tanh(mq)) + jnp.sum(jnp.tanh(mv))

    (mq, mv) = match_maxes_pallas(vis, txt)
    (wq, wv) = oracle(vis, txt)
    check(f"match A{A}B{B}Q{Q}V{V} fwd q-max", mq, wq, 1e-5)
    check(f"match A{A}B{B}Q{Q}V{V} fwd v-max", mv, wv, 1e-5)

    gk = jax.grad(loss_k, argnums=(0, 1))(vis, txt)
    go = jax.grad(loss_o, argnums=(0, 1))(vis, txt)
    # ties are measure-zero with continuous random inputs; argmax routing
    # and XLA's max-grad should agree exactly here
    check(f"match A{A}B{B}Q{Q}V{V} bwd vis", gk[0], go[0], 1e-4)
    check(f"match A{A}B{B}Q{Q}V{V} bwd txt", gk[1], go[1], 1e-4)


def run_match_bias_leg(A, B, Q, V, D, seed, label=""):
    """Round-4 bias-operand kernel: the -1e9 visibility masks ride as
    [A, V] / [B, Q] additive bias OPERANDS into the fused kernel
    (ops/match_pallas.py); compare fwd maxes + routed grads against the
    biased f32 einsum oracle at production shapes."""
    from vlgae_tpu.ops.match_pallas import match_maxes_fits

    if not match_maxes_fits(A, V, D, B, Q):
        print(f"[SKIP] match+bias {label} A{A}B{B}Q{Q}V{V}D{D}: "
              "does not fit the VMEM plan", flush=True)
        return
    rng = np.random.default_rng(seed)
    vis = jnp.asarray(rng.standard_normal((A, V, D)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, Q, D)), jnp.float32)
    # visibility-style masks: ~10% of factors / queries hidden at -1e9
    vis_bias = jnp.asarray(
        np.where(rng.random((A, V)) < 0.1, -1e9, 0.0), jnp.float32)
    txt_bias = jnp.asarray(
        np.where(rng.random((B, Q)) < 0.1, -1e9, 0.0), jnp.float32)

    def oracle(vis_b, txt_b):
        att = jnp.einsum("bqd,avd->baqv", txt_b, vis_b,
                         preferred_element_type=jnp.float32)
        att = att + vis_bias[None, :, None, :] + txt_bias[:, None, :, None]
        return att.max(axis=3), att.max(axis=2)

    mq, mv = match_maxes_pallas(vis, txt, vis_bias=vis_bias,
                                txt_bias=txt_bias)
    wq, wv = oracle(vis, txt)
    # kernel compute is bf16 on the MXU with f32 accumulation; the
    # oracle is f32 — tolerance covers the bf16 mantissa at |att|~sqrt(D)
    tol = 0.05 if D >= 128 else 0.02
    check(f"match+bias {label} fwd q-max", mq, wq, tol)
    check(f"match+bias {label} fwd v-max", mv, wv, tol)

    def loss_k(v_, t_):
        a, b = match_maxes_pallas(v_, t_, vis_bias=vis_bias,
                                  txt_bias=txt_bias)
        return jnp.sum(jnp.tanh(a)) + jnp.sum(jnp.tanh(b))

    def loss_o(v_, t_):
        a, b = oracle(v_, t_)
        return jnp.sum(jnp.tanh(a)) + jnp.sum(jnp.tanh(b))

    gk = jax.grad(loss_k, argnums=(0, 1))(vis, txt)
    go = jax.grad(loss_o, argnums=(0, 1))(vis, txt)
    # routing indices may differ near bf16-degenerate ties; tanh'd
    # cotangents keep magnitudes comparable
    check(f"match+bias {label} bwd vis", gk[0], go[0], tol)
    check(f"match+bias {label} bwd txt", gk[1], go[1], tol)


def run_sharded_reduction_leg(A, B, Q, V, D, seed):
    """match_maxes_pallas_sharded under a REGISTERED 1-device data mesh
    must reduce to the unsharded kernel exactly (the single-chip
    contract of match_kernel='pallas_sharded')."""
    from jax.sharding import Mesh

    from vlgae_tpu.ops.match_pallas import match_maxes_pallas_sharded

    rng = np.random.default_rng(seed)
    vis = jnp.asarray(rng.standard_normal((A, V, D)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, Q, D)), jnp.float32)
    mesh = Mesh(np.array(jax.devices()[:1]), ("data",))
    dp.set_data_parallel_mesh(mesh)
    try:
        sq, sv = match_maxes_pallas_sharded(vis, txt)
        uq, uv = match_maxes_pallas(vis, txt)
        check(f"sharded single-chip reduction q A{A}B{B}", sq, uq, 0.0)
        check(f"sharded single-chip reduction v A{A}B{B}", sv, uv, 0.0)
    finally:
        dp.set_data_parallel_mesh(None)


def run_dep_reuse_leg(Bsz, L, P, bf16, seed):
    """Round-4 dep_reuse straight-through linearization on device: the
    joint loss reusing the language-factor DP tables must match the
    fresh-DP formulation in value, parameter gradients, and decode
    (models/ldndmv.py loss_nll; CPU-pinned by
    tests/test_models.py::test_dep_loss_reuse_matches_fresh_dp)."""
    import bench as bench_mod
    from vlgae_tpu.models import ldndmv_decode, loss_nll

    model, inputs, params = bench_mod.make_joint(Bsz, L, P, bf16=bf16)
    key = jax.random.key(seed)

    def total(p, reuse):
        out = model.apply(p, inputs, deterministic=False,
                          rngs={"dropout": key, "sample": key})
        if not reuse:
            out = {k: v for k, v in out.items() if k != "dep_reuse"}
        dep_loss, _ = loss_nll(out, inputs["seq_len"], viterbi=True)
        return dep_loss

    tag = f"dep_reuse B{Bsz}L{L} {'bf16' if bf16 else 'f32'}"
    v_re, g_re = jax.jit(jax.value_and_grad(total),
                         static_argnums=1)(params, True)
    v_fr, g_fr = jax.jit(jax.value_and_grad(total),
                         static_argnums=1)(params, False)
    check(f"{tag} value", v_re, v_fr, 5e-4 * Bsz)
    leaves_re = jax.tree_util.tree_leaves_with_path(g_re)
    leaves_fr = dict(jax.tree_util.tree_leaves_with_path(g_fr))
    worst = 0.0
    for path, a in leaves_re:
        b = leaves_fr[path]
        denom = max(float(np.abs(np.asarray(b)).max()), 1e-3)
        worst = max(worst,
                    float(np.abs(np.asarray(a) - np.asarray(b)).max())
                    / denom)
    check(f"{tag} grads (worst rel)", np.array(worst), np.zeros(()),
          5e-3 if bf16 else 5e-4)

    fwd = jax.jit(lambda p: model.apply(
        p, inputs, deterministic=False,
        rngs={"dropout": key, "sample": key}))
    out = fwd(params)
    out_fresh = {k: v for k, v in out.items() if k != "dep_reuse"}
    dec = jax.jit(
        lambda o, mbr: ldndmv_decode(o, inputs["seq_len"], mbr=mbr),
        static_argnums=1,
    )
    for mbr in (False, True):
        h_re = np.asarray(dec(out, mbr))
        h_fr = np.asarray(dec(out_fresh, mbr))
        check(f"{tag} decode mbr={mbr}", h_re, h_fr, 0.0)


def main():
    # VLGAE_SWEEP_LEGS: comma list of leg families to run (default all).
    # Families: dmv, fallback, match, matchbias, sharded, depreuse.
    # Lets a fresh window resume after a tunnel stall without repaying
    # the already-passed legs.
    want = os.environ.get("VLGAE_SWEEP_LEGS", "")
    sel = set(filter(None, want.split(","))) or {
        "dmv", "fallback", "match", "matchbias", "sharded", "depreuse"}
    print("backend:", jax.default_backend(), jax.devices(),
          "legs:", sorted(sel), flush=True)
    t0 = time.time()
    if "dmv" in sel:
        for N, B, seed in [(10, 64, 0), (30, 64, 1), (47, 32, 2),
                           (48, 32, 3), (64, 32, 4)]:
            run_dmv_leg(N, B, seed)
            print(f"  ... leg N={N} done at {time.time()-t0:.0f}s",
                  flush=True)
    if "fallback" in sel:
        for N, B, seed in [(30, 64, 5), (64, 16, 6)]:
            run_fallback_leg(N, B, seed)
    if "match" in sel:
        for A, B, Q, V, D, seed in [(8, 8, 10, 36, 64, 7),
                                    (16, 16, 12, 100, 128, 8)]:
            run_match_leg(A, B, Q, V, D, seed)
            print(f"  ... match A{A} done at {time.time()-t0:.0f}s",
                  flush=True)
    # round-4/5 surfaces -----------------------------------------------------
    if "matchbias" in sel:
        for A, B, Q, V, D, seed, label in [
            (64, 64, 102, 703, 128, 9, "recipe"),     # len-50 paper recipe
            (64, 64, 130, 703, 128, 10, "stretch"),   # len-64 stretch queries
            (32, 32, 62, 1369, 128, 11, "soak"),      # 36-box full factor set
        ]:
            run_match_bias_leg(A, B, Q, V, D, seed, label)
            print(f"  ... match+bias {label} done at {time.time()-t0:.0f}s",
                  flush=True)
    if "sharded" in sel:
        run_sharded_reduction_leg(16, 16, 22, 100, 128, 12)
    if "depreuse" in sel:
        for Bsz, L, P, bf16, seed in [(16, 12, 12, False, 13),
                                      (16, 12, 12, True, 14)]:
            run_dep_reuse_leg(Bsz, L, P, bf16, seed)
            print(f"  ... dep_reuse bf16={bf16} done at "
                  f"{time.time()-t0:.0f}s", flush=True)
    print(f"total {time.time()-t0:.0f}s", flush=True)
    if FAILS:
        print("FAILED LEGS:", FAILS, flush=True)
        sys.exit(1)
    print("ALL HARDWARE PARITY LEGS PASS", flush=True)


if __name__ == "__main__":
    main()
