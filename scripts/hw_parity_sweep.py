"""Hardware parity sweep: every production kernel path vs its pure-JAX oracle,
run on the real TPU backend.

Run this after any kernel/dispatch change that landed while only CPU testing
was available (the interpret-mode tests catch logic bugs, but Mosaic
compilation, VMEM layout, and the (m,s) fast paths only exist on hardware).

Covers (30 checks):
  - log-semiring inside (partition) fwd at N in {10, 30, 47, 48, 64}
    (both sides of MS_COMBINE_MIN_N1, the v3-fill gate boundary, and the
    stretch shape)
  - value_and_grad through the fused fwd+bwd kernel (default path) AND the
    save-charts + standalone-outside fallback (USE_FUSED=False)
  - max-semiring fwd + argmax-indicator grads
  - mixed lengths (ragged masking on device)
  - the fused matching kernel fwd + bwd vs the f32 einsum oracle
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


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    t0 = time.time()
    for N, B, seed in [(10, 64, 0), (30, 64, 1), (47, 32, 2), (48, 32, 3),
                       (64, 32, 4)]:
        run_dmv_leg(N, B, seed)
        print(f"  ... leg N={N} done at {time.time()-t0:.0f}s", flush=True)
    for N, B, seed in [(30, 64, 5), (64, 16, 6)]:
        run_fallback_leg(N, B, seed)
    for A, B, Q, V, D, seed in [(8, 8, 10, 36, 64, 7), (16, 16, 12, 100, 128, 8)]:
        run_match_leg(A, B, Q, V, D, seed)
    print(f"total {time.time()-t0:.0f}s", flush=True)
    if FAILS:
        print("FAILED LEGS:", FAILS, flush=True)
        sys.exit(1)
    print("ALL HARDWARE PARITY LEGS PASS", flush=True)


if __name__ == "__main__":
    main()
