"""Deep randomized soak: many more instances than the CI hypothesis
sweeps, same oracles. Exits nonzero on the first mismatch.

Not a CI test (runtime ~10 min CPU): run ad hoc before releases or
after touching the struct/decode layers:
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/deep_fuzz.py
"""
import os, sys, time
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO); sys.path.insert(0, os.path.join(_REPO, 'tests'))
import numpy as np
import jax.numpy as jnp
import oracles
from vlgae_tpu.struct import LogSemiring, MaxSemiring, dmv_merge, dmv_partition, DependencyCRF
from vlgae_tpu.struct.dmv import dmv_marginals
from vlgae_tpu.struct.deptree import deptree_partition, deptree_marginals

rng = np.random.default_rng(20260818)
t0 = time.time()

# --- DMV partition/max/marginals vs brute force -----------------------
for it in range(400):
    n = int(rng.integers(1, 7))
    dec = rng.uniform(-3, 3, (n, 2, 2, 2)).astype(np.float32)
    attach = rng.uniform(-3, 3, (n, n, 2)).astype(np.float32)
    root = rng.uniform(-3, 3, (n,)).astype(np.float32)
    md, ma = dmv_merge(jnp.asarray(dec)[None], jnp.asarray(attach)[None],
                       jnp.asarray(root)[None])
    lengths = jnp.asarray([n], jnp.int32)
    got = float(dmv_partition(md, ma, lengths, LogSemiring)[0])
    want = oracles.brute_dmv(dec.astype(np.float64), attach.astype(np.float64),
                             root.astype(np.float64), n)
    assert abs(got - want) < 1e-3 * max(1, abs(want)), (it, n, got, want)
    gmax = float(dmv_partition(md, ma, lengths, MaxSemiring)[0])
    wmax = oracles.brute_dmv(dec.astype(np.float64), attach.astype(np.float64),
                             root.astype(np.float64), n, op=max)
    assert abs(gmax - wmax) < 1e-3 * max(1, abs(wmax)), (it, n, gmax, wmax)
    _, marg = dmv_marginals(md, ma, lengths, LogSemiring)
    wm, _ = oracles.brute_dmv_marginals(dec.astype(np.float64),
                                        attach.astype(np.float64),
                                        root.astype(np.float64), n)
    np.testing.assert_allclose(np.asarray(marg)[0], wm, rtol=2e-3, atol=2e-4,
                               err_msg=f"dmv marg it={it} n={n}")
print(f"dmv ok ({time.time()-t0:.0f}s)", flush=True)

# --- DepTree partition/argmax/marginals vs brute force ----------------
for it in range(400):
    n = int(rng.integers(1, 7))
    arc = rng.uniform(-3, 3, (1, n + 1, n + 1)).astype(np.float32)
    lengths = jnp.asarray([n], jnp.int32)
    got = float(deptree_partition(jnp.asarray(arc), lengths, LogSemiring)[0])
    want = oracles.brute_deptree(arc[0].astype(np.float64), n)
    assert abs(got - want) < 1e-3 * max(1, abs(want)), (it, n, got, want)
    marg = np.asarray(deptree_marginals(jnp.asarray(arc), lengths, LogSemiring))[0]
    wm, _ = oracles.brute_deptree_marginals(arc[0].astype(np.float64), n)
    np.testing.assert_allclose(marg, wm, rtol=2e-3, atol=2e-4,
                               err_msg=f"deptree marg it={it} n={n}")
    heads = np.asarray(DependencyCRF(jnp.asarray(arc), lengths).argmax_heads)[0]
    best = oracles.brute_deptree(arc[0].astype(np.float64), n, op=max)
    got_score = sum(arc[0, heads[i], i + 1] for i in range(n))
    assert abs(got_score - best) < 1e-3 * max(1, abs(best)), (it, n, got_score, best)
print(f"deptree ok ({time.time()-t0:.0f}s)", flush=True)

# --- decode oracle sweep ----------------------------------------------
import test_model_golden as T
from vlgae_tpu.models import DependencyBoxRel
ref = np.load(os.path.join(_REPO, 'tests/golden/model_ref.npz'))
joint = T.joint.__wrapped__(ref)
model, _, params = joint[0], joint[1], joint[2]
for it in range(200):
    B = int(rng.integers(2, 5)); L = int(rng.integers(1, 5))
    P = int(rng.integers(2, 5)); arcs = bool(rng.integers(0, 2))
    V = P + P * P + P
    Q = (2 if arcs else 1) * (L + 1)
    att = rng.uniform(-5, 5, (B, B, Q, V)).astype(np.float32)
    seq_len = rng.integers(1, L + 1, B)
    wm_ = np.arange(L)[None] < seq_len[:, None]
    q_mask = np.concatenate([np.zeros((B, 1), bool), wm_], 1)
    txt_mask = np.concatenate([q_mask, q_mask], 1) if arcs else q_mask
    vis_mask = rng.integers(0, 2, (B, P)).astype(bool); vis_mask[:, 0] = True
    rel_mask = np.triu(vis_mask[:, None, :] & vis_mask[:, :, None], 1).reshape(B, -1)
    fvm = np.concatenate([vis_mask, rel_mask, vis_mask], 1)
    tag = rng.integers(0, 6, (B, L))
    diag = att[np.arange(B), np.arange(B)]
    want = T._oracle_decode(diag, fvm, txt_mask, tag, P, L)
    out = {"match_logit": jnp.asarray(att),
           "vis_packed": (None, jnp.asarray(fvm), (P, P * P, P)),
           "txt_packed": (None, jnp.asarray(txt_mask), None)}
    got = model.apply(params, out, {"tag": jnp.asarray(tag), "token": jnp.asarray(tag)},
                      method=DependencyBoxRel.decode_grounding_logits)
    T.masked_close(got, want, rtol=1e-5, atol=1e-4, thresh=-1e19,
                   msg=f"decode it={it} B={B} L={L} P={P} arcs={arcs}")
print(f"decode ok ({time.time()-t0:.0f}s)", flush=True)
print("DEEP FUZZ: ALL OK")
