"""Same-window A/B for the joint train step's long-tail costs.

The round-3 trace profile attributes ~0.7 ms of the 3.1 ms step to
copy/copy-done slack across ~2,100 small fusions (optimizer leaves,
RNG, small layers). Two cheap TPU-idiomatic levers:

  - ``flatten``: wrap the Adam transform in ``optax.flatten`` so the
    optimizer update is a handful of vector ops over one packed buffer
    instead of per-leaf fusions (and the scan carry holds 2 vectors of
    optimizer state instead of 2x n_leaves).
  - ``rbg``: use ``jax.random.key(seed, impl='rbg')`` for the dropout /
    sample streams — the TPU-native RBG generator instead of threefry
    (the impl travels with the key through fold_in/split).

Also times ``feat_fuse_mode='none'`` for attribution of the fusion
attention block.

Usage: python scripts/joint_tail_ab.py <mode>
One leg per process (worker crashes must not poison other legs).

Attribution modes (added for the round-3 margin hunt):
  - ``xlamatch``: match_kernel='xla' — in-situ cost of the fused Pallas
    matching kernel vs the einsum formulation
  - ``novis2txt``: loss_vis2txt=0 — cost of the vision->text CE
    direction (the q-direction max + its backward routing)
  - ``noprior``: loss_use_pos_prior=False — cost of the diagonal-block
    recompute with the POS-prior penalty
  - ``word``: language_factor_mode='word' — cost of the maxdep arc
    factors (halves Q and drops the two detached DPs + arc encoder)
  - ``fwdonly``: loss forward only, no grad/optimizer — fwd/bwd split
  - ``sgmatch``: stop_gradient on the matching maxes — forward
    identical, backward skips the matching VJP and everything upstream
    of it (vis/txt packing, encoders); isolates the matching bwd cone
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

B = int(os.environ.get("AB_B", 64))
L = int(os.environ.get("AB_L", 10))
P = int(os.environ.get("AB_P", 36))
ITERS = int(os.environ.get("AB_ITERS", 64))


MODES = ("base", "flatten", "rbg", "both", "nofuse", "xlamatch",
         "novis2txt", "noprior", "word", "fwdonly", "sgmatch",
         "rematall")


def main():
    mode = sys.argv[1]
    if mode not in MODES:
        raise SystemExit(f"unknown mode {mode!r}; pick one of {MODES}")
    import jax
    import jax.numpy as jnp
    import optax

    from vlgae_tpu.models import (
        CompositeEmbedding, DependencyBoxRel, DependencyBoxRelConfig,
        DiscriminativeNDMV, LDNDMVConfig, MLPEncoder,
        VisBoxRelSimpleEncoder, loss_nll,
    )
    from vlgae_tpu.models.embedding import EmbeddingItemCfg

    N_WORD, N_TAG, N_TOKEN = 2000, 40, 500
    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("word_embedding", "word", "static",
                         n_vocab=N_WORD, embedding_dim=100),
        EmbeddingItemCfg("tag_embedding", "tag", "static",
                         n_vocab=N_TAG, embedding_dim=32),
    ))
    dep_cfg = LDNDMVConfig(hidden_size=256, mid_bottleneck=150,
                           n_token=N_TOKEN, n_tag=N_TAG)
    dep = DiscriminativeNDMV(
        cfg=dep_cfg, embedding=emb, encoder=MLPEncoder(n_hidden=256),
        token2word=tuple(i % N_WORD for i in range(N_TOKEN)),
        token2tag=tuple(i % N_TAG for i in range(N_TOKEN)),
    )
    if mode == "sgmatch":
        import vlgae_tpu.models.joint as _joint
        _orig_gl = _joint.DependencyBoxRel.gather_logit_train

        def _patched(self, vis, txt, eval_mode=False):
            l, lv = _orig_gl(self, vis, txt, eval_mode=eval_mode)
            return jax.lax.stop_gradient(l), jax.lax.stop_gradient(lv)

        _joint.DependencyBoxRel.gather_logit_train = _patched

    fuse = "none" if mode == "nofuse" else "attention"
    model = DependencyBoxRel(
        cfg=DependencyBoxRelConfig(
            match_hidden=128, bf16_matmul=True, feat_fuse_mode=fuse,
            match_kernel="xla" if mode == "xlamatch" else "auto",
            loss_vis2txt=0.0 if mode == "novis2txt" else 1.0,
            loss_use_pos_prior=mode != "noprior",
            language_factor_mode=(
                "word" if mode == "word" else "word+maxdep"),
        ),
        dep_cfg=dep_cfg, dependency=dep,
        vis_encoder=VisBoxRelSimpleEncoder(n_hidden=256,
                                           dtype=jnp.bfloat16),
        pos_for_obj=(2, 3), pos_for_rel=(4, 5), pos_for_attr=(6,),
    )
    rng = np.random.default_rng(0)
    inputs = {
        "token": jnp.asarray(rng.integers(2, N_TOKEN, (B, L)), jnp.int32),
        "word": jnp.asarray(rng.integers(2, N_WORD, (B, L)), jnp.int32),
        "tag": jnp.asarray(rng.integers(2, N_TAG, (B, L)), jnp.int32),
        "seq_len": jnp.full((B,), L, jnp.int32),
        "vis_box_feat": jnp.asarray(
            rng.standard_normal((B, P, 2048)), jnp.float32),
        "vis_box_mask": jnp.asarray(np.tile(np.arange(P) < 35, (B, 1))),
        "vis_available": jnp.ones(B, bool),
    }
    params = jax.jit(model.init)(jax.random.key(0), inputs)
    tx = optax.adam(1e-3)
    if mode in ("flatten", "both"):
        tx = optax.flatten(tx)
    opt_state = tx.init(params)
    impl = "rbg" if mode in ("rbg", "both") else None
    key0 = jax.random.key(1, impl=impl) if impl else jax.random.key(1)

    def step(params, opt_state, key):
        def loss_fn(p):
            def fwd(p, key):
                out = model.apply(p, inputs, deterministic=False,
                                  rngs={"dropout": key, "sample": key})
                dep_loss, dep_aux = loss_nll(out, inputs["seq_len"],
                                             viterbi=True)
                total, _ = model.apply(p, out, None, inputs, dep_loss,
                                       dep_aux, method=model.loss)
                return total / (B * L)

            if mode == "rematall":
                fwd = jax.checkpoint(fwd)
            return fwd(p, key)

        if mode == "fwdonly":
            return params, opt_state, loss_fn(params)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    def make_many(n_it):
        @jax.jit
        def many(params, opt_state, key):
            def body(carry, i):
                p, o, acc = carry
                p, o, loss = step(p, o, jax.random.fold_in(key, i))
                return (p, o, acc + loss), None

            (p, o, acc), _ = jax.lax.scan(
                body, (params, opt_state, jnp.zeros(())), jnp.arange(n_it)
            )
            return acc

        return lambda: many(params, opt_state, key0)

    dt = bench.diff_time(make_many, ITERS, repeats=3)
    print(json.dumps({"mode": mode, "ms": round(dt * 1e3, 3),
                      "sent_per_sec": round(B / dt, 1)}), flush=True)


if __name__ == "__main__":
    main()
