"""Variational bottleneck paths: sentence VAE/IB + embedding-level VAE."""

import numpy as np

import jax
import jax.numpy as jnp

from vlgae_tpu.models import (
    CompositeEmbedding,
    DiscriminativeNDMV,
    LDNDMVConfig,
    MLPEncoder,
    loss_nll,
)
from vlgae_tpu.models.embedding import EmbeddingItemCfg

from test_models import N_TAG, N_TOKEN, N_WORD, make_inputs
import pytest


def build(variational_mode, emb_mode="basic"):
    emb = CompositeEmbedding(
        items=(
            EmbeddingItemCfg("word_embedding", "word", "static",
                             n_vocab=N_WORD, embedding_dim=16,
                             mode=emb_mode, out_dim=8),
            EmbeddingItemCfg("tag_embedding", "tag", "static",
                             n_vocab=N_TAG, embedding_dim=8),
        ),
    )
    cfg = LDNDMVConfig(
        context_mode="mean", variational_mode=variational_mode, z_dim=6,
        hidden_size=24, attach_rank=4, dec_rank=4, root_rank=4,
        root_emb_dim=6, dec_emb_dim=6, n_token=N_TOKEN, n_tag=N_TAG,
    )
    return DiscriminativeNDMV(
        cfg=cfg, embedding=emb, encoder=MLPEncoder(n_hidden=24),
        token2word=tuple(i % N_WORD for i in range(N_TOKEN)),
        token2tag=tuple(i % N_TAG for i in range(N_TOKEN)),
    )


def _run(model, train=True):
    rng = np.random.default_rng(0)
    inputs = make_inputs(rng)
    params = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1),
         "sample": jax.random.key(2)}, inputs,
    )
    out = model.apply(
        params, inputs, deterministic=not train,
        rngs={"dropout": jax.random.key(3), "sample": jax.random.key(4)}
        if train else {},
    )
    total, aux = loss_nll(out, inputs["seq_len"], viterbi=False)
    return params, inputs, out, total, aux


@pytest.mark.slow
def test_sentence_vae():
    model = build("all:vae")
    params, inputs, out, total, aux = _run(model)
    assert out["kl"] is not None and np.isfinite(float(out["kl"]))
    assert "lstm_kl" in aux
    assert np.isfinite(float(total))
    # sampling active in train mode: two keys give different scores
    o2 = model.apply(params, inputs, deterministic=False,
                     rngs={"dropout": jax.random.key(9),
                           "sample": jax.random.key(9)})
    assert not np.allclose(np.asarray(out["attach"]), np.asarray(o2["attach"]))
    # deterministic eval uses the mean
    o3 = model.apply(params, inputs, deterministic=True)
    o4 = model.apply(params, inputs, deterministic=True)
    np.testing.assert_allclose(np.asarray(o3["attach"]),
                               np.asarray(o4["attach"]))


@pytest.mark.slow
def test_sentence_ib_with_tag_context():
    model = build("tag:ib")
    params, inputs, out, total, aux = _run(model)
    assert np.isfinite(float(out["kl"]))
    assert np.isfinite(float(total))

    def loss_fn(p):
        o = model.apply(p, inputs, deterministic=False,
                        rngs={"dropout": jax.random.key(5),
                              "sample": jax.random.key(6)})
        t, _ = loss_nll(o, inputs["seq_len"], viterbi=False)
        return t

    g = jax.grad(loss_fn)(params)
    # IB target params receive gradient
    tm = g["params"]["target_mean"]
    assert np.isfinite(np.asarray(tm)).all()


@pytest.mark.slow
def test_embedding_level_vae():
    model = build("none", emb_mode="vae")
    params, inputs, out, total, aux = _run(model)
    assert out.get("emb_kl") is not None
    assert "emb_kl" in aux
    assert np.isfinite(float(total))
