"""Subword transformer embedding: pooling, freezing, stride windows."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlgae_tpu.models import CompositeEmbedding
from vlgae_tpu.models.embedding import EmbeddingItemCfg


def bert_cfg(max_pos=32):
    from transformers import BertConfig

    return BertConfig(
        vocab_size=200, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=max_pos,
    )


def make_emb(max_pos=32, n_layers=1):
    return CompositeEmbedding(
        items=(EmbeddingItemCfg(
            "transformer", "subword", "transformer",
            embedding_dim=16, n_layers=n_layers, requires_grad=False,
        ),),
        bert_config=bert_cfg(max_pos),
    )


def make_inputs(rng, B, L, S):
    sub = rng.integers(3, 200, (B, S)).astype(np.int32)
    mask = np.ones((B, S), bool)
    first = np.sort(rng.choice(np.arange(1, S - 1), L, replace=False))
    first = np.tile(first[None], (B, 1)).astype(np.int32)
    return {
        "subword": jnp.asarray(sub),
        "subword_mask": jnp.asarray(mask),
        "subword_first": jnp.asarray(first),
    }


def test_subword_pooling_shapes():
    rng = np.random.default_rng(0)
    emb = make_emb()
    inputs = make_inputs(rng, B=2, L=5, S=20)
    params = emb.init(jax.random.key(0), inputs)
    h, aux = emb.apply(params, inputs)
    assert h.shape == (2, 5, 16)


def test_frozen_bert_stops_gradient():
    rng = np.random.default_rng(1)
    emb = make_emb()
    inputs = make_inputs(rng, B=2, L=4, S=16)
    params = emb.init(jax.random.key(0), inputs)

    def loss(p):
        h, _ = emb.apply(p, inputs)
        return jnp.sum(h ** 2)

    g = jax.grad(loss)(params)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(g)
    bert_norm = sum(
        float(jnp.abs(v).sum()) for k, v in flat.items() if "bert" in k
    )
    assert bert_norm == 0.0  # requires_grad=False -> stop_gradient


def test_stride_windows_match_direct():
    """Windowed encoding must equal direct encoding when the model's
    position limit is large enough (same per-token values for the
    window-covered positions given full context... here we verify the
    windowed path is self-consistent: shapes + agreement on window 0's
    protected region)."""
    rng = np.random.default_rng(2)
    B, L, S = 2, 6, 50  # max_pos 32 -> 2+ windows
    emb_small = make_emb(max_pos=32)
    inputs = make_inputs(rng, B, L, S)
    params = emb_small.init(jax.random.key(0), inputs)
    h_windowed, _ = emb_small.apply(params, inputs)
    assert h_windowed.shape == (B, L, 16)
    assert np.all(np.isfinite(np.asarray(h_windowed)))

    # a model with a big position limit encodes directly; reusing the
    # same params (position table sliced) is not possible, so just
    # verify the windowed output depends on far-context tokens less than
    # the direct-window content (sanity: changing a token changes only
    # nearby outputs' windows)
    sub2 = np.asarray(inputs["subword"]).copy()
    sub2[:, -1] = 5
    inputs2 = dict(inputs)
    inputs2["subword"] = jnp.asarray(sub2)
    h2, _ = emb_small.apply(params, inputs2)
    # first-window word positions (< stride) unaffected by the change
    first = np.asarray(inputs["subword_first"])[0]
    early = first < 8
    if early.any():
        np.testing.assert_allclose(
            np.asarray(h_windowed)[0, early], np.asarray(h2)[0, early],
            atol=1e-5,
        )
