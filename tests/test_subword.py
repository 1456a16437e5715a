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


@pytest.mark.slow
def test_subword_pooling_shapes():
    rng = np.random.default_rng(0)
    emb = make_emb()
    inputs = make_inputs(rng, B=2, L=5, S=20)
    params = emb.init(jax.random.key(0), inputs)
    h, aux = emb.apply(params, inputs)
    assert h.shape == (2, 5, 16)


@pytest.mark.slow
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


@pytest.mark.slow
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


def make_emb_pool(pooling, max_pos=32, stride=0):
    kw = dict(embedding_dim=16, n_layers=1, requires_grad=False,
              pooling=pooling)
    if stride:
        kw["stride"] = stride
    return CompositeEmbedding(
        items=(EmbeddingItemCfg("transformer", "subword", "transformer",
                                **kw),),
        bert_config=bert_cfg(max_pos),
    )


def test_pooling_modes_first_last_mean():
    """first/last/mean subword pooling
    (ref: transformers_embedding.py:157-166)."""
    rng = np.random.default_rng(3)
    B, S = 2, 20
    sub = rng.integers(3, 200, (B, S)).astype(np.int32)
    # word 0 spans subwords [1, 3]; word 1 spans [4, 4]
    first = np.tile(np.array([[1, 4]], np.int32), (B, 1))
    last = np.tile(np.array([[3, 4]], np.int32), (B, 1))
    inputs = {
        "subword": jnp.asarray(sub),
        "subword_mask": jnp.ones((B, S), bool),
        "subword_first": jnp.asarray(first),
        "subword_last": jnp.asarray(last),
    }
    outs = {}
    for mode in ("first", "last", "mean"):
        emb = make_emb_pool(mode)
        params = emb.init(jax.random.key(0), inputs)  # same weights
        outs[mode], _ = emb.apply(params, inputs)

    # single-subword word: all poolings identical
    for m in ("last", "mean"):
        np.testing.assert_allclose(
            np.asarray(outs["first"])[:, 1], np.asarray(outs[m])[:, 1],
            atol=1e-6,
        )
    # multi-subword word: first != last; mean == average of the span
    assert not np.allclose(np.asarray(outs["first"])[:, 0],
                           np.asarray(outs["last"])[:, 0])
    span_vals = []
    for pos in (1, 2, 3):
        emb = make_emb_pool("first")
        params = emb.init(jax.random.key(0), inputs)
        shifted = dict(inputs)
        shifted["subword_first"] = jnp.asarray(
            np.tile(np.array([[pos, 4]], np.int32), (B, 1))
        )
        shifted["subword_last"] = shifted["subword_first"]
        h, _ = emb.apply(params, shifted)
        span_vals.append(np.asarray(h)[:, 0])
    np.testing.assert_allclose(
        np.mean(span_vals, axis=0), np.asarray(outs["mean"])[:, 0],
        rtol=1e-4, atol=1e-5,
    )


@pytest.mark.slow
def test_reference_stride_window_scheme():
    """Window k>0 contributes its last `stride` positions; positions in
    window 0 never see tokens beyond max_len
    (ref: transformers_embedding.py:143-150)."""
    rng = np.random.default_rng(4)
    B, S, max_pos, stride = 2, 40, 16, 8
    sub = rng.integers(3, 200, (B, S)).astype(np.int32)
    first = np.tile(np.arange(0, 40, 4, dtype=np.int32)[None], (B, 1))
    inputs = {
        "subword": jnp.asarray(sub),
        "subword_mask": jnp.ones((B, S), bool),
        "subword_first": jnp.asarray(first),
        "subword_last": jnp.asarray(first),
    }
    emb = make_emb_pool("first", max_pos=max_pos, stride=stride)
    params = emb.init(jax.random.key(0), inputs)
    h, _ = emb.apply(params, inputs)
    assert h.shape == (B, 10, 16)
    assert np.all(np.isfinite(np.asarray(h)))
    # changing token 0 must not affect words pooled from positions >= 16
    # (those come from windows starting at >= 8, which exclude pos 0)
    sub2 = sub.copy()
    sub2[:, 0] = 7
    h2, _ = emb.apply(params, {**inputs, "subword": jnp.asarray(sub2)})
    far = first[0] >= max_pos
    np.testing.assert_allclose(
        np.asarray(h)[:, far], np.asarray(h2)[:, far], atol=1e-5
    )
    # ...but it does affect word 0
    assert not np.allclose(np.asarray(h)[:, 0], np.asarray(h2)[:, 0])


def test_attach_subwords_no_pretruncation():
    """Long inputs keep their full subword sequence (the stride windows
    handle length, not truncation)."""
    from vlgae_tpu.data.subword import HashSubwordTokenizer, attach_subwords

    class FakeDM:
        def __init__(self):
            self.datasets = {"train": [
                {"word": ["verylongword%d" % i for i in range(600)],
                 "seq_len": 600},
            ]}

        def collate(self, name, insts, pad_len):
            return {}, {}

    dm = FakeDM()
    attach_subwords(dm, HashSubwordTokenizer())
    inst = dm.datasets["train"][0]
    assert len(inst["subword_ids"]) > 512  # no 512 hard cap
    assert len(inst["subword_first"]) == 600
    assert len(inst["subword_last"]) == 600
    assert all(f <= l for f, l in
               zip(inst["subword_first"], inst["subword_last"]))
    x, _ = dm.collate("train", dm.datasets["train"], 600)
    assert x["subword"].shape[1] >= len(inst["subword_ids"])
    assert x["subword_last"].shape == (1, 600)
