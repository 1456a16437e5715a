"""Batch-padding invariance of the joint training objective.

``pad_batch_to_devices`` fills the batch to a compile shape with copies
of row 0 (seq_len zeroed). The contrastive grounding losses softmax
over the batch axes, so filler rows must be masked out of both
directions or the loss GRADIENTS depend on how much the batch was
padded (the value alone is blind to it: the factor-CE value is
self-normalized). Found by review in round 3: the unmasked version
showed a max param-grad delta of 2.45 between a batch of 6 and the
same batch padded to 8.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlgae_tpu.models import (
    CompositeEmbedding,
    DependencyBoxRel,
    DependencyBoxRelConfig,
    DiscriminativeNDMV,
    LDNDMVConfig,
    MLPEncoder,
    VisBoxRelSimpleEncoder,
    loss_nll,
)
from vlgae_tpu.models.embedding import EmbeddingItemCfg
from vlgae_tpu.parallel.mesh import pad_batch_to_devices

N_WORD, N_TAG, N_TOKEN = 50, 8, 40


def build_model(**cfg_kw):
    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("word_embedding", "word", "static",
                         n_vocab=N_WORD, embedding_dim=16),
        EmbeddingItemCfg("tag_embedding", "tag", "static",
                         n_vocab=N_TAG, embedding_dim=8),
    ))
    dep_cfg = LDNDMVConfig(hidden_size=32, mid_bottleneck=16,
                           n_token=N_TOKEN, n_tag=N_TAG)
    dep = DiscriminativeNDMV(
        cfg=dep_cfg, embedding=emb, encoder=MLPEncoder(n_hidden=32),
        token2word=tuple(i % N_WORD for i in range(N_TOKEN)),
        token2tag=tuple(i % N_TAG for i in range(N_TOKEN)),
    )
    return DependencyBoxRel(
        cfg=DependencyBoxRelConfig(match_hidden=32, **cfg_kw),
        dep_cfg=dep_cfg, dependency=dep,
        vis_encoder=VisBoxRelSimpleEncoder(n_hidden=32),
        pos_for_obj=(2, 3), pos_for_rel=(4, 5), pos_for_attr=(6,),
    )


def make_batch(B=6, L=5, P=4, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "token": rng.integers(2, N_TOKEN, (B, L)).astype(np.int32),
        "word": rng.integers(2, N_WORD, (B, L)).astype(np.int32),
        "tag": rng.integers(2, N_TAG, (B, L)).astype(np.int32),
        "seq_len": np.full((B,), L, np.int32),
        "vis_box_feat": rng.standard_normal((B, P, 32)).astype(np.float32),
        "vis_box_mask": np.ones((B, P), bool),
        "vis_available": np.ones(B, bool),
    }


def param_grads(model, params, batch):
    ins = {k: jnp.asarray(v) for k, v in batch.items()}

    def f(p):
        out = model.apply(p, ins, deterministic=False,
                          rngs={"dropout": jax.random.key(1),
                                "sample": jax.random.key(1)})
        dep_loss, _ = loss_nll(out, ins["seq_len"], viterbi=True)
        tot, _ = model.apply(p, out, None, ins, dep_loss, {},
                             method=model.loss)
        return tot

    return jax.jit(jax.grad(f))(params)


def max_leaf_delta(a, b):
    return max(
        float(jnp.abs(x - y).max())
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b))
    )


@pytest.mark.slow
def test_factor_ce_grads_padding_invariant():
    model = build_model()
    batch = make_batch()
    padded, real = pad_batch_to_devices(batch, 1, pow2=True, min_b=8)
    assert padded["token"].shape[0] == 8 and real == 6
    ins0 = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(0), ins0)
    g_small = param_grads(model, params, batch)
    g_pad = param_grads(model, params, padded)
    assert max_leaf_delta(g_small, g_pad) < 1e-4


@pytest.mark.slow
def test_cap_img_loss_padding_invariant():
    model = build_model(
        loss_grounding_mode="cap_img|ce", gather_logit_mode="reduced",
        decode_grounding_mode="on_img",
    )
    batch = make_batch(seed=3)
    padded, _ = pad_batch_to_devices(batch, 1, pow2=True, min_b=8)
    ins0 = {k: jnp.asarray(v) for k, v in batch.items()}
    params = model.init(jax.random.key(0), ins0)

    def total(b):
        ins = {k: jnp.asarray(v) for k, v in b.items()}
        out = model.apply(params, ins, deterministic=False,
                          rngs={"dropout": jax.random.key(1),
                                "sample": jax.random.key(1)})
        dep_loss, _ = loss_nll(out, ins["seq_len"], viterbi=True)
        tot, _ = model.apply(params, out, None, ins, dep_loss, {},
                             method=model.loss)
        return float(tot)

    assert total(batch) == pytest.approx(total(padded), rel=1e-5)
    g_small = param_grads(model, params, batch)
    g_pad = param_grads(model, params, padded)
    assert max_leaf_delta(g_small, g_pad) < 1e-4


def test_vis_available_counts_real_rows_only():
    """A padded batch with one real image must keep grounding OFF
    (the reference gates on >= 2 images in the TRUE batch,
    ref: joint.py:695)."""
    model = build_model()
    batch = make_batch(B=1)
    padded, _ = pad_batch_to_devices(batch, 1, pow2=True, min_b=8)
    assert padded["vis_available"].sum() == 8  # filler copies row 0
    ins = {k: jnp.asarray(v) for k, v in padded.items()}
    params = model.init(jax.random.key(0), ins)
    out = model.apply(params, ins, deterministic=False,
                      rngs={"dropout": jax.random.key(1),
                            "sample": jax.random.key(1)})
    dep_loss, _ = loss_nll(out, ins["seq_len"], viterbi=True)
    tot, _ = model.apply(params, out, None, ins, dep_loss, {},
                         method=model.loss)
    # alpha=0.5: with grounding gated off the total is (1-alpha)*dep
    assert float(tot) == pytest.approx(0.5 * float(dep_loss), rel=1e-6)


def test_cap_img_requires_reduced_gather():
    with pytest.raises(ValueError, match="cap_img"):
        DependencyBoxRelConfig(loss_grounding_mode="cap_img|ce",
                               gather_logit_mode="simple")


def test_context_max_finite_grads_with_filler_rows():
    """context_mode='max' on a zero-length filler row must not leak
    -inf into the scorer stack (NaN grads through the where-trap)."""
    from vlgae_tpu.models import loss_nll as _nll

    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("word_embedding", "word", "static",
                         n_vocab=N_WORD, embedding_dim=16),
        EmbeddingItemCfg("tag_embedding", "tag", "static",
                         n_vocab=N_TAG, embedding_dim=8),
    ))
    dep_cfg = LDNDMVConfig(hidden_size=32, mid_bottleneck=16,
                           n_token=N_TOKEN, n_tag=N_TAG,
                           context_mode="max")
    dep = DiscriminativeNDMV(
        cfg=dep_cfg, embedding=emb, encoder=MLPEncoder(n_hidden=32),
        token2word=tuple(i % N_WORD for i in range(N_TOKEN)),
        token2tag=tuple(i % N_TAG for i in range(N_TOKEN)),
    )
    rng = np.random.default_rng(0)
    B, L = 4, 5
    ins = {
        "token": jnp.asarray(rng.integers(2, N_TOKEN, (B, L)), jnp.int32),
        "word": jnp.asarray(rng.integers(2, N_WORD, (B, L)), jnp.int32),
        "tag": jnp.asarray(rng.integers(2, N_TAG, (B, L)), jnp.int32),
        "seq_len": jnp.asarray([L, L, 0, 0], jnp.int32),  # 2 filler rows
    }
    params = dep.init(jax.random.key(0), ins)

    def f(p):
        out = dep.apply(p, ins)
        loss, _ = _nll(out, ins["seq_len"], viterbi=True)
        return loss

    g = jax.grad(f)(params)
    assert all(np.all(np.isfinite(l))
               for l in jax.tree_util.tree_leaves(g))


def test_labeled_entropy_negative_axis():
    """Expectation semirings must reduce the LABEL axis for negative
    axis args (axis=-1 was mis-mapped to -2 in the stacked layout)."""
    from vlgae_tpu.struct.distributions import DependencyCRF

    rng = np.random.default_rng(0)
    B, N, L = 2, 4, 3  # L != N+1 so a mis-mapped axis cannot broadcast
    lab = jnp.asarray(rng.standard_normal((B, N + 1, N + 1, L)),
                      jnp.float32)
    lengths = jnp.asarray([N, N - 1], jnp.int32)
    d_lab = DependencyCRF(lab, lengths)
    d_arc = DependencyCRF(jax.nn.logsumexp(lab, -1), lengths)
    np.testing.assert_allclose(np.asarray(d_lab.partition),
                               np.asarray(d_arc.partition), atol=1e-5)
    ent = np.asarray(d_lab.entropy)
    assert np.all(np.isfinite(ent))
    # label choices add entropy on top of the arc-marginalized tree dist
    assert np.all(ent >= np.asarray(d_arc.entropy) - 1e-5)


def test_metric_has_label_resets():
    from vlgae_tpu.training.metrics import DependencyParsingMetric

    m = DependencyParsingMetric()
    arc = np.zeros((1, 3), np.int64)
    mask = np.ones((1, 3), bool)
    m.update({"arc": arc, "rel": arc}, {"arc": arc, "rel": arc}, mask)
    assert "las" in m.compute()
    m.reset()
    m.update({"arc": arc}, {"arc": arc}, mask)
    assert "las" not in m.compute()
