"""Model forward/loss/decode smoke + semantics tests (CPU)."""

import dataclasses

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
    dmv_model,
    generate_rule_1o,
    ldndmv_decode,
    loss_init_rules,
    loss_nll,
)
from vlgae_tpu.models.embedding import EmbeddingItemCfg
from vlgae_tpu.struct.alg import istree

import oracles


N_TOKEN, N_WORD, N_TAG = 12, 20, 6


def make_inputs(rng, B=3, L=6):
    seq_len = rng.integers(2, L + 1, B)
    seq_len[0] = L
    token = np.zeros((B, L), np.int32)
    word = np.zeros((B, L), np.int32)
    tag = np.zeros((B, L), np.int32)
    for b in range(B):
        n = seq_len[b]
        token[b, :n] = rng.integers(2, N_TOKEN, n)
        word[b, :n] = rng.integers(2, N_WORD, n)
        tag[b, :n] = rng.integers(2, N_TAG, n)
    return {
        "token": jnp.asarray(token),
        "word": jnp.asarray(word),
        "tag": jnp.asarray(tag),
        "seq_len": jnp.asarray(seq_len, jnp.int32),
    }


def build_ldndmv():
    emb = CompositeEmbedding(
        items=(
            EmbeddingItemCfg("word_embedding", "word", "static",
                             n_vocab=N_WORD, embedding_dim=16),
            EmbeddingItemCfg("tag_embedding", "tag", "static",
                             n_vocab=N_TAG, embedding_dim=8),
        ),
    )
    enc = MLPEncoder(n_hidden=24)
    cfg = LDNDMVConfig(
        context_mode="mean", hidden_size=24, attach_rank=4, dec_rank=4,
        root_rank=4, root_emb_dim=6, dec_emb_dim=6, n_token=N_TOKEN,
        n_tag=N_TAG,
    )
    token2word = tuple(int(i % N_WORD) for i in range(N_TOKEN))
    token2tag = tuple(int(i % N_TAG) for i in range(N_TOKEN))
    return DiscriminativeNDMV(
        cfg=cfg, embedding=emb, encoder=enc,
        token2word=token2word, token2tag=token2tag,
    )


@pytest.fixture(scope="module")
def ldndmv_scores():
    rng = np.random.default_rng(0)
    model = build_ldndmv()
    inputs = make_inputs(rng)
    params = model.init(jax.random.key(0), inputs)
    scores = model.apply(params, inputs)
    return model, params, inputs, scores


def test_ldndmv_shapes(ldndmv_scores):
    _, _, inputs, scores = ldndmv_scores
    B, L = inputs["token"].shape
    assert scores["attach"].shape == (B, L, L, 2)
    assert scores["dec"].shape == (B, L, 2, 2, 2)
    assert scores["root"].shape == (B, L)
    assert scores["merged_attach"].shape == (B, L + 1, L + 1, 2)
    assert scores["merged_dec"].shape == (B, L + 1, 2, 2, 2)
    # rule tables are normalized log-probs
    np.testing.assert_allclose(
        np.exp(scores["attach_rule"]).sum(2), 1.0, rtol=1e-4
    )
    np.testing.assert_allclose(np.exp(scores["dec"]).sum(-1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_ldndmv_loss_and_decode(ldndmv_scores):
    _, _, inputs, scores = ldndmv_scores
    total, aux = loss_nll(scores, inputs["seq_len"], viterbi=True)
    assert np.isfinite(float(total))
    total2, _ = loss_nll(scores, inputs["seq_len"], viterbi=False)
    assert float(total2) <= float(total) + 1e-4  # logZ >= max
    heads = np.asarray(ldndmv_decode(scores, inputs["seq_len"], mbr=False))
    heads_mbr = np.asarray(ldndmv_decode(scores, inputs["seq_len"], mbr=True))
    for b in range(heads.shape[0]):
        n = int(inputs["seq_len"][b])
        assert istree(list(heads[b, :n]), proj=True)
        assert istree(list(heads_mbr[b, :n]), proj=True)


@pytest.mark.slow
def test_ldndmv_grads_flow(ldndmv_scores):
    model, params, inputs, _ = ldndmv_scores

    def loss_fn(p):
        scores = model.apply(p, inputs)
        return loss_nll(scores, inputs["seq_len"], viterbi=False)[0]

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(l)) for l in leaves)
    total_norm = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total_norm > 0


def test_init_rule_loss(ldndmv_scores):
    _, _, inputs, scores = ldndmv_scores
    B, L = inputs["token"].shape
    gold = {
        "dec_rule": np.zeros((B, L, 2, 2, 2), np.float32),
        "attach_rule": np.zeros((B, L, L, 2), np.float32),
        "root_rule": np.zeros((B, L), np.float32),
    }
    for b in range(B):
        n = int(inputs["seq_len"][b])
        heads = oracles.all_trees(n).__next__()
        rules = generate_rule_1o(heads)
        gold["dec_rule"][b, :n] = rules["dec_rule"]
        gold["attach_rule"][b, :n, :n] = rules["attach_rule"]
        gold["root_rule"][b, :n] = rules["root_rule"]
    gold = {k: jnp.asarray(v) for k, v in gold.items()}
    # scores['attach'] for init loss uses [B,L,L,2] with valence; the
    # rule tables index real positions only
    total, aux = loss_init_rules(scores, gold)
    assert np.isfinite(float(total))


@pytest.mark.slow
def test_classic_dmv_em_improves_likelihood():
    rng = np.random.default_rng(1)
    B, L = 16, 5
    token = rng.integers(0, 6, (B, L)).astype(np.int32)
    lengths = np.full(B, L, np.int32)
    cfg = dmv_model.DMVConfig(init_method="random", n_token=6, smooth=0.1)
    params = dmv_model.init_params(cfg, seed=3)
    token_j, len_j = jnp.asarray(token), jnp.asarray(lengths)
    em = dmv_model.EMAccumulator(smooth=0.1)
    # first step normalizes the random tables into a proper model; EM
    # must then (weakly) improve the data log-likelihood
    nlls = []
    for _ in range(4):
        counts = dmv_model.expected_counts(params, token_j, len_j)
        em.accumulate(counts)
        params = em.apply(params)
        nlls.append(float(dmv_model.loss(params, token_j, len_j,
                                         viterbi=False)[0]))
    assert nlls[-1] < nlls[0] + 1e-3
    assert all(b <= a + 0.5 for a, b in zip(nlls, nlls[1:]))
    heads = np.asarray(dmv_model.decode(params, token_j, len_j, mbr=True))
    for b in range(B):
        assert istree(list(heads[b]), proj=True)


def build_joint():
    dep = build_ldndmv()
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    cfg = DependencyBoxRelConfig(
        add_rel=True, add_attr=True, add_image=True, match_hidden=16,
        fuse_num_heads=2,
    )
    return DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )


@pytest.fixture(scope="module")
def joint_setup():
    rng = np.random.default_rng(2)
    model = build_joint()
    inputs = make_inputs(rng, B=4, L=6)
    P = 5
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((4, P, 10)), jnp.float32
    )
    inputs["vis_box_mask"] = jnp.asarray(
        np.tile(np.arange(P) < 4, (4, 1))
    )
    inputs["vis_available"] = jnp.ones(4, bool)
    params = model.init(jax.random.key(0), inputs)
    out = model.apply(params, inputs)
    return model, params, inputs, out


@pytest.mark.slow
def test_joint_forward_shapes(joint_setup):
    model, params, inputs, out = joint_setup
    B, L = inputs["token"].shape
    P = inputs["vis_box_feat"].shape[1]
    n_factors = P + P * P + P + 1  # box + rel + attr + img
    Q = 2 * (L + 1)  # words + arcs
    # map-free contract (BASELINE #4): eval carries the reduced
    # [B, A, Q] maxima, never a [B, A, Q, V] map
    assert out["match_logit"].shape == (B, B, Q)
    assert out["match_reduced"][1].shape == (B, B, n_factors)
    assert out["merged_attach"].shape == (B, L + 1, L + 1, 2)


@pytest.mark.slow
def test_joint_loss_and_grads(joint_setup):
    model, params, inputs, out = joint_setup

    def loss_fn(p):
        o = model.apply(p, inputs)
        dep_loss, dep_aux = loss_nll(o, inputs["seq_len"], viterbi=True)
        total, aux = model.apply(
            p, o, None, inputs, dep_loss, dep_aux, method=model.loss
        )
        return total

    val = loss_fn(params)
    assert np.isfinite(float(val))
    g = jax.grad(loss_fn)(params)
    assert all(
        np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.slow
@pytest.mark.parametrize("viterbi", [True, False])
def test_dep_loss_reuse_matches_fresh_dp(joint_setup, viterbi):
    """The joint model's language factors already run the chart DP on
    stop-gradded copies of the loss's potentials; loss_nll reuses their
    totals/grad tables through a straight-through linearization
    (out['dep_reuse']) instead of launching a third DP. Value and
    parameter gradients must match the fresh-DP formulation, and the
    decode short-circuit must return identical heads."""
    model, params, inputs, out = joint_setup
    assert "dep_reuse" in out
    assert "max" in out["dep_reuse"] and "log" in out["dep_reuse"]

    def total(p, reuse):
        o = model.apply(p, inputs)
        if not reuse:
            o = {k: v for k, v in o.items() if k != "dep_reuse"}
        dep_loss, _ = loss_nll(o, inputs["seq_len"], viterbi=viterbi)
        return dep_loss

    v_re, g_re = jax.value_and_grad(total)(params, True)
    v_fr, g_fr = jax.value_and_grad(total)(params, False)
    np.testing.assert_allclose(float(v_re), float(v_fr),
                               rtol=1e-6, atol=1e-6)
    fl_re = jax.tree_util.tree_leaves_with_path(g_re)
    fl_fr = jax.tree_util.tree_leaves_with_path(g_fr)
    assert len(fl_re) == len(fl_fr)
    for (k1, a), (k2, b) in zip(fl_re, fl_fr):
        assert k1 == k2
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(k1),
        )

    out_fresh = {k: v for k, v in out.items() if k != "dep_reuse"}
    for mbr in (False, True):
        h_re = np.asarray(ldndmv_decode(out, inputs["seq_len"], mbr=mbr))
        h_fr = np.asarray(
            ldndmv_decode(out_fresh, inputs["seq_len"], mbr=mbr)
        )
        np.testing.assert_array_equal(h_re, h_fr)


@pytest.mark.slow
def test_joint_decode_grounding(joint_setup):
    model, params, inputs, out = joint_setup
    dec = model.apply(
        params, out, inputs, method=model.decode_grounding_device
    )
    B, L = inputs["token"].shape
    Q = 2 * (L + 1)
    assert dec["txt_to_factor_idx"].shape == (B, Q, 5)
    assert dec["txt_to_img"].shape == (B, Q)
    vis_split = tuple(int(s) for s in
                      np.asarray([5, 25, 5, 1]))
    txt_mask = np.asarray(out["txt_packed"][1])
    formatted = model.format_grounding(
        dec["txt_to_factor_idx"], vis_split,
        np.asarray(inputs["seq_len"]),
        [list(range(5))] * B, txt_mask,
    )
    assert len(formatted) == B
    for b, inst in enumerate(formatted):
        assert len(inst) == int(txt_mask[b].sum())
        for token_cands in inst:
            assert len(token_cands) == 5
            for name, idx in token_cands:
                assert name in ("obj", "rel", "attr", "img")


@pytest.mark.slow
def test_joint_alldep_lang_factors():
    """word+alldep (train only): Q = (L+1) + (L+1)^2 arc queries, loss
    finite, grads flow; eval falls back to the Viterbi-tree factors."""
    rng = np.random.default_rng(7)
    dep = build_ldndmv()
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    cfg = DependencyBoxRelConfig(
        add_rel=True, add_attr=True, add_image=True, match_hidden=16,
        fuse_num_heads=2, language_factor_mode="word+alldep",
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    B, L, P = 3, 5, 4
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((B, P, 10)), jnp.float32
    )
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 3, (B, 1)))
    inputs["vis_available"] = jnp.ones(B, bool)
    params = model.init(jax.random.key(0), inputs)

    # eval path = maxdep fallback
    out_eval = model.apply(params, inputs)
    assert out_eval["match_logit"].shape[2] == 2 * (L + 1)

    # train path = all-arc queries
    def loss_fn(p):
        o = model.apply(p, inputs, deterministic=False,
                        rngs={"dropout": jax.random.key(1)})
        assert o["match_logit"].shape[2] == (L + 1) + (L + 1) ** 2
        dep_loss, dep_aux = loss_nll(o, inputs["seq_len"], viterbi=True)
        total, _ = model.apply(
            p, o, None, inputs, dep_loss, dep_aux, method=model.loss
        )
        return total

    assert np.isfinite(float(loss_fn(params)))
    g = jax.grad(loss_fn)(params)
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_vit_patch_encoder_joint():
    """CLIP/ViT-swap stretch config: patch-grid visual factors drive the
    full joint model; frozen ViT gets zero gradients."""
    from transformers import ViTConfig

    from vlgae_tpu.models import VisViTPatchEncoder, patch_boxes

    rng = np.random.default_rng(11)
    vit_cfg = ViTConfig(
        hidden_size=16, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=32, image_size=32, patch_size=16, num_channels=3,
    )
    vis = VisViTPatchEncoder(n_hidden=24, vit_config=vit_cfg,
                             use_attr=True, use_img=False)
    P = vis.n_patches
    assert P == 4
    bx = patch_boxes(32, 16)
    assert bx.shape == (P, 4) and bx[1].tolist() == [16, 0, 32, 16]

    dep = build_ldndmv()
    cfg = DependencyBoxRelConfig(
        add_rel=True, add_attr=True, add_image=True, match_hidden=16,
        fuse_num_heads=2,
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    B, L = 3, 5
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_pixels"] = jnp.asarray(
        rng.standard_normal((B, 32, 32, 3)), jnp.float32
    )
    inputs["vis_box_feat"] = jnp.zeros((B, P, 1))  # presence flag only
    inputs["vis_box_mask"] = jnp.ones((B, P), bool)
    inputs["vis_available"] = jnp.ones(B, bool)

    # route pixels: the joint model reads vis via its vis_encoder
    params = model.init(jax.random.key(0), inputs)
    out = model.apply(params, inputs)
    n_factors = P + P * P + P + 1
    # map-free eval contract: reduced [B, A, Q] maxima + [B, A, V]
    assert out["match_logit"].shape == (B, B, 2 * (L + 1))
    assert out["match_reduced"][1].shape == (B, B, n_factors)

    def loss_fn(p):
        o = model.apply(p, inputs)
        dep_loss, dep_aux = loss_nll(o, inputs["seq_len"], viterbi=True)
        total, _ = model.apply(
            p, o, None, inputs, dep_loss, dep_aux, method=model.loss
        )
        return total

    assert np.isfinite(float(loss_fn(params)))
    g = jax.grad(loss_fn)(params)
    from flax import traverse_util

    flat = traverse_util.flatten_dict(g)
    vit_norm = sum(float(jnp.abs(v).sum()) for k, v in flat.items()
                   if "vit" in "/".join(map(str, k)))
    head_norm = sum(float(jnp.abs(v).sum()) for k, v in flat.items()
                    if "head" in "/".join(map(str, k)))
    assert vit_norm == 0.0       # frozen backbone
    assert head_norm > 0.0       # factor head trains


@pytest.mark.slow
def test_joint_reduced_gather_cap_img_loss():
    """Alternative strategy branches (ref: joint.py:421-432, 493-499):
    gather_logit='reduced' yields a [B_txt, B_img] caption-image logit and
    cap_img|ce trains on its diagonal."""
    rng = np.random.default_rng(13)
    dep = build_ldndmv()
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    cfg = DependencyBoxRelConfig(
        add_rel=True, add_attr=True, add_image=True, match_hidden=16,
        fuse_num_heads=2, gather_logit_mode="reduced",
        loss_grounding_mode="cap_img|ce", loss_use_pos_prior=False,
        decode_grounding_mode="on_img",
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    B, L, P = 4, 5, 4
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((B, P, 10)), jnp.float32
    )
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 3, (B, 1)))
    inputs["vis_available"] = jnp.ones(B, bool)
    params = model.init(jax.random.key(0), inputs)
    out = model.apply(params, inputs)
    assert out["match_logit"].shape == (B, B)

    def loss_fn(p):
        o = model.apply(p, inputs)
        dep_loss, dep_aux = loss_nll(o, inputs["seq_len"], viterbi=True)
        total, _ = model.apply(
            p, o, None, inputs, dep_loss, dep_aux, method=model.loss
        )
        return total

    assert np.isfinite(float(loss_fn(params)))
    g = jax.grad(loss_fn)(params)
    assert all(np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g))


@pytest.mark.slow
def test_joint_fuse_none(joint_setup):
    """feat_fuse_mode='none' skips the attention augmentation but keeps
    the matching stack (ref: joint.py:346-349)."""
    rng = np.random.default_rng(17)
    dep = build_ldndmv()
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    cfg = DependencyBoxRelConfig(
        add_rel=True, add_attr=True, add_image=True, match_hidden=16,
        feat_fuse_mode="none",
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    _, _, inputs, _ = joint_setup
    params = model.init(jax.random.key(0), inputs)
    out = model.apply(params, inputs)
    B, L = inputs["token"].shape
    assert out["match_logit"].shape[:3] == (B, B, 2 * (L + 1))
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params["params"])
    assert not any("attention" in "/".join(map(str, k)) for k in flat)


def test_rnn_encoder_cat_emb_and_init_versions():
    """cat_emb concatenates raw embeddings after projection
    (ref: rnn_encoder.py:180); init_version selects zy (orthogonal +
    zero bias) vs biased (xavier + forget-gate bias 1)."""
    from flax import traverse_util

    from vlgae_tpu.models import RNNEncoder

    B, L, D = 2, 5, 12
    emb = jnp.asarray(np.random.default_rng(0).standard_normal((B, L, D)),
                      jnp.float32)
    mask = jnp.ones((B, L), bool)
    enc = RNNEncoder(hidden_size=8, num_layers=1, cat_emb=True,
                     cat_emb_size=D, init_version="biased")
    params = enc.init(jax.random.key(0), emb, mask)
    out = enc.apply(params, emb, mask)
    assert out["x"].shape == (B, L, 2 * 8 + D)
    assert enc.get_dim("x") == 2 * 8 + D
    np.testing.assert_allclose(np.asarray(out["x"][..., -D:]),
                               np.asarray(emb), rtol=1e-6)
    # biased init: forget-gate bias block is 1
    flat = traverse_util.flatten_dict(params["params"])
    biases = [v for k, v in flat.items() if k[-1] == "bias"
              and "cell" in "/".join(map(str, k))]
    assert biases and all(
        np.allclose(np.asarray(b)[8:16], 1.0) for b in biases
    )
    # proj_size loudly unsupported (ref: rnn_encoder.py:80)
    bad = RNNEncoder(hidden_size=8, num_layers=1, proj_size=4)
    with pytest.raises(NotImplementedError):
        bad.init(jax.random.key(0), emb, mask)


@pytest.mark.slow
def test_joint_on_img_decode():
    """decode_grounding_mode='on_img' returns per-caption best image and
    no factor alignment (ref: joint.py:506-510)."""
    rng = np.random.default_rng(23)
    dep = build_ldndmv()
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    cfg = DependencyBoxRelConfig(
        add_rel=True, add_attr=True, add_image=True, match_hidden=16,
        gather_logit_mode="reduced", loss_grounding_mode="cap_img|ce",
        decode_grounding_mode="on_img",
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    B, L, P = 4, 5, 4
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((B, P, 10)), jnp.float32
    )
    inputs["vis_box_mask"] = jnp.ones((B, P), bool)
    inputs["vis_available"] = jnp.ones(B, bool)
    params = model.init(jax.random.key(0), inputs)
    out = model.apply(params, inputs)
    g = model.apply(params, out, inputs,
                    method=model.decode_grounding_device)
    assert set(g) == {"txt_to_img"}
    assert g["txt_to_img"].shape == (B,)
    assert np.all(np.asarray(g["txt_to_img"]) < B)


def test_joint_config_rejects_unknown_strategies():
    with pytest.raises(ValueError):
        DependencyBoxRelConfig(language_factor_mode="nope")
    with pytest.raises(ValueError):
        DependencyBoxRelConfig(decode_grounding_mode="bogus")
    with pytest.raises(ValueError):
        DependencyBoxRelConfig(gather_logit_mode="reduced")  # needs on_img


@pytest.mark.slow
def test_reduced_training_matching_matches_full_attmap():
    """The training path's reduced matching (mask-folded bf16/f32 maxes +
    recomputed penalized diagonal; never materializes [B,B,Q,V]) must
    produce the same grounding loss as the full-attention-map path used
    at eval (ref: joint.py:406-499 semantics)."""
    rng = np.random.default_rng(31)
    emb = CompositeEmbedding(
        items=(
            EmbeddingItemCfg("word_embedding", "word", "static",
                             n_vocab=N_WORD, embedding_dim=16),
            EmbeddingItemCfg("tag_embedding", "tag", "static",
                             n_vocab=N_TAG, embedding_dim=8),
        ),
    )
    dep_cfg = LDNDMVConfig(
        context_mode="mean", hidden_size=24, attach_rank=4, dec_rank=4,
        root_rank=4, root_emb_dim=6, dec_emb_dim=6, n_token=N_TOKEN,
        n_tag=N_TAG, ff_dropout=0.0, mid_dropout=0.0,
    )
    dep = DiscriminativeNDMV(
        cfg=dep_cfg, embedding=emb, encoder=MLPEncoder(n_hidden=24),
        token2word=tuple(int(i % N_WORD) for i in range(N_TOKEN)),
        token2tag=tuple(int(i % N_TAG) for i in range(N_TOKEN)),
    )
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    cfg = DependencyBoxRelConfig(
        match_hidden=16, fuse_num_heads=2, fuse_dropout=0.0,
        word_encoder_dropout=0.0, bf16_matmul=False,
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep_cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    B, L, P = 4, 5, 4
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((B, P, 10)), jnp.float32
    )
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 3, (B, 1)))
    inputs["vis_available"] = jnp.ones(B, bool)
    params = model.init(jax.random.key(0), inputs)

    out_train = model.apply(
        params, inputs, deterministic=False,
        rngs={"dropout": jax.random.key(1), "sample": jax.random.key(2)},
    )
    out_eval = model.apply(params, inputs, deterministic=True)
    assert out_train.get("match_reduced") is not None
    assert out_train["match_logit"].ndim == 3  # reduced [B, A, Q]
    # the eval path is now map-free too (BASELINE #4); reconstruct the
    # legacy full [B, A, Q, V] map explicitly as the oracle
    assert out_eval["match_logit"].ndim == 3
    attmap = model.apply(params, out_eval["vis_packed"],
                         out_eval["txt_packed"],
                         method=model.gather_logit)
    assert attmap.ndim == 4
    out_eval = {k: v for k, v in out_eval.items() if k != "match_reduced"}
    out_eval["match_logit"] = attmap

    loss_t, aux_t = model.apply(
        params, out_train, None, inputs, jnp.zeros(()), {}, 1.0,
        method=model.loss,
    )
    loss_e, aux_e = model.apply(
        params, out_eval, None, inputs, jnp.zeros(()), {}, 1.0,
        method=model.loss,
    )
    assert float(loss_t) == pytest.approx(float(loss_e), rel=1e-5)
    for k in aux_e:
        assert float(aux_t[k]) == pytest.approx(float(aux_e[k]), rel=1e-5)

    # gradients agree too (the folded-mask max routes identically)
    def tloss(p, fullmap):
        o = model.apply(
            p, inputs, deterministic=False,
            rngs={"dropout": jax.random.key(1),
                  "sample": jax.random.key(2)},
        )
        if fullmap:  # legacy full-attention-map formulation as oracle
            o = {k: v for k, v in o.items() if k != "match_reduced"}
            o["match_logit"] = model.apply(
                p, o["vis_packed"], o["txt_packed"],
                method=model.gather_logit,
            )
        t, _ = model.apply(p, o, None, inputs, jnp.zeros(()), {}, 1.0,
                           method=model.loss)
        return t

    # Gradients: the two paths take different (equally valid)
    # subgradients of the factor max — the model has EXACT tie groups
    # (rel(i,j) == rel(j,i) from the pairwise-mean relation MLP; arc
    # language factors reuse their head word's features), and the
    # full-map autodiff SPLITS tied gradients while the reduced path's
    # custom VJP routes one winner by argmax, matching the reference's
    # torch .max() semantics. Elementwise equality is therefore not an
    # invariant; total gradient mass and exactness of the custom VJP
    # are (the latter in test_match_maxes_custom_vjp_exact).
    g_t = jax.grad(lambda p: tloss(p, False))(params)
    g_e = jax.grad(lambda p: tloss(p, True))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_t),
                    jax.tree_util.tree_leaves(g_e)):
        na, nb = float(jnp.linalg.norm(a)), float(jnp.linalg.norm(b))
        assert na == pytest.approx(nb, rel=0.15, abs=1e-5), (na, nb)

    # Tie-free configuration: randomize the zero-initialized arc
    # encoder (the source of the exact tie groups — every arc factor
    # collapses to the same vector under zero init) so the subgradient
    # choice is unique; then the two paths must agree ELEMENTWISE,
    # which the norm check above cannot guarantee alone.
    rng_tf = np.random.default_rng(11)

    def randomize_arc(path, x):
        name = "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                        for p in path)
        if "arc_encoder" in name:
            return jnp.asarray(
                0.1 * rng_tf.standard_normal(x.shape), x.dtype
            )
        return x

    params_tf = jax.tree_util.tree_map_with_path(randomize_arc, params)
    lt = model.apply(params_tf, inputs, deterministic=False,
                     rngs={"dropout": jax.random.key(1),
                           "sample": jax.random.key(2)})
    assert lt.get("match_reduced") is not None

    g_t = jax.grad(lambda p: tloss(p, False))(params_tf)
    g_e = jax.grad(lambda p: tloss(p, True))(params_tf)
    flat_t = jax.tree_util.tree_leaves_with_path(g_t)
    flat_e = jax.tree_util.tree_leaves(g_e)
    for (path, a), b in zip(flat_t, flat_e):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6,
            err_msg=str(path),
        )


def test_match_maxes_custom_vjp_exact():
    """The streamed matching product's custom VJP must match the exact
    one-hot-at-argmax gradient, computed manually in numpy."""
    from vlgae_tpu.models.joint import _match_maxes

    rng = np.random.default_rng(7)
    A, Vp, B, Q, D2, CH = 3, 8, 3, 5, 6, 4
    vis = jnp.asarray(rng.standard_normal((A, Vp, D2)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((B, Q, D2)), jnp.float32)
    nc = Vp // CH

    def loss(v, t):
        m, mv = _match_maxes(v, t, CH)
        return jnp.sum(jnp.sin(m)) + jnp.sum(jnp.cos(mv * 0.5))

    (val, (dvis, dtxt)) = jax.value_and_grad(loss, argnums=(0, 1))(vis, txt)

    att = np.einsum("avd,bqd->avbq", np.asarray(vis), np.asarray(txt))
    m = att.max(1)
    mv = att.reshape(A, nc, CH, B, Q).max(-1).transpose(1, 0, 2, 3)
    np.testing.assert_allclose(
        float(val), np.sin(m).sum() + np.cos(mv * 0.5).sum(), rtol=1e-5)

    dm = np.cos(m)
    dmv = -0.5 * np.sin(mv * 0.5)
    im = att.argmax(1)
    iv = att.reshape(A, nc, CH, B, Q).argmax(-1).transpose(1, 0, 2, 3)
    datt = np.zeros_like(att)
    aa, bb, qq = np.meshgrid(np.arange(A), np.arange(B), np.arange(Q),
                             indexing="ij")
    np.add.at(datt, (aa, im, bb, qq), dm)
    for c in range(nc):
        ca, cc, cb = np.meshgrid(np.arange(A), np.arange(CH), np.arange(B),
                                 indexing="ij")
        np.add.at(datt, (ca, c * CH + cc, cb, iv[c]), dmv[c])
    want_dvis = np.einsum("avbq,bqd->avd", datt, np.asarray(txt))
    want_dtxt = np.einsum("avbq,avd->bqd", datt, np.asarray(vis))
    np.testing.assert_allclose(np.asarray(dvis), want_dvis,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dtxt), want_dtxt,
                               rtol=1e-4, atol=1e-5)


def test_streamed_matching_model_path():
    """The gated train_match_chunk > 0 path (streamed product + argmax
    VJP) produces the same loss as the default path through the full
    model, and finite grads."""
    rng = np.random.default_rng(11)
    emb = CompositeEmbedding(
        items=(
            EmbeddingItemCfg("word_embedding", "word", "static",
                             n_vocab=N_WORD, embedding_dim=16),
            EmbeddingItemCfg("tag_embedding", "tag", "static",
                             n_vocab=N_TAG, embedding_dim=8),
        ),
    )
    dep_cfg = LDNDMVConfig(
        context_mode="mean", hidden_size=24, attach_rank=4, dec_rank=4,
        root_rank=4, root_emb_dim=6, dec_emb_dim=6, n_token=N_TOKEN,
        n_tag=N_TAG, ff_dropout=0.0, mid_dropout=0.0,
    )
    dep = DiscriminativeNDMV(
        cfg=dep_cfg, embedding=emb, encoder=MLPEncoder(n_hidden=24),
        token2word=tuple(int(i % N_WORD) for i in range(N_TOKEN)),
        token2tag=tuple(int(i % N_TAG) for i in range(N_TOKEN)),
    )
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    B, L, P = 4, 5, 4
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((B, P, 10)), jnp.float32
    )
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 3, (B, 1)))
    inputs["vis_available"] = jnp.ones(B, bool)

    losses = {}
    for chunk in (0, 8):
        cfg = DependencyBoxRelConfig(
            match_hidden=16, fuse_num_heads=2, fuse_dropout=0.0,
            word_encoder_dropout=0.0, bf16_matmul=False,
            train_match_chunk=chunk,
        )
        model = DependencyBoxRel(
            cfg=cfg, dep_cfg=dep_cfg, dependency=dep, vis_encoder=vis,
            pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
        )
        params = model.init(jax.random.key(0), inputs)

        def tloss(p):
            o = model.apply(
                p, inputs, deterministic=False,
                rngs={"dropout": jax.random.key(1),
                      "sample": jax.random.key(2)},
            )
            t, _ = model.apply(p, o, None, inputs, jnp.zeros(()), {}, 1.0,
                               method=model.loss)
            return t

        loss, grads = jax.value_and_grad(tloss)(params)
        assert all(np.all(np.isfinite(l))
                   for l in jax.tree_util.tree_leaves(grads))
        losses[chunk] = float(loss)
    assert losses[0] == pytest.approx(losses[8], rel=1e-5), losses


def test_match_kernel_auto_defers_to_gspmd_on_data_mesh(monkeypatch):
    """match_kernel='auto' picks the Pallas matching kernel single-chip
    (it wins there) but the EINSUM formulation on a >1-way data mesh:
    the kernel is opaque to GSPMD (full-B^2 replicated per chip), while
    the einsum partitions natively. Explicit 'pallas' still forces it."""
    import vlgae_tpu.ops as ops_pkg
    import vlgae_tpu.ops.match_pallas as mp

    rng = np.random.default_rng(13)
    emb = CompositeEmbedding(
        items=(
            EmbeddingItemCfg("word_embedding", "word", "static",
                             n_vocab=N_WORD, embedding_dim=16),
            EmbeddingItemCfg("tag_embedding", "tag", "static",
                             n_vocab=N_TAG, embedding_dim=8),
        ),
    )
    dep_cfg = LDNDMVConfig(
        context_mode="mean", hidden_size=24, attach_rank=4, dec_rank=4,
        root_rank=4, root_emb_dim=6, dec_emb_dim=6, n_token=N_TOKEN,
        n_tag=N_TAG, ff_dropout=0.0, mid_dropout=0.0,
    )
    dep = DiscriminativeNDMV(
        cfg=dep_cfg, embedding=emb, encoder=MLPEncoder(n_hidden=24),
        token2word=tuple(int(i % N_WORD) for i in range(N_TOKEN)),
        token2tag=tuple(int(i % N_TAG) for i in range(N_TOKEN)),
    )
    vis = VisBoxRelSimpleEncoder(n_hidden=24, img_feat=True, use_attr=True,
                                 use_img=False)
    B, L, P = 4, 5, 4
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((B, P, 10)), jnp.float32
    )
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 3, (B, 1)))
    inputs["vis_available"] = jnp.ones(B, bool)
    cfg = DependencyBoxRelConfig(
        match_hidden=16, fuse_num_heads=2, fuse_dropout=0.0,
        word_encoder_dropout=0.0, bf16_matmul=True, match_kernel="auto",
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep_cfg, dependency=dep, vis_encoder=vis,
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    params = model.init(jax.random.key(0), inputs)

    calls = []

    def stub(vis_b, txt_b, interpret, vis_bias=None, txt_bias=None):
        calls.append(1)
        att = jnp.einsum("avd,bqd->baqv", vis_b, txt_b)
        if vis_bias is not None:
            att = att + vis_bias[None, :, None, :]
        if txt_bias is not None:
            att = att + txt_bias[:, None, :, None]
        return (jnp.max(att, -1).astype(jnp.float32),
                jnp.max(att, -2).astype(jnp.float32))

    monkeypatch.setattr(mp, "match_maxes_pallas", stub)
    monkeypatch.setattr(ops_pkg, "pallas_available", lambda: True)
    # the forced "on TPU" flag also routes the chart DPs to the compiled
    # kernels; point those at their interpret twins (CPU-executable)
    monkeypatch.setattr(ops_pkg, "dmv_partition_pallas",
                        ops_pkg.dmv_partition_pallas_interpret)
    monkeypatch.setattr(ops_pkg, "dmv_max_pallas",
                        ops_pkg.dmv_max_pallas_interpret)

    def run():
        return model.apply(
            params, inputs, deterministic=False,
            rngs={"dropout": jax.random.key(1), "sample": jax.random.key(2)},
        )

    # single chip: auto picks the kernel
    monkeypatch.setattr(ops_pkg, "data_parallel_degree", lambda: 1)
    run()
    assert calls, "auto did not pick the kernel single-chip"

    # >1-way data mesh: auto defers to the partitionable einsum
    calls.clear()
    monkeypatch.setattr(ops_pkg, "data_parallel_degree", lambda: 8)
    out = run()
    assert not calls, "auto picked the opaque kernel on a data mesh"
    assert out.get("match_reduced") is not None


def test_einsum_fallback_oom_gate_fails_loudly(monkeypatch):
    """When the matching falls back to the full [B,A,Q,V] einsum past
    the byte budget it must raise a clear error naming the mode and
    shape, not die as a raw XLA OOM (VERDICT r4 #6; at the reference's
    word+alldep len-50 shapes the product is ~30 GB,
    ref: src/model/joint.py:294-339). A tiny budget stands in for the
    oversized shape so the test stays cheap."""
    monkeypatch.setenv("VLGAE_MATCH_EINSUM_BUDGET_GB", "0.000001")
    rng = np.random.default_rng(7)
    B, L, P = 4, 5, 4
    inputs = make_inputs(rng, B=B, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((B, P, 10)), jnp.float32)
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 3, (B, 1)))
    inputs["vis_available"] = jnp.ones(B, bool)
    dep = build_ldndmv()
    cfg = DependencyBoxRelConfig(
        match_hidden=16, fuse_num_heads=2, fuse_dropout=0.0,
        word_encoder_dropout=0.0, bf16_matmul=False, match_kernel="xla",
    )
    model = DependencyBoxRel(
        cfg=cfg, dep_cfg=dep.cfg, dependency=dep,
        vis_encoder=VisBoxRelSimpleEncoder(
            n_hidden=24, img_feat=True, use_attr=True, use_img=False),
        pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
    )
    params = model.init(jax.random.key(0), inputs)
    with pytest.raises(ValueError) as exc:
        model.apply(params, inputs, deterministic=False,
                    rngs={"dropout": jax.random.key(1),
                          "sample": jax.random.key(2)})
    msg = str(exc.value)
    assert "attention product" in msg and "language_factor_mode" in msg
    assert "Q=" in msg and "V=" in msg and "train_match_chunk" in msg
    # the real word+alldep shape trips the DEFAULT budget: at the
    # recipe scale (B=64, len 50 -> Q=(50+1)^2, V=703, f32) the product
    # is ~30 GiB vs the 4 GiB default
    assert 64 * 64 * 51 * 51 * 703 * 4 > 4 * 2**30


@pytest.mark.slow
def test_mapfree_eval_decode_matches_fullmap(joint_setup):
    """BASELINE #4 / VERDICT r4 #2: the eval decode through the reduced
    outputs (diagonal [B,Q,V] via _diag_att + [B,A,Q] cross-image
    maxima) must be BIT-IDENTICAL to the legacy full-[B,A,Q,V]-map
    decode in the f32 config — same top-5 indices, same txt_to_img,
    same post-edit logits (ref: src/model/joint.py:506-629)."""
    model, params, inputs, out = joint_setup
    assert out["match_logit"].ndim == 3  # new reduced eval path

    # legacy full-map decode, reconstructed explicitly
    vis, txt = out["vis_packed"], out["txt_packed"]
    attmap = model.apply(params, vis, txt, method=model.gather_logit)
    out_full = dict(out)
    out_full["match_logit"] = attmap
    out_full.pop("match_reduced", None)

    dec_new = model.apply(params, out, inputs,
                          method=model.decode_grounding_device)
    dec_old = model.apply(params, out_full, inputs,
                          method=model.decode_grounding_device)
    np.testing.assert_array_equal(
        np.asarray(dec_new["txt_to_factor_idx"]),
        np.asarray(dec_old["txt_to_factor_idx"]),
    )
    np.testing.assert_array_equal(
        np.asarray(dec_new["txt_to_img"]),
        np.asarray(dec_old["txt_to_img"]),
    )
    log_new = model.apply(params, out, inputs,
                          method=model.decode_grounding_logits)
    log_old = model.apply(params, out_full, inputs,
                          method=model.decode_grounding_logits)
    np.testing.assert_array_equal(np.asarray(log_new),
                                  np.asarray(log_old))

    # the eval forward graph must contain no [B, A, Q, V]-sized tensor
    B, L = inputs["token"].shape
    P = inputs["vis_box_feat"].shape[1]
    V = P + P * P + P + 1
    Q = 2 * (L + 1)
    jaxpr = jax.make_jaxpr(
        lambda p: model.apply(p, inputs, deterministic=True)
    )(params)
    banned = {(B, B, Q, V), (B, B, V, Q)}
    for eqn in jaxpr.jaxpr.eqns:
        for var in eqn.outvars:
            assert tuple(getattr(var.aval, "shape", ())) not in banned, (
                f"full attention map materialized by {eqn.primitive}"
            )
