"""FULL-MODEL golden parity vs the reference implementation.

tests/golden/model_ref.npz holds weights + inputs + outputs produced by
running the reference's COMPOSED model code (DiscriminativeNDMV._forward
potential construction, DependencyBoxRel matching stack) — see
scripts/make_model_golden.py. Loading the same weights into the flax
models must reproduce the outputs, extending the per-layer nn goldens
(test_nn_golden.py) to the full wiring: scorer-stack composition,
token gathers, triangular direction resolution, function-word masking,
DMV1o.merge, visual/language factor packing, attention maps, the
factor|ce grounding loss (pinned through its GRADIENTS — the
self-normalized value is degenerate by construction), cap_img|ce, the
aug_with_matching fusion block, and the on_factor/on_img grounding
decode (logits + unique-rank indices + the index formatter — the -1e10
edits collapse onto an exact f32 tie plateau, see the decode test).

Mask fills differ by convention (see ``masked_close``).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlgae_tpu.models import (
    CompositeEmbedding,
    DependencyBoxRel,
    DependencyBoxRelConfig,
    DiscriminativeNDMV,
    LDNDMVConfig,
    MLPEncoder,
    VisBoxRelSimpleEncoder,
)
from vlgae_tpu.models.embedding import EmbeddingItemCfg

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "model_ref.npz")


@pytest.fixture(scope="module")
def ref():
    return np.load(GOLDEN)


def dense(ref, key):
    """torch nn.Linear -> flax Dense params (kernel transposed)."""
    out = {"kernel": ref[f"{key}.weight"].T}
    if f"{key}.bias" in ref:
        out["bias"] = ref[f"{key}.bias"]
    return out


def masked_close(got, want, rtol=1e-5, atol=1e-5, msg="", thresh=-1e8):
    """Mask-fill constants differ across the two codebases (reference
    -INF = -1e20; chart NEGINF here = -1e12; matching INF here = -1e9,
    bf16-safe) — any pair both below ``thresh`` counts as equal; real
    scores are O(10)."""
    got, want = np.asarray(got), np.asarray(want)
    assert got.shape == want.shape, (msg, got.shape, want.shape)
    both_masked = (got < thresh) & (want < thresh)
    np.testing.assert_allclose(
        np.where(both_masked, 0.0, got), np.where(both_masked, 0.0, want),
        rtol=rtol, atol=atol, err_msg=msg,
    )


# ---------------------------------------------------------------------------
# DiscriminativeNDMV._forward (ref: ldndmv.py:171-216)
# ---------------------------------------------------------------------------

def _ldndmv_params(d):
    """Map the reference weights into the flax param tree.

    The valence-branch linears cross-map: the reference stacks
    [NOCHILD_linear, HASCHILD_linear] outputs on the valence axis
    (ref: dmv_spec.py:42-43) while this repo stacks its [HASCHILD,
    NOCHILD] branches — with shared DP constants (HASCHILD=0 in both,
    ref: dmv.py:7-15) the branch NAMED NoChild in the reference fills
    the HASCHILD slot, so its weights load into this repo's HASCHILD
    branch (and vice versa) for identical tables.
    """
    def dd(key):
        return dense(d, f"ldndmv/param/{key}")

    return {
        "embedding": {
            "word_embedding": {"embedding": d["in/word_table"]},
            "tag_embedding": {"embedding": d["in/tag_table"]},
        },
        "head_ff": {"Dense_0": dd("head_ff.linear")},
        "child_ff": {"Dense_0": dd("child_ff.linear")},
        "root_ff": {"Dense_0": dd("root_ff.linear")},
        "dec_ff": {"Dense_0": dd("dec_ff.linear")},
        "mid_ff": {
            "HASCHILD": dd("mid_ff.NOCHILD_linear"),   # cross-map
            "NOCHILD": dd("mid_ff.HASCHILD_linear"),   # cross-map
            "LEFT": dd("mid_ff.LEFT_linear"),
            "RIGHT": dd("mid_ff.RIGHT_linear"),
            "valence": dd("mid_ff.valence_linear"),
            "direction": dd("mid_ff.direction_linear"),
            "mid1": dd("mid_ff.linear1"),
            "mid2": dd("mid_ff.linear2"),
        },
        "attach_scorer": {
            "project1": dd("attach_scorer.project1"),
            "project2": dd("attach_scorer.project2"),
        },
        "dec_scorer": {
            "project1": dd("dec_scorer.project1"),
            "project2": dd("dec_scorer.project2"),
        },
        "root_scorer": {
            "project1": dd("root_scorer.project1"),
            "project2": dd("root_scorer.project2"),
        },
        "root_emb": d["ldndmv/param/root_emb"],
        "dec_emb": d["ldndmv/param/dec_emb"],
    }


def _build_ldndmv(d, extended_valence: bool, encoder=None,
                  strict_pad_context: bool = False, seq_len=None):
    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("word_embedding", "word", "static",
                         n_vocab=9, embedding_dim=8),
        EmbeddingItemCfg("tag_embedding", "tag", "static",
                         n_vocab=6, embedding_dim=4),
    ))
    cfg = LDNDMVConfig(
        context_mode="mean", hidden_size=16, attach_rank=3, dec_rank=3,
        root_rank=3, root_emb_dim=6, dec_emb_dim=5, n_token=10, n_tag=6,
        ff_dropout=0.0, extended_valence=extended_valence,
        function_mask=True, strict_pad_context=strict_pad_context,
    )
    model = DiscriminativeNDMV(
        cfg=cfg, embedding=emb, encoder=encoder,
        token2word=tuple(int(i) for i in d["in/token2word"]),
        token2tag=tuple(int(i) for i in d["in/token2tag"]),
        function_mask_ids=tuple(
            int(i) for i in d["ldndmv/in/function_mask"]
        ),
    )
    if seq_len is None:
        seq_len = d["in/seq_len"]
    inputs = {
        "token": jnp.asarray(d["in/tokens"]),
        "tag": jnp.asarray(d["in/tags"]),
        "word": jnp.asarray(d["in/token2word"][d["in/tokens"]]),
        "seq_len": jnp.asarray(np.asarray(seq_len).astype(np.int32)),
    }
    encoded = {"x": jnp.asarray(d["in/x_enc"])}
    return model, {"params": _ldndmv_params(d)}, inputs, encoded


@pytest.mark.parametrize("tag,extended", [
    ("ldndmv", True), ("ldndmv_nev", False),
])
def test_ldndmv_forward_matches_reference(ref, tag, extended):
    model, params, inputs, encoded = _build_ldndmv(ref, extended)
    out = model.apply(params, inputs, encoded=encoded, deterministic=True)
    # emb is rebuilt from the same tables the reference token_emb used
    np.testing.assert_allclose(
        np.asarray(out["emb"]), ref["in/emb"], rtol=1e-6, atol=1e-7
    )
    masked_close(out["attach"], ref[f"{tag}/out/attach"], msg="attach")
    np.testing.assert_allclose(
        np.asarray(out["dec"]), ref[f"{tag}/out/dec"],
        rtol=1e-4, atol=1e-5, err_msg="dec",
    )
    np.testing.assert_allclose(
        np.asarray(out["root"]), ref[f"{tag}/out/root"],
        rtol=1e-4, atol=1e-5, err_msg="root",
    )
    np.testing.assert_allclose(
        np.asarray(out["root_rule"]), ref[f"{tag}/out/root_rule"],
        rtol=1e-4, atol=1e-5, err_msg="root_rule",
    )
    np.testing.assert_allclose(
        np.asarray(out["attach_rule"]), ref[f"{tag}/out/attach_rule"],
        rtol=1e-4, atol=1e-5, err_msg="attach_rule",
    )
    masked_close(out["merged_dec"], ref[f"{tag}/out/merged_dec"],
                 msg="merged_dec")
    masked_close(out["merged_attach"], ref[f"{tag}/out/merged_attach"],
                 msg="merged_attach")


def test_ldndmv_ragged_strict_context_matches_reference(ref):
    """Ragged-batch parity in strict mode (ref: ldndmv.py:224): the
    reference sentence-context mean is UNMASKED over padding, so on a
    ragged batch every potential table depends on the pad rows of
    x_enc. strict_pad_context=True must reproduce those tables; the
    default masked mode must NOT (guarding that the flag is live)."""
    lengths = ref["ldndmv_ragged/in/lengths"]
    model, params, inputs, encoded = _build_ldndmv(
        ref, True, strict_pad_context=True, seq_len=lengths
    )
    out = model.apply(params, inputs, encoded=encoded, deterministic=True)
    for key in ("attach", "dec", "root", "merged_dec", "merged_attach"):
        masked_close(out[key], ref[f"ldndmv_ragged/out/{key}"], msg=key)

    # the flag is live: on this ragged batch the default masked context
    # diverges from the strict (reference, unmasked) context by O(1) —
    # asserted on the context itself because the tiny golden scorers
    # nearly wash the context out of the downstream tables
    x = ref["in/x_enc"]
    mask = np.arange(x.shape[1])[None, :] < lengths[:, None]
    ctx = {}
    for strict in (True, False):
        m, p, _, _ = _build_ldndmv(
            ref, True, strict_pad_context=strict, seq_len=lengths
        )
        c, _ = m.apply(
            p, {"x": jnp.asarray(x)}, jnp.asarray(mask),
            method=lambda mod, e, k: mod.extract_sent_repr(
                e, k, deterministic=True
            ),
        )
        ctx[strict] = np.asarray(c)
    np.testing.assert_allclose(
        ctx[True][:, 0], x.mean(1), rtol=1e-5, atol=1e-6
    )
    assert np.abs(ctx[True] - ctx[False]).max() > 0.1


@pytest.mark.parametrize("tag,mode", [
    ("ldndmv_vae", "all:vae"), ("ldndmv_ib", "all:ib"),
])
def test_variational_context_matches_reference(ref, tag, mode):
    """extract_sent_repr eval branches (ref: ldndmv.py:218-250):
    context = posterior mean; VAE KL / IB Gaussian-KL values."""
    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("word_embedding", "word", "static",
                         n_vocab=9, embedding_dim=8),
    ))
    cfg = LDNDMVConfig(
        context_mode="mean", variational_mode=mode, z_dim=3,
        hidden_size=16, n_token=10, n_tag=6, ff_dropout=0.0,
    )
    model = DiscriminativeNDMV(cfg=cfg, embedding=emb, encoder=None)
    x = jnp.asarray(ref["in/x_enc"])
    B, L, _ = x.shape
    mask = jnp.ones((B, L), bool)

    variables = model.init(
        jax.random.key(0), {"x": x}, mask,
        method=lambda m, e, k: m.extract_sent_repr(e, k,
                                                   deterministic=True),
    )
    p = dict(variables["params"])
    p["variational_enc"] = dense(ref, f"{tag}/param/variational_enc")
    if mode.endswith("ib"):
        p["target_mean"] = ref[f"{tag}/param/target_mean"]
        p["target_lvar"] = ref[f"{tag}/param/target_lvar"]
    context, kl = model.apply(
        {"params": p}, {"x": x}, mask,
        method=lambda m, e, k: m.extract_sent_repr(e, k,
                                                   deterministic=True),
    )
    np.testing.assert_allclose(
        np.asarray(context), ref[f"{tag}/out/context"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(kl), ref[f"{tag}/out/kl"], rtol=1e-4, atol=1e-5
    )

# ---------------------------------------------------------------------------
# DependencyBoxRel matching stack (ref: joint.py)
# ---------------------------------------------------------------------------


def _joint_params(d, init_params):
    p = jax.tree_util.tree_map(np.asarray, dict(init_params))

    def dd(key):
        return dense(d, f"joint/param/{key}")

    p["word_encoder"] = {"Dense_0": dd("word_encoder.linear")}
    p["child_encoder"] = {"Dense_0": dd("child_encoder.linear")}
    p["parent_encoder"] = {"Dense_0": dd("parent_encoder.linear")}
    p["arc_encoder_w1"] = d["joint/param/arc_encoder_w1"]
    p["arc_encoder_w2"] = d["joint/param/arc_encoder_w2"]
    p["arc_encoder_b"] = d["joint/param/arc_encoder_b"]
    p["vis_mlp_pre_matching"] = {
        "kernel": d["joint/param/vis_mlp_pre_matching.weight"].T
    }
    p["feat_layernorm"] = {
        "scale": d["joint/param/feat_layernorm.weight"],
        "bias": d["joint/param/feat_layernorm.bias"],
    }
    p["dependency"] = _ldndmv_params(d)
    return p


@pytest.fixture(scope="module")
def joint(ref):
    """(model_simple, model_reduced, params, inputs, vis_encoded, mask)"""
    d = ref
    dep_model, _, inputs, _ = _build_ldndmv(
        d, True, encoder=MLPEncoder(n_hidden=12)
    )
    kw = dict(
        add_rel=True, add_attr=True, add_image=False, add_marginal=True,
        language_factor_mode="word+maxdep", match_hidden=8,
        feat_fuse_mode="attention", fuse_num_heads=2, fuse_dropout=0.0,
        fuse_aug_with_matching=True, loss_grounding_mode="factor|ce",
        loss_use_pos_prior=True, loss_vis2txt=1.0,
        word_encoder_dropout=0.0, bf16_matmul=False,
        compact_rel_train=False, grounding_interpolation=0.3,
    )
    mk = dict(
        dep_cfg=dep_model.cfg, dependency=dep_model,
        vis_encoder=VisBoxRelSimpleEncoder(
            n_hidden=12, img_feat=True, use_attr=True, use_img=False
        ),
        # POS priors mirror the generator's disjoint tag groups
        pos_for_obj=(0, 1), pos_for_rel=(2,), pos_for_attr=(4,),
    )
    model = DependencyBoxRel(
        cfg=DependencyBoxRelConfig(gather_logit_mode="simple", **kw), **mk
    )
    model_red = DependencyBoxRel(
        cfg=DependencyBoxRelConfig(
            gather_logit_mode="reduced", decode_grounding_mode="on_img",
            **kw
        ),
        **mk,
    )
    B, P = d["joint/in/box_mask"].shape
    full_inputs = dict(inputs)
    full_inputs.update({
        "vis_box_feat": jnp.zeros((B, P, 7), jnp.float32),
        "vis_box_mask": jnp.asarray(d["joint/in/box_mask"]),
        "vis_available": jnp.ones(B, bool),
    })
    variables = model.init(jax.random.key(0), full_inputs,
                           deterministic=True)
    params = {"params": _joint_params(d, variables["params"])}
    vis_encoded = {
        "box": jnp.asarray(d["joint/in/box_feat"]),
        "rel": jnp.asarray(d["joint/in/rel_feat"]),
        "attr": jnp.asarray(d["joint/in/attr_feat"]),
    }
    L = d["in/tokens"].shape[1]
    mask = (
        jnp.arange(L)[None, :]
        < jnp.asarray(d["in/seq_len"].astype(np.int32))[:, None]
    )
    return model, model_red, params, full_inputs, vis_encoded, mask


def test_vis_feat_matches_reference(ref, joint):
    model, _, params, inputs, vis_encoded, _ = joint
    vis = model.apply(params, inputs, vis_encoded,
                      method=DependencyBoxRel.vis_feat)
    np.testing.assert_allclose(
        np.asarray(vis[0]), ref["joint/out/vis_feat"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(vis[1]), ref["joint/out/vis_mask"]
    )
    np.testing.assert_array_equal(
        np.asarray(vis[2]), ref["joint/out/vis_split"]
    )


def test_lang_feat_word_matches_reference(ref, joint):
    model, _, params, inputs, _, mask = joint
    txt = model.apply(params, inputs, {"x": jnp.asarray(ref["in/x_enc"])},
                      None, mask, True,
                      method=DependencyBoxRel.lang_feat_word_only)
    np.testing.assert_allclose(
        np.asarray(txt[0]), ref["joint/out/word_repr"],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(txt[1]), ref["joint/out/word_mask"]
    )
    np.testing.assert_allclose(
        np.asarray(txt[2]), ref["joint/out/word_marginal"], rtol=0
    )


def test_lang_feat_max_tree_matches_reference(ref, joint):
    """Pins the COMPOSITION: Viterbi heads -> the reference's
    reversed-arc marginal gather (ref: joint.py:264) -> root-mean
    prepend -> arc factorized bilinear -> [word; arc] packing."""
    model, _, params, inputs, _, mask = joint
    lang_score = {
        "merged_dec": jnp.asarray(ref["ldndmv/out/merged_dec"]),
        "merged_attach": jnp.asarray(ref["ldndmv/out/merged_attach"]),
    }
    txt = model.apply(params, inputs, {"x": jnp.asarray(ref["in/x_enc"])},
                      lang_score, mask, True,
                      method=DependencyBoxRel.lang_feat_max_tree)
    np.testing.assert_array_equal(
        np.asarray(txt[1]), ref["joint/out/maxdep_mask"]
    )
    np.testing.assert_allclose(
        np.asarray(txt[2]), ref["joint/out/maxdep_marginal"],
        rtol=1e-4, atol=1e-5, err_msg="txt_marginal",
    )
    np.testing.assert_allclose(
        np.asarray(txt[0]), ref["joint/out/maxdep_txt"],
        rtol=1e-4, atol=1e-5, err_msg="txt factors",
    )


def _word_txt(ref, joint):
    model, _, params, inputs, _, mask = joint
    return model.apply(params, inputs,
                       {"x": jnp.asarray(ref["in/x_enc"])}, None, mask,
                       True, method=DependencyBoxRel.lang_feat_word_only)


def test_gather_logit_matches_reference(ref, joint):
    model, model_red, params, inputs, vis_encoded, mask = joint
    vis = model.apply(params, inputs, vis_encoded,
                      method=DependencyBoxRel.vis_feat)
    txt = _word_txt(ref, joint)
    attmap = model.apply(params, vis, txt,
                         method=DependencyBoxRel.gather_logit)
    masked_close(attmap, ref["joint/out/attmap"], rtol=1e-4, atol=1e-5,
                 msg="attmap")
    logit = model_red.apply(params, vis, txt,
                            method=DependencyBoxRel.gather_logit)
    np.testing.assert_allclose(
        np.asarray(logit), ref["joint/out/logit_reduced"],
        rtol=1e-4, atol=1e-5,
    )


def test_factor_ce_loss_grads_match_reference(ref, joint):
    """The self-normalized loss VALUE is degenerate
    (== num_token * (1 + vis2txt)); the reference chain is pinned
    through the input GRADIENTS instead (packing -> einsum -> masks ->
    POS priors -> max -> log_softmax over images -> marginal weighting
    -> normalization scale)."""
    model, _, params, inputs, vis_encoded, mask = joint
    loss_inputs = {"tag": inputs["tag"], "seq_len": inputs["seq_len"]}

    def loss_fn(box, rel, attr, x):
        vis = model.apply(params, inputs,
                          {"box": box, "rel": rel, "attr": attr},
                          method=DependencyBoxRel.vis_feat)
        txt = model.apply(params, inputs, {"x": x}, None, mask, True,
                          method=DependencyBoxRel.lang_feat_word_only)
        att = model.apply(params, vis, txt,
                          method=DependencyBoxRel.gather_logit)
        out = {"match_logit": att, "txt_packed": txt, "vis_packed": vis}
        loss, _ = model.apply(
            params, out, loss_inputs,
            method=DependencyBoxRel.loss_grounding_factor_ce,
        )
        return loss

    args = (jnp.asarray(ref["joint/in/box_feat"]),
            jnp.asarray(ref["joint/in/rel_feat"]),
            jnp.asarray(ref["joint/in/attr_feat"]),
            jnp.asarray(ref["in/x_enc"]))
    loss = loss_fn(*args)
    np.testing.assert_allclose(
        np.asarray(loss), ref["joint/out/factor_ce_loss"], rtol=1e-5
    )
    grads = jax.grad(loss_fn, argnums=(0, 1, 2, 3))(*args)
    for got, key in zip(grads, ("box", "rel", "attr", "x")):
        np.testing.assert_allclose(
            np.asarray(got), ref[f"joint/out/factor_ce_grad_{key}"],
            rtol=1e-4, atol=1e-6, err_msg=key,
        )


def test_cap_img_loss_matches_reference(ref, joint):
    _, model_red, params, inputs, vis_encoded, mask = joint
    vis = model_red.apply(params, inputs, vis_encoded,
                          method=DependencyBoxRel.vis_feat)
    txt = _word_txt(ref, joint)
    logit = model_red.apply(params, vis, txt,
                            method=DependencyBoxRel.gather_logit)
    loss, _ = model_red.apply(
        params, {"match_logit": logit}, inputs,
        method=DependencyBoxRel.loss_grounding_cap_img,
    )
    np.testing.assert_allclose(
        np.asarray(loss), ref["joint/out/cap_img_loss"], rtol=1e-5
    )


def test_fusion_matches_reference(ref, joint):
    """aug_with_matching: softmax soft-match over visual factors added
    into the text encoding + layernorm (ref: joint.py:658-675)."""
    model, _, params, inputs, vis_encoded, mask = joint
    fused = model.apply(
        params, inputs, vis_encoded,
        {"x": jnp.asarray(ref["in/x_enc"])}, mask, True,
        method=DependencyBoxRel.fuse_with_matching,
    )
    np.testing.assert_allclose(
        np.asarray(fused["x"]), ref["joint/out/fused_x"],
        rtol=1e-4, atol=1e-5,
    )


def test_decode_grounding_matches_reference(ref, joint):
    """on_factor decode (ref: joint.py:512-629): POS priors at 1e10
    strength -> best-box heuristics for rel/attr -> top-5 -> flat-index
    to (factor, box-id) mapping; plus the on_img argmax decode."""
    import json

    model, model_red, params, inputs, vis_encoded, mask = joint
    vis = model.apply(params, inputs, vis_encoded,
                      method=DependencyBoxRel.vis_feat)
    lang_score = {
        "merged_dec": jnp.asarray(ref["ldndmv/out/merged_dec"]),
        "merged_attach": jnp.asarray(ref["ldndmv/out/merged_attach"]),
    }
    txt = model.apply(params, inputs, {"x": jnp.asarray(ref["in/x_enc"])},
                      lang_score, mask, True,
                      method=DependencyBoxRel.lang_feat_max_tree)
    attmap = model.apply(params, vis, txt,
                         method=DependencyBoxRel.gather_logit)
    masked_close(attmap, ref["joint/out/attmap_maxdep"],
                 rtol=1e-4, atol=1e-5, msg="attmap_maxdep")

    out = {"match_logit": attmap, "vis_packed": vis, "txt_packed": txt}
    dec = model.apply(params, out, inputs,
                      method=DependencyBoxRel.decode_grounding_device)
    box_index = ref["joint/in/box_index"]

    # The -1e10-scale POS-prior/heuristic edits collapse every edited
    # cell onto an EXACT f32 plateau (ulp(1e10) = 1024 > any score), so
    # blind top-5 list equality would test torch-argsort tie order.
    # Pin instead: (1) the full post-edit logit matrix, (2) exact index
    # agreement at every rank whose value is strictly unique, (3) value
    # agreement at every rank, (4) the index -> (factor, box-id)
    # formatter on the REFERENCE's own top-5 indices.
    ref_logit = ref["joint/out/decode_logit"]  # [B, Q, V] post-edit

    # (1) our decode must re-derive the same edited logits; recompute
    # them by undoing nothing — decode_grounding_device applies mask ->
    # prior -> heuristics exactly; recover via a second call that
    # returns top_k over our logits and compare through the values
    our_logit = model.apply(
        params, out, inputs,
        method=DependencyBoxRel.decode_grounding_logits,
    )
    masked_close(our_logit, ref_logit, rtol=1e-4, atol=1e-4,
                 thresh=-1e19, msg="decode logits")

    ref_idx = ref["joint/out/decode_top5_idx"]  # [B, Q, 5]
    got_idx = np.asarray(dec["txt_to_factor_idx"])
    B, Q, _ = got_idx.shape
    take = np.take_along_axis
    ref_vals = take(ref_logit, ref_idx, axis=-1)
    got_vals = take(ref_logit, got_idx, axis=-1)
    # (3) same value at every rank (ties permute within the plateau)
    np.testing.assert_allclose(got_vals, ref_vals, rtol=1e-4,
                               err_msg="top-5 values")
    # (2) exact index wherever the rank's value is strictly unique in
    # the whole row
    for b in range(B):
        for q in range(Q):
            row = ref_logit[b, q]
            for k in range(5):
                v = ref_vals[b, q, k]
                # 'unique' must be judged LOOSER than the 1e-4 value
                # tolerance above, else near-ties could legitimately
                # swap ranks across the two implementations
                if (np.isclose(row, v, rtol=1e-3).sum() == 1):
                    assert got_idx[b, q, k] == ref_idx[b, q, k], (
                        b, q, k, v)

    # (4) the host formatter reproduces the reference mapping exactly
    # on the reference's own indices (bisect group lookup, rel divmod,
    # box_index translation, mask filtering)
    got_factor = model.apply(
        params, jnp.asarray(ref_idx), vis[2], inputs["seq_len"],
        box_index, txt[1], method=DependencyBoxRel.format_grounding,
    )
    want_factor = json.loads(str(ref["joint/out/decode_factor_json"]))
    assert json.loads(json.dumps(got_factor)) == want_factor

    txt_mask = np.asarray(txt[1])
    got_img = [
        [int(v) for v, m in zip(row, mrow) if m]
        for row, mrow in zip(np.asarray(dec["txt_to_img"]), txt_mask)
    ]
    assert got_img == json.loads(str(ref["joint/out/decode_img_json"]))

    # on_img mode: argmax over images of the reduced caption logits
    txt_w = _word_txt(ref, joint)
    logit = model_red.apply(params, vis, txt_w,
                            method=DependencyBoxRel.gather_logit)
    on_img = model_red.apply(
        params, {"match_logit": logit, "vis_packed": vis}, inputs,
        method=DependencyBoxRel.decode_grounding_device,
    )
    np.testing.assert_array_equal(
        np.asarray(on_img["txt_to_img"]), ref["joint/out/decode_on_img"]
    )


def test_prediction_writer_matches_reference(ref):
    """The CoNLL + ALIGN-column writer (ref: joint.py:718-743,640-654)
    reproduces the reference's full prediction text byte-for-byte on
    the reference's own decode output (pins the line assembly, the
    word/arc double ALIGN column, rel 'i-j' rendering, and '|' joins).
    The PRODUCTION Pipeline.write_predictions runs via a stub self."""
    import json
    import types

    from vlgae_tpu.training.pipeline import Pipeline

    want = str(ref["joint/out/predict_text"])
    factors = json.loads(str(ref["joint/out/decode_factor_json"]))

    def detuple(row):
        return [
            (t, tuple(x) if isinstance(x, list) else x) for t, x in row
        ]

    B, L = ref["in/tokens"].shape
    tag_words = [f"TAG{i}" for i in range(6)]
    insts = [
        {
            "id": b,
            "seq_len": int(ref["in/seq_len"][b]),
            "raw_word": [f"w{b}{i}" for i in range(L)],
            "tag": [tag_words[t] for t in ref["in/tags"][b]],
        }
        for b in range(B)
    ]
    outputs = {
        b: {
            "arc": [int(h) for h in ref["joint/in/pred_heads"][b]],
            "txt_to_factor": [detuple(row) for row in factors[b]],
        }
        for b in range(B)
    }
    fake = types.SimpleNamespace(
        dm=types.SimpleNamespace(datasets={"dev": insts},
                                 vocabs={"tag": None}),
        is_joint=True,
        model=types.SimpleNamespace(cfg=types.SimpleNamespace(
            decode_grounding_mode="on_factor",
            language_factor_mode="word+maxdep",
        )),
        _format_factor=Pipeline._format_factor,
    )
    import io
    import tempfile

    with tempfile.NamedTemporaryFile("r", suffix=".conll") as tf:
        Pipeline.write_predictions(fake, tf.name, "dev", outputs)
        got = open(tf.name).read()
    assert got == want


def test_generate_rule_1o_matches_reference(ref):
    """Per-sentence warmup rule-count targets (ref: good_init_nn.py:41-78)
    reproduce the reference counting routine bit-for-bit on a battery of
    trees, including the root-row quirk (a root-headed child still adds
    a GO decision on the root row of the dec table)."""
    from vlgae_tpu.models.dmv_init import generate_rule_1o

    ci = 0
    while f"rule1o_{ci}/in/heads" in ref.files:
        heads = [int(h) for h in ref[f"rule1o_{ci}/in/heads"]]
        got = generate_rule_1o(heads)
        for key in ("dec_rule", "attach_rule", "root_rule"):
            np.testing.assert_array_equal(
                np.asarray(got[key]), ref[f"rule1o_{ci}/out/{key}"],
                err_msg=f"case {ci} {key} heads={heads}",
            )
        ci += 1
    assert ci >= 5


def _rnn_params(ref, tag, mix=False):
    from test_nn_golden import _lstm_cell_params

    d = {k[len(f"{tag}/"):]: ref[k] for k in ref.files
         if k.startswith(f"{tag}/param")}
    p = {}
    for i in range(2):
        p[f"fwd_{i}"] = {"cell": _lstm_cell_params(d, f"lstm.f_cells.{i}")}
        p[f"bwd_{i}"] = {"cell": _lstm_cell_params(d, f"lstm.b_cells.{i}")}
    if mix:
        p["ScalarMix_0"] = {"weights": d["param/mix.weights"],
                            "gamma": d["param/mix.gamma"]}
    return p


@pytest.mark.parametrize("tag,kw", [
    ("rnn_last", dict(output_layers=-1)),
    ("rnn_concat", dict(output_layers=-2)),
    ("rnn_mix", dict(output_layers=-2, mix=True)),
])
def test_rnn_encoder_matches_reference(ref, tag, kw):
    """Encoder WIRING on top of the pinned VariationalLSTM block
    (ref: rnn_encoder.py:158-220): per-layer output selection,
    multi-layer concat, ScalarMix, and the final-state (hx) exposure
    — ours emits the LAST layer's (fwd, bwd) pair, which must equal
    the reference's hx[-2:] used by context_mode='hx'."""
    from vlgae_tpu.models.text_encoder import RNNEncoder

    x = jnp.asarray(ref["rnn/in/x"])
    lengths = ref["rnn/in/lengths"]
    B, L, _ = x.shape
    mask = jnp.asarray(np.arange(L)[None] < lengths[:, None])
    enc = RNNEncoder(hidden_size=4, num_layers=2, lstm_dropout=0.0,
                     init_version="biased", **kw)
    got = enc.apply(
        {"params": _rnn_params(ref, tag, mix=kw.get("mix", False))},
        x, mask,
    )
    np.testing.assert_allclose(
        np.asarray(got["x"]), ref[f"{tag}/out/x"],
        rtol=1e-4, atol=1e-5, err_msg="x",
    )
    np.testing.assert_allclose(
        np.asarray(got["hiddens"]), ref[f"{tag}/out/hiddens"][-2:],
        rtol=1e-4, atol=1e-5, err_msg="hiddens (vs reference hx[-2:])",
    )


def test_hx_context_matches_reference(ref):
    """context_mode='hx' (ref: ldndmv.py:223-224): the sentence context
    assembled from the encoder's final states."""
    enc_out = {
        "x": jnp.asarray(ref["rnn_last/out/x"]),
        "hiddens": jnp.asarray(ref["rnn_last/out/hiddens"][-2:]),
    }
    emb = CompositeEmbedding(items=(
        EmbeddingItemCfg("word_embedding", "word", "static",
                         n_vocab=9, embedding_dim=8),
    ))
    cfg = LDNDMVConfig(context_mode="hx", hidden_size=16, n_token=10,
                       n_tag=6, ff_dropout=0.0)
    model = DiscriminativeNDMV(cfg=cfg, embedding=emb, encoder=None)
    B, L, _ = enc_out["x"].shape
    mask = jnp.asarray(
        np.arange(L)[None] < ref["rnn/in/lengths"][:, None]
    )
    meth = lambda m, e, k: m.extract_sent_repr(e, k, deterministic=True)
    variables = model.init(jax.random.key(0), enc_out, mask, method=meth)
    context, kl = model.apply(variables, enc_out, mask, method=meth)
    assert kl is None
    np.testing.assert_allclose(
        np.asarray(context), ref["rnn_last/out/hx_context"],
        rtol=1e-5, atol=1e-6,
    )


def test_classic_dmv_em_matches_reference(ref):
    """Classic tabular DMV (ref: dmv.py:82-186): table gathers with the
    triu direction fold, the marginal NLL, and one full EM cycle —
    E-step counts (grad-of-logZ) -> M-step normalization (log-softmax
    of log(counts + smooth) over root axis 0 / dec decision axis /
    trans child axis)."""
    from vlgae_tpu.models import dmv_model

    params = {
        "root_param": jnp.asarray(ref["dmv/param/root"]),
        "trans_param": jnp.asarray(ref["dmv/param/trans"]),
        "dec_param": jnp.asarray(ref["dmv/param/dec"]),
    }
    token = jnp.asarray(ref["dmv/in/tokens"])
    lengths = jnp.asarray(ref["dmv/in/lengths"].astype(np.int32))

    mdec, mattach = dmv_model.forward(params, token)
    masked_close(mdec, ref["dmv/out/merged_dec"], rtol=1e-5,
                 msg="merged_dec")
    masked_close(mattach, ref["dmv/out/merged_attach"], rtol=1e-5,
                 msg="merged_attach")

    nll, aux = dmv_model.loss(params, token, lengths, viterbi=False)
    np.testing.assert_allclose(np.asarray(nll), ref["dmv/out/nll"],
                               rtol=1e-5)

    em = dmv_model.EMAccumulator(smooth=0.1)
    em.accumulate(dmv_model.expected_counts(params, token, lengths))
    new = em.apply(params)
    np.testing.assert_allclose(
        np.asarray(new["root_param"]), ref["dmv/out/em_root"],
        rtol=1e-4, atol=1e-5, err_msg="em root",
    )
    np.testing.assert_allclose(
        np.asarray(new["dec_param"]), ref["dmv/out/em_dec"],
        rtol=1e-4, atol=1e-5, err_msg="em dec",
    )
    np.testing.assert_allclose(
        np.asarray(new["trans_param"]), ref["dmv/out/em_trans"],
        rtol=1e-4, atol=1e-5, err_msg="em trans",
    )


# ---------------------------------------------------------------------------
# decode-edit property sweep: the golden pins ONE configuration; this
# sweeps random shapes/masks against a NumPy oracle transcribing the
# reference's decode semantics (ref: joint.py:521-592) — deep -1e20
# masking, 1e10 POS priors on word rows, best-box heuristics with the
# rel arc-row exclusion, rel -100 softening + diagonal -1e10 fill, and
# the attr hard fill. All f32 so the -1e10 rounding collapse is shared.
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

_POS_GROUPS = {"obj": (0, 1), "rel": (2,), "attr": (4,)}


def _oracle_decode(att, vis_mask, txt_mask, tag, P, L):
    f = np.float32
    B, Q, V = att.shape
    logit = np.where(
        vis_mask[:, None, :] & txt_mask[:, :, None], att, f(-1e20)
    ).astype(f)
    vis_split = [P, P * P, P]
    offset = 0
    for name, width in zip(("obj", "rel", "attr"), vis_split):
        ids = np.asarray(_POS_GROUPS[name])
        in_prior = np.isin(tag, ids)  # [B, L]
        for b in range(B):
            for i in range(L):
                if in_prior[b, i]:
                    logit[b, 1 + i, :offset] -= f(1e10)
                    logit[b, 1 + i, offset + width:] -= f(1e10)
        offset += width
    box = logit[..., :P]
    aligned = logit.max(-1)
    bmax, bidx = box.max(-1), box.argmax(-1)
    allowed = (bmax == aligned) & (bmax > -1e5)
    allowed_rel = allowed.copy()
    allowed_rel[:, L + 1:] = False  # arcs don't contribute (ref:566)
    am_r = np.zeros((B, P), bool)
    am_a = np.zeros((B, P), bool)
    for b in range(B):
        am_r[b, bidx[b][allowed_rel[b]]] = True
        am_a[b, bidx[b][allowed[b]]] = True
    rel = logit[..., P:P + P * P]
    pair = (am_r[:, :, None] & am_r[:, None, :]).reshape(B, 1, P * P)
    rel = np.where(pair, rel, rel - f(100.0)).reshape(B, Q, P, P)
    rel[:, :, np.arange(P), np.arange(P)] = f(-1e10)
    attr = np.where(am_a[:, None, :], logit[..., P + P * P:], f(-1e10))
    return np.concatenate([box, rel.reshape(B, Q, P * P), attr], -1)


@settings(max_examples=20, deadline=None, derandomize=True)
@given(
    st.data(),
    st.integers(min_value=2, max_value=4),   # B
    st.integers(min_value=1, max_value=4),   # L
    st.integers(min_value=2, max_value=4),   # P
    st.booleans(),                           # maxdep arc rows present
)
def test_decode_logits_match_reference_oracle(ref, joint, data, B, L, P,
                                              with_arcs):
    model = joint[0]
    params = joint[2]
    V = P + P * P + P
    Q = (2 if with_arcs else 1) * (L + 1)
    att = np.asarray(
        data.draw(st.lists(
            st.floats(min_value=-5.0, max_value=5.0),
            min_size=B * B * Q * V, max_size=B * B * Q * V,
        )), np.float32,
    ).reshape(B, B, Q, V)
    seq_len = np.asarray(
        [data.draw(st.integers(min_value=1, max_value=L))
         for _ in range(B)], np.int32,
    )
    word_mask = np.arange(L)[None] < seq_len[:, None]
    q_mask = np.concatenate([np.zeros((B, 1), bool), word_mask], 1)
    txt_mask = np.concatenate([q_mask, q_mask], 1) if with_arcs else q_mask
    vis_mask = np.asarray(
        [[data.draw(st.booleans()) for _ in range(P)] for _ in range(B)]
    )
    vis_mask[:, 0] = True  # >=1 valid box per image
    rel_mask = np.triu(
        vis_mask[:, None, :] & vis_mask[:, :, None], 1
    ).reshape(B, -1)
    full_vis_mask = np.concatenate([vis_mask, rel_mask, vis_mask], 1)
    tag = np.asarray(
        [[data.draw(st.integers(min_value=0, max_value=5))
          for _ in range(L)] for _ in range(B)]
    )

    diag = att[np.arange(B), np.arange(B)]
    want = _oracle_decode(diag, full_vis_mask, txt_mask, tag, P, L)

    out = {
        "match_logit": jnp.asarray(att),
        "vis_packed": (None, jnp.asarray(full_vis_mask),
                       (P, P * P, P)),
        "txt_packed": (None, jnp.asarray(txt_mask), None),
    }
    inputs = {"tag": jnp.asarray(tag), "token": jnp.asarray(tag)}
    got = model.apply(params, out, inputs,
                      method=DependencyBoxRel.decode_grounding_logits)
    masked_close(got, want, rtol=1e-5, atol=1e-4, thresh=-1e19,
                 msg=f"B={B} L={L} P={P} arcs={with_arcs}")


def test_embedding_normalize_matches_reference(ref):
    """Embedding whitening (ref: fastnlp_embedding.py:30-47 +
    embedding.py:155-166): the count-weighted scalar branch and the
    per-dimension branch (torch.std = ddof 1, no epsilon, padding row
    0 excluded), all three methods."""
    from vlgae_tpu.models.embedding import normalize_embedding_params

    table = ref["embnorm/in/table"]
    counts = ref["embnorm/in/counts"]
    for method in ("mean", "std", "mean+std"):
        key = method.replace("+", "_")
        got = normalize_embedding_params(
            {"t": jnp.asarray(table)}, ("t",), method, counts=counts
        )["t"]
        np.testing.assert_allclose(
            np.asarray(got), ref[f"embnorm/out/counted_{key}"],
            rtol=1e-5, atol=1e-6, err_msg=f"counted {method}",
        )
        got = normalize_embedding_params(
            {"t": jnp.asarray(table)}, ("t",), method
        )["t"]
        np.testing.assert_allclose(
            np.asarray(got), ref[f"embnorm/out/perdim_{key}"],
            rtol=1e-4, atol=1e-6, err_msg=f"perdim {method}",
        )


@pytest.mark.parametrize("vmode", ["vae", "ib"])
def test_variational_embedding_adaptor_matches_reference(ref, vmode):
    """The variational embedding item's eval forward (z = posterior
    mean) and its VAE/IB KL (ref: fastnlp_embedding.py:49-81)."""
    from vlgae_tpu.models.embedding import StaticItem

    tag = f"embvar_{vmode}"
    item = StaticItem(
        cfg=EmbeddingItemCfg(
            "w", "word", "static", n_vocab=9, embedding_dim=8,
            mode=vmode, out_dim=3,
        ),
    )
    p = {
        "embedding": ref["embnorm/in/table"] * 0  # replaced below
    }
    params = {
        "embedding": ref[f"{tag}/param/emb.weight"],
        "enc": dense(ref, f"{tag}/param/enc"),
    }
    if vmode == "ib":
        params["target_mean"] = ref[f"{tag}/param/target_mean"]
        params["target_lvar"] = ref[f"{tag}/param/target_lvar"]
    words = jnp.asarray(ref["in/token2word"][ref["in/tokens"]])
    z, kl = item.apply({"params": params}, words, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(z), ref[f"{tag}/out/z"], rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(kl), ref[f"{tag}/out/kl"], rtol=1e-4, atol=1e-5
    )
