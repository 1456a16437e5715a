"""Model factory: build flax model trees from composed configs.

The JAX counterpart of the reference's hydra ``_target_`` instantiation
plus ``ModelBase.setup`` (ref: src/model/base.py:49-54,201-209): vocab
counts are merged into the model config (ref: src/pipeline.py:57-58) and
the embedding/encoder/vis_encoder sub-configs at the top level of the
composed config are assembled into the model's submodules.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..models import (
    CompositeEmbedding,
    DependencyBoxRel,
    DependencyBoxRelConfig,
    DiscriminativeNDMV,
    LDNDMVConfig,
    MLPEncoder,
    RNNEncoder,
    VisBoxRelSimpleEncoder,
)
from ..models.embedding import EmbeddingItemCfg, glove_row_map, load_glove
from ..models.joint import ATTR_POS, OBJ_POS, REL_POS
from ..models.ldndmv import FUNCTION_POS


def build_embedding(emb_cfg: Dict[str, Any], dm) -> CompositeEmbedding:
    """(ref: src/model/embedding/embedding.py:53-101)"""
    items = []
    pretrained = {}
    row_maps = {}
    use_word = emb_cfg.get("use_word", True)
    use_tag = emb_cfg.get("use_tag", True)
    use_subword = emb_cfg.get("use_subword", False)
    if use_word:
        wcfg = emb_cfg.get("word_embedding", {}) or {}
        args = wcfg.get("args", {}) or {}
        dim = int(args.get("embedding_dim", 100))
        adaptor = wcfg.get("adaptor_args", {}) or {}
        mode = adaptor.get("mode", "basic")
        items.append(EmbeddingItemCfg(
            "word_embedding", "word", "static",
            n_vocab=len(dm.vocabs["word"]), embedding_dim=dim,
            mode=mode if mode != "basic" else "basic",
            out_dim=int(adaptor.get("out_dim", 0) or 0),
            normalize_method=wcfg.get("normalize_method", "mean+std"),
            normalize_time=wcfg.get("normalize_time", "nowhere"),
        ))
        glove_path = args.get("model_dir_or_name")
        if glove_path and isinstance(glove_path, str) and \
                glove_path.endswith(".txt"):
            import os

            if os.path.exists(glove_path):
                table, found = load_glove(glove_path, dm.vocabs["word"], dim)
                pretrained["word_embedding"] = table
                # dev/test-only words without pretrained vectors share
                # the unk row (fastNLP StaticEmbedding semantics)
                row_maps["word_embedding"] = glove_row_map(
                    dm.vocabs["word"], found
                )
    if use_tag and "tag" in dm.vocabs:
        tcfg = emb_cfg.get("tag_embedding", {}) or {}
        args = tcfg.get("args", {}) or {}
        items.append(EmbeddingItemCfg(
            "tag_embedding", "tag", "static",
            n_vocab=len(dm.vocabs["tag"]),
            embedding_dim=int(args.get("embedding_dim", 100)),
            normalize_method=tcfg.get("normalize_method", "mean+std"),
            normalize_time=tcfg.get("normalize_time", "nowhere"),
        ))
    bert_config = None
    if use_subword:
        scfg = emb_cfg.get("transformer", {}) or {}
        args = scfg.get("args", {}) or {}
        model_name = args.get("model", "bert-base-cased")
        bert_config, hidden = _bert_config(model_name)
        items.append(EmbeddingItemCfg(
            "transformer", "subword", "transformer",
            embedding_dim=hidden,
            n_layers=int(args.get("n_layers", 1)),
            n_out=int(args.get("n_out", 0) or 0),
            requires_grad=bool(args.get("requires_grad", False)),
            model=model_name,
            pooling=str(args.get("pooling", "mean")),
            stride=int(args.get("stride", 256)),
            layer_dropout=float(args.get("dropout", 0.0) or 0.0),
        ))
    return CompositeEmbedding(
        items=tuple(items),
        dropout=float(emb_cfg.get("dropout", 0.0) or 0.0),
        pretrained=pretrained,
        row_maps=row_maps,
        bert_config=bert_config,
    )


def _bert_config(model_name: str):
    """Local-path BERT config, or a small random-init config (zero-egress
    environments have no hub cache)."""
    import os

    from transformers import AutoConfig, BertConfig

    if os.path.isdir(str(model_name)):
        config = AutoConfig.from_pretrained(model_name)
        return config, config.hidden_size
    config = BertConfig(
        vocab_size=8192, hidden_size=128, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=256,
        max_position_embeddings=512,
    )
    return config, config.hidden_size


def build_encoder(enc_cfg: Dict[str, Any], emb_size: int = 0):
    target = enc_cfg.get("_target_", "")
    kw = {k: v for k, v in enc_cfg.items() if not k.startswith("_")}
    if "MLPEncoder" in target:
        return MLPEncoder(
            n_hidden=int(kw.get("n_hidden", 256)),
            dropout=float(kw.get("dropout", 0.0)),
            shared_dropout=float(kw.get("shared_dropout", 0.0) or 0.0),
        )
    if "RNNEncoder" in target:
        return RNNEncoder(
            hidden_size=int(kw.get("hidden_size", 200)),
            num_layers=int(kw.get("num_layers", 2)),
            reproject_emb=int(kw.get("reproject_emb", 0) or 0),
            reproject_out=int(kw.get("reproject_out", 0) or 0),
            mix=bool(kw.get("mix", False)),
            pre_shared_dropout=float(kw.get("pre_shared_dropout", 0.0)),
            pre_dropout=float(kw.get("pre_dropout", 0.0)),
            post_shared_dropout=float(kw.get("post_shared_dropout", 0.0)),
            post_dropout=float(kw.get("post_dropout", 0.0)),
            lstm_dropout=float(kw.get("lstm_dropout", 0.33)),
            output_layers=int(kw.get("output_layers", -1)),
            proj_size=int(kw.get("proj_size", 0) or 0),
            init_version=str(kw.get("init_version", "zy")),
            cat_emb=bool(kw.get("cat_emb", False)),
            cat_emb_size=emb_size if kw.get("cat_emb") else 0,
        )
    from ..models import BlankEncoder

    return BlankEncoder(dropout=float(kw.get("dropout", 0.0)))


def _bf16(cfg: Dict[str, Any]) -> bool:
    prec = str(cfg.get("trainer", {}).get("precision", 32))
    return prec in ("16", "bf16", "bfloat16")


def build_vis_encoder(cfg: Optional[Dict[str, Any]], dtype=None):
    if not cfg:
        return None
    kw = {k: v for k, v in cfg.items() if not k.startswith("_")}
    target = str(cfg.get("_target_", ""))
    if target.endswith("VisViTPatchEncoder"):
        # CLIP/ViT-swap stretch configuration (BASELINE config #5):
        # patch-grid factors from a (frozen by default) ViT backbone
        from transformers import ViTConfig

        from ..models import VisViTPatchEncoder

        vit_cfg = ViTConfig(
            hidden_size=int(kw.get("vit_hidden_size", 192)),
            num_hidden_layers=int(kw.get("vit_num_layers", 4)),
            num_attention_heads=int(kw.get("vit_num_heads", 4)),
            intermediate_size=int(kw.get("vit_intermediate_size", 384)),
            image_size=int(kw.get("vit_image_size", 224)),
            patch_size=int(kw.get("vit_patch_size", 32)),
            num_channels=3,
        )
        return VisViTPatchEncoder(
            n_hidden=int(kw.get("n_hidden", 256)),
            vit_config=vit_cfg,
            requires_grad=bool(kw.get("requires_grad", False)),
            dropout=float(kw.get("dropout", 0.0)),
            activate=bool(kw.get("activate", True)),
            use_attr=bool(kw.get("use_attr", True)),
            use_img=bool(kw.get("use_img", False)),
            img_feat=bool(kw.get("img_feat", True)),
            dtype=dtype,
        )
    return VisBoxRelSimpleEncoder(
        n_hidden=int(kw.get("n_hidden", 256)),
        dropout=float(kw.get("dropout", 0.0)),
        activate=bool(kw.get("activate", True)),
        use_attr=bool(kw.get("use_attr", True)),
        use_img=bool(kw.get("use_img", False)),
        img_feat=bool(kw.get("img_feat", True)),
        dtype=dtype,
    )


def _ldndmv_cfg(mcfg: Dict[str, Any], dm) -> LDNDMVConfig:
    counts = dm.get_vocab_count()
    return LDNDMVConfig(
        context_mode=mcfg.get("context_mode", "mean"),
        strict_pad_context=bool(mcfg.get("strict_pad_context", False)),
        init_method=str(mcfg.get("init_method", "y")),
        init_epoch=int(mcfg.get("init_epoch", 0)),
        viterbi_training=bool(mcfg.get("viterbi_training", True)),
        mbr_decoding=bool(mcfg.get("mbr_decoding", False)),
        extended_valence=bool(mcfg.get("extended_valence", True)),
        function_mask=bool(mcfg.get("function_mask", False)),
        variational_mode=mcfg.get("variational_mode", "none"),
        z_dim=int(mcfg.get("z_dim", 0) or 0),
        hidden_size=int((mcfg.get("head_ff", {}) or {}).get("n_hidden", 256)),
        mid_bottleneck=int((mcfg.get("mid_ff", {}) or {})
                           .get("n_bottleneck", 0) or 0),
        mid_n_mid=int((mcfg.get("mid_ff", {}) or {}).get("n_mid", 0) or 0),
        mid_dropout=float((mcfg.get("mid_ff", {}) or {})
                          .get("dropout", 0.0) or 0.0),
        ff_dropout=float((mcfg.get("head_ff", {}) or {})
                         .get("dropout", 0.33) or 0.0),
        attach_rank=int(mcfg.get("attach_rank", 16)),
        dec_rank=int(mcfg.get("dec_rank", 16)),
        root_rank=int(mcfg.get("root_rank", 16)),
        root_emb_dim=int(mcfg.get("root_emb_dim", 10)),
        dec_emb_dim=int(mcfg.get("dec_emb_dim", 10)),
        n_token=counts.get("n_token", 0),
        n_tag=counts.get("n_tag", 0),
    )


def build_ldndmv(cfg: Dict[str, Any], dm,
                 mcfg: Optional[Dict[str, Any]] = None) -> DiscriminativeNDMV:
    mcfg = mcfg if mcfg is not None else cfg.get("model", {})
    embedding = build_embedding(cfg.get("embedding", {}), dm)
    encoder = build_encoder(cfg.get("encoder", {}),
                            emb_size=embedding.embed_size)
    dep_cfg = _ldndmv_cfg(mcfg, dm)
    fmask = ()
    if dep_cfg.function_mask and "tag" in dm.vocabs:
        fmask = tuple(
            dm.vocabs["tag"][t] for t in FUNCTION_POS
            if t in dm.vocabs["tag"]
        )
    return DiscriminativeNDMV(
        cfg=dep_cfg,
        embedding=embedding,
        encoder=encoder,
        token2word=tuple(dm.token2word) if dm.token2word else None,
        token2tag=tuple(dm.token2tag) if dm.token2tag else None,
        function_mask_ids=fmask,
    )


def build_joint(cfg: Dict[str, Any], dm) -> DependencyBoxRel:
    mcfg = cfg.get("model", {})
    dep = build_ldndmv(cfg, dm, mcfg=mcfg.get("dep_model_cfg", {}))
    import jax.numpy as jnp

    bf16 = _bf16(cfg)
    vis_encoder = build_vis_encoder(
        cfg.get("vis_encoder"), dtype=jnp.bfloat16 if bf16 else None
    )
    jcfg = DependencyBoxRelConfig(
        add_rel=bool(mcfg.get("add_rel", True)),
        add_attr=bool(mcfg.get("add_attr", True)),
        add_image=bool(mcfg.get("add_image", True)),
        add_marginal=bool(mcfg.get("add_marginal", True)),
        margin=float(mcfg.get("margin", 1.0)),
        language_factor_mode=mcfg.get("language_factor_mode", "word+maxdep"),
        visual_factor_mode=mcfg.get("visual_factor_mode", "unprune"),
        match_hidden=int((mcfg.get("visual_factor_cfg", {}) or {})
                         .get("n_hidden", 128)),
        feat_fuse_mode=mcfg.get("feat_fuse_mode", "attention"),
        fuse_num_heads=int((mcfg.get("feat_fuse_args", {}) or {})
                           .get("num_heads", 4)),
        fuse_dropout=float((mcfg.get("feat_fuse_args", {}) or {})
                           .get("dropout", 0.33)),
        fuse_replace=bool((mcfg.get("feat_fuse_args", {}) or {})
                          .get("replace", False)),
        fuse_aug_with_matching=bool((mcfg.get("feat_fuse_args", {}) or {})
                                    .get("aug_with_matching", True)),
        gather_logit_mode=mcfg.get("gather_logit_mode", "simple"),
        loss_grounding_mode=mcfg.get("loss_grounding_mode", "factor|ce"),
        loss_use_pos_prior=bool((mcfg.get("loss_grounding_args", {}) or {})
                                .get("use_pos_prior", True)),
        loss_vis2txt=float((mcfg.get("loss_grounding_args", {}) or {})
                           .get("vis2txt", 1.0)),
        decode_grounding_mode=mcfg.get("decode_grounding_mode", "on_factor"),
        decode_use_pos_prior=bool((mcfg.get("decode_grounding_args", {})
                                   or {}).get("use_pos_prior", True)),
        decode_use_heuristic=bool((mcfg.get("decode_grounding_args", {})
                                   or {}).get("use_heuristic", True)),
        grounding_interpolation=float(
            mcfg.get("grounding_interpolation", 0.5)
            if not isinstance(mcfg.get("grounding_interpolation"), str)
            else 0.5
        ),
        word_encoder_dropout=float((mcfg.get("word_encoder", {}) or {})
                                   .get("dropout", 0.33)),
        bf16_matmul=bf16,
    )
    tag_vocab = dm.vocabs["tag"]
    to_ids = lambda tags: tuple(
        tag_vocab[t] for t in tags if t in tag_vocab
    )
    return DependencyBoxRel(
        cfg=jcfg,
        dep_cfg=dep.cfg,
        dependency=dep,
        vis_encoder=vis_encoder,
        pos_for_obj=to_ids(OBJ_POS),
        pos_for_rel=to_ids(REL_POS),
        pos_for_attr=to_ids(ATTR_POS),
    )


def build_model(cfg: Dict[str, Any], dm):
    target = cfg.get("model", {}).get("_target_", "")
    if "DependencyBoxRel" in target:
        return build_joint(cfg, dm)
    if "DiscriminativeNDMV" in target or target == "":
        return build_ldndmv(cfg, dm)
    raise ValueError(f"unknown model target: {target}")
