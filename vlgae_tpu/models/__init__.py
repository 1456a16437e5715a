"""Models: embeddings, encoders, DMV family, joint VLGAE model."""

from .dmv_init import generate_rule_1o, good_init, km_init
from .embedding import (
    CompositeEmbedding,
    EmbeddingItemCfg,
    load_glove,
    normalize_embedding_params,
)
from .joint import (
    ATTR_POS,
    OBJ_POS,
    REL_POS,
    DependencyBoxRel,
    DependencyBoxRelConfig,
)
from .ldndmv import (
    FUNCTION_POS,
    DiscriminativeNDMV,
    LDNDMVConfig,
    decode as ldndmv_decode,
    loss_init_rules,
    loss_nll,
)
from .text_encoder import BlankEncoder, MLPEncoder, MultiEncoder, RNNEncoder
from .vis_encoder import (VisBoxRelSimpleEncoder, VisViTPatchEncoder,
                          graft_vit_params, load_vit_params, patch_boxes)
from . import dmv_model

__all__ = [
    "CompositeEmbedding",
    "EmbeddingItemCfg",
    "load_glove",
    "normalize_embedding_params",
    "DiscriminativeNDMV",
    "LDNDMVConfig",
    "ldndmv_decode",
    "loss_nll",
    "loss_init_rules",
    "FUNCTION_POS",
    "DependencyBoxRel",
    "DependencyBoxRelConfig",
    "OBJ_POS",
    "REL_POS",
    "ATTR_POS",
    "MLPEncoder",
    "BlankEncoder",
    "RNNEncoder",
    "MultiEncoder",
    "VisBoxRelSimpleEncoder",
    "VisViTPatchEncoder",
    "graft_vit_params",
    "load_vit_params",
    "patch_boxes",
    "dmv_model",
    "km_init",
    "good_init",
    "generate_rule_1o",
]
