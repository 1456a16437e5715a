"""Generate FULL-MODEL golden fixtures FROM THE REFERENCE implementation.

Extends the layer goldens (make_golden_fixtures / make_nn_golden /
make_host_golden) to the two composed seams those don't pin:

1. ``ldndmv/*`` — the reference ``DiscriminativeNDMV._forward``
   (ref: src/model/ldndmv.py:171-216): the full potential construction
   (scorer stack -> attach/dec/root rule tables -> token gathers ->
   left/right triangular direction resolution -> function-word mask ->
   ``DMV1o.merge``), plus the variational ``extract_sent_repr`` branches
   (ref: ldndmv.py:218-250) in eval mode.

2. ``joint/*`` — the reference ``DependencyBoxRel`` matching stack
   (ref: src/model/joint.py): ``vis_feat_unprune`` factor packing,
   ``lang_feat_word_only`` / ``lang_feat_max_tree`` language factors,
   ``gather_logit_simple``/``_reduced`` attention maps, the
   ``factor|ce`` grounding loss with POS priors + vis2txt and the
   ``cap_img|ce`` loss, and the ``aug_with_matching`` attention-fusion
   block inside ``_forward`` (ref: joint.py:658-675).

The heavy reference deps (fastNLP / hydra / omegaconf / lightning) are
absent here, so the modules are imported through synthetic package
shells + tiny import stubs; model objects are assembled attribute-by-
attribute (``__new__`` + ``nn.Module.__init__``) so NO reference
``setup()`` plumbing is needed — but every line of the FORWARD/LOSS
code that runs is reference code. Only OUTPUT artifacts (weights +
inputs + outputs) are committed; no reference code is copied.

All runs are eval-mode (dropout off) on fixed seeds, with EQUAL-LENGTH
sentences where the reference's context mean is computed (the reference
mean is unmasked over padding — see the divergence note in
vlgae_tpu/models/ldndmv.py::extract_sent_repr).

Usage: python scripts/make_model_golden.py [reference_path]
"""

from __future__ import annotations

import functools
import importlib
import os
import sys
import types

import numpy as np
import torch
import torch.nn as nn

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")
os.makedirs(OUT, exist_ok=True)


# ---------------------------------------------------------------------------
# import stubs (only names touched at import time; none are load-bearing
# in the forward/loss paths pinned below)
# ---------------------------------------------------------------------------

def _stub(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def _shell(name: str, path: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


def _seq_len_to_mask(seq_len, max_len=None):
    ml = int(max_len if max_len is not None else seq_len.max())
    return torch.arange(ml)[None, :] < seq_len[:, None]


def _no_instantiate(*a, **k):  # pragma: no cover - setup-only
    raise RuntimeError("instantiate() must not run in the golden harness")


_stub("fastNLP", DataSet=object, Vocabulary=object, AutoPadder=object,
      DataSetIter=object, Padder=object)
_stub("fastNLP.core")
_stub("fastNLP.core.utils", seq_len_to_mask=_seq_len_to_mask)
_stub("fastNLP.core.field", Padder=object)
_stub("hydra")
_stub("hydra.conf", MISSING="???")
_stub("hydra.utils", instantiate=_no_instantiate)
_stub("omegaconf", MISSING="???", DictConfig=dict, ListConfig=list,
      OmegaConf=types.SimpleNamespace, open_dict=lambda *a, **k: None)
_stub("pytorch_lightning", Trainer=object)

src = _shell("src", os.path.join(REF, "src"))
src.INF = 1e20  # ref: src/__init__.py:110-121 (setup_inf(1e20))
src.trainer = types.SimpleNamespace(current_epoch=1)  # past init_epoch=0
_shell("src.model", os.path.join(REF, "src", "model"))
_shell("src.model.nn", os.path.join(REF, "src", "model", "nn"))
_shell("src.utility", os.path.join(REF, "src", "utility"))
_stub("src.datamodule", DataModule=object)
_stub("src.datamodule.task", DepDataModule=object)
_stub("src.datamodule.sampler", ConstantTokenNumSampler=object)
_stub("src.model.embedding", Embedding=object, EmbeddingAdaptor=object)
_stub("src.model.text_encoder", EncoderBase=object)
_stub("src.utility.logger",
      get_logger_func=lambda *_: ((lambda *a, **k: None),) * 3)

importlib.import_module("src.utility.config")
importlib.import_module("src.utility.fn")
importlib.import_module("src.utility.var_pool")
nn_common = importlib.import_module("src.model.nn.common")
dmv_spec = importlib.import_module("src.model.nn.dmv_spec")
mkl_mod = importlib.import_module("src.model.nn.multivariate_kl")
affine_scorer = importlib.import_module("src.model.nn.affine_scorer")
_stub(
    "src.model.nn",
    MLP=nn_common.MLP,
    BiaffineScorer=affine_scorer.BiaffineScorer,
    DMVFactorizedBilinear=dmv_spec.DMVFactorizedBilinear,
    multivariate_kl=mkl_mod,
)
sys.modules["src.model.nn"].__path__ = [
    os.path.join(REF, "src", "model", "nn")
]
sys.modules["src.model.nn.multivariate_kl"] = mkl_mod
ts = importlib.import_module("src.model.torch_struct")
base_mod = importlib.import_module("src.model.base")
sys.modules["src.model"].ModelBase = base_mod.ModelBase
_stub("src.model.dmv", DMV=object)  # only touched by setup()/init-phase
_stub("src.model.dmv_helper", generate_rule_1o=None, LinearPadder=object,
      SquarePadder=object)
# keep the stub attrs (ldndmv's import) but allow real submodule loads
sys.modules["src.model.dmv_helper"].__path__ = [
    os.path.join(REF, "src", "model", "dmv_helper")
]
ldndmv_mod = importlib.import_module("src.model.ldndmv")
sys.modules["src.model.ldndmv"] = ldndmv_mod
joint_mod = importlib.import_module("src.model.joint")
VarPool = sys.modules["src.utility.var_pool"].VarPool

torch.manual_seed(0)
rng = np.random.default_rng(0)
data: dict = {}


def _randn(*shape, scale=1.0):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def _save_params(prefix: str, module: nn.Module):
    for name, p in module.named_parameters():
        data[f"{prefix}/param/{name}"] = p.detach().numpy()


def _t(x, dtype=None):
    t = torch.tensor(x)
    return t.to(dtype) if dtype is not None else t


class _StubEmb:
    """fastNLP-embedding-shaped table lookup for ``token_emb``
    (ref: ldndmv.py:317-333 calls ``emb(indexer, None)``)."""

    def __init__(self, table: np.ndarray):
        self.table = torch.tensor(table)
        self.embed_size = table.shape[1]

    def __call__(self, idx, _unused):
        return self.table[idx]


# ---------------------------------------------------------------------------
# shared shapes
# ---------------------------------------------------------------------------
B, L = 4, 5
N_WORD, N_TAG, N_TOKEN = 9, 6, 10
D_WORD, D_TAG = 8, 4
D_X = 12          # encoder output dim == embed size here
HID = 16          # scorer hidden
R = 3             # factorized ranks
D_ROOT, D_DEC = 6, 5

word_table = _randn(N_WORD, D_WORD)
tag_table = _randn(N_TAG, D_TAG)
token2word = (np.arange(N_TOKEN) % N_WORD).astype(np.int64)
token2tag = (np.arange(N_TOKEN) % N_TAG).astype(np.int64)

tokens = rng.integers(0, N_TOKEN, (B, L)).astype(np.int64)
tags = token2tag[tokens]
words = token2word[tokens]
seq_len = np.full(B, L, np.int64)
emb_in = np.concatenate([word_table[words], tag_table[tags]], -1)
x_enc = _randn(B, L, D_X)

data["meta/B"] = np.array(B)
data["meta/L"] = np.array(L)
data["meta/tables"] = np.array(0)  # marker
data["in/word_table"] = word_table
data["in/tag_table"] = tag_table
data["in/token2word"] = token2word
data["in/token2tag"] = token2tag
data["in/tokens"] = tokens
data["in/tags"] = tags
data["in/seq_len"] = seq_len
data["in/emb"] = emb_in
data["in/x_enc"] = x_enc


# ---------------------------------------------------------------------------
# 1. DiscriminativeNDMV._forward (ref: ldndmv.py:171-216)
# ---------------------------------------------------------------------------

def build_ldndmv(extended_valence: bool):
    m = object.__new__(ldndmv_mod.DiscriminativeNDMV)
    nn.Module.__init__(m)
    m.cfg = types.SimpleNamespace(
        context_mode="mean", variational_mode="none",
        extended_valence=extended_valence, function_mask=True,
        init_epoch=0,
    )
    m.variational_enc = None
    m.head_ff = nn_common.MLP(D_X + D_WORD + D_TAG, HID, dropout=0)
    m.child_ff = nn_common.MLP(D_WORD + D_TAG, HID, dropout=0)
    m.root_ff = nn_common.MLP(D_ROOT, HID, dropout=0)
    m.dec_ff = nn_common.MLP(D_DEC, HID, dropout=0)
    m.mid_ff = dmv_spec.DMVSkipConnectEncoder(HID)
    m.attach_scorer = dmv_spec.DMVFactorizedBilinear(HID, r=R)
    m.dec_scorer = dmv_spec.DMVFactorizedBilinear(HID, r=R)
    m.root_scorer = dmv_spec.DMVFactorizedBilinear(HID, r=R)
    m.root_emb = nn.Parameter(_t(_randn(1, D_ROOT)))
    m.dec_emb = nn.Parameter(_t(_randn(2, D_DEC)))
    m.word_embedding = _StubEmb(word_table)
    m.tag_embedding = _StubEmb(tag_table)
    m.word_indexer = _t(token2word)
    m.tag_indexer = _t(token2tag)
    m.function_mask = _t(np.array([1, 3], np.int64))
    m.dmv = None
    m.eval()
    return m


def run_ldndmv(tag: str, m):
    inputs = {"token": _t(tokens), "tag": _t(tags)}
    encoded = {"x": _t(x_enc), "emb": _t(emb_in)}
    vp = VarPool(seq_len=_t(seq_len))
    vp._pool["batch_size"] = B
    vp._pool["max_len"] = L
    with torch.no_grad():
        out = m._forward(inputs, encoded, vp)
    for key in ("attach", "attach_rule", "dec", "root", "root_rule",
                "merged_dec", "merged_attach"):
        data[f"{tag}/out/{key}"] = out[key].detach().numpy()
    data[f"{tag}/in/function_mask"] = m.function_mask.numpy()
    return out


torch.manual_seed(1)
m_ext = build_ldndmv(extended_valence=True)
_save_params("ldndmv", m_ext)  # shared by both legs
ld_out = run_ldndmv("ldndmv", m_ext)

# same weights, collapsed-valence attach branch (ref: ldndmv.py:187-189)
m_nev = build_ldndmv(extended_valence=False)
m_nev.load_state_dict(m_ext.state_dict())
m_nev.eval()
run_ldndmv("ldndmv_nev", m_nev)


# ragged lengths, strict padded-context parity: the reference context
# mean is UNMASKED over padding (ref: ldndmv.py:224), so on a ragged
# batch its potentials depend on the pad rows of x_enc — only the
# strict_pad_context=True flax build reproduces these tables
ragged_lengths = np.array([L, L - 1, 3, 2], np.int64)
data["ldndmv_ragged/in/lengths"] = ragged_lengths
m_rag = build_ldndmv(extended_valence=True)
m_rag.load_state_dict(m_ext.state_dict())
m_rag.eval()
vp_rag = VarPool(seq_len=_t(ragged_lengths))
vp_rag._pool["batch_size"] = B
vp_rag._pool["max_len"] = L
with torch.no_grad():
    out_rag = m_rag._forward(
        {"token": _t(tokens), "tag": _t(tags)},
        {"x": _t(x_enc), "emb": _t(emb_in)},
        vp_rag,
    )
for key in ("attach", "dec", "root", "merged_dec", "merged_attach"):
    data[f"ldndmv_ragged/out/{key}"] = out_rag[key].detach().numpy()


# variational extract_sent_repr, eval mode (ref: ldndmv.py:218-250)
def run_variational(tag: str, mode: str, z_dim: int = 3):
    m = object.__new__(ldndmv_mod.DiscriminativeNDMV)
    nn.Module.__init__(m)
    m.cfg = types.SimpleNamespace(
        context_mode="mean", variational_mode=mode, z_dim=z_dim
    )
    m.variational_enc = nn.Linear(D_X, 2 * z_dim)
    if mode.endswith("ib"):
        m.target_mean = nn.Parameter(_t(_randn(1, z_dim)))
        m.target_lvar = nn.Parameter(_t(_randn(1, z_dim, scale=0.3)))
        m.gaussian_kl = mkl_mod.MultVariateKLD("sum")
    m.eval()
    encoded = {"x": _t(x_enc)}
    with torch.no_grad():
        context, kl = m.extract_sent_repr(encoded)
    _save_params(tag, m)
    data[f"{tag}/out/context"] = context.detach().numpy()
    data[f"{tag}/out/kl"] = kl.detach().numpy()


torch.manual_seed(2)
run_variational("ldndmv_vae", "all:vae")
run_variational("ldndmv_ib", "all:ib")


# ---------------------------------------------------------------------------
# named-tensor shim: torch 2.13 removed named tensors, which the
# reference joint code uses purely as DIMENSION LABELS (refine_names /
# align_as / max("V") / log_softmax("A")). Reinstate exactly that
# surface with names stored OUT-OF-BAND (a side table keyed by tensor
# identity) so every numeric op stays plain torch — the shim never
# touches values, it only resolves name -> dim index and inserts
# broadcast dims, which is all the old named-tensor semantics did in
# these call sites.
# ---------------------------------------------------------------------------
_NAMES: dict = {}  # id(tensor) -> (strong ref, names) — ref pins the id


def _names_of(t):
    ent = _NAMES.get(id(t))
    return ent[1] if ent is not None else None


def _set_names(t, names):
    _NAMES[id(t)] = (t, tuple(names))
    return t


def _refine_names(self, *names):
    assert len(names) == self.dim(), (names, self.shape)
    return _set_names(self, names)


def _rename(self, *names):
    assert names == (None,), "shim supports rename(None) only"
    return self


def _align_as(self, other):
    mine, theirs = _names_of(self), _names_of(other)
    assert mine is not None and theirs is not None, (mine, theirs)
    assert set(mine) <= set(theirs), (mine, theirs)
    # old-torch align_as requires my names in the same relative order
    order = [n for n in theirs if n in mine]
    assert list(mine) == order, (mine, theirs)
    shape = [self.shape[mine.index(n)] if n in mine else 1 for n in theirs]
    return _set_names(self.reshape(shape), theirs)


def _align_to(self, *names):
    mine = _names_of(self)
    assert mine is not None and set(mine) == set(names), (mine, names)
    perm = [mine.index(n) for n in names]
    return _set_names(self.permute(*perm), names)


_torch_max = torch.Tensor.max
_torch_log_softmax = torch.Tensor.log_softmax


def _max(self, dim=None, **kw):
    if isinstance(dim, str):
        names = _names_of(self)
        i = names.index(dim)
        out = _torch_max(self, i, **kw)
        kept = names[:i] + names[i + 1:]
        _set_names(out.values, kept)
        return out
    if dim is None:
        return _torch_max(self, **kw)
    return _torch_max(self, dim, **kw)


def _log_softmax(self, dim, **kw):
    if isinstance(dim, str):
        names = _names_of(self)
        return _set_names(
            _torch_log_softmax(self, names.index(dim), **kw), names
        )
    return _torch_log_softmax(self, dim, **kw)


torch.Tensor.refine_names = _refine_names
torch.Tensor.rename = _rename
torch.Tensor.align_as = _align_as
torch.Tensor.align_to = _align_to
torch.Tensor.max = _max
torch.Tensor.log_softmax = _log_softmax
torch.Tensor.names = property(_names_of)


# ---------------------------------------------------------------------------
# 2. DependencyBoxRel matching stack (ref: joint.py)
# ---------------------------------------------------------------------------
# P = 5 keeps the decode top-5 out of the exact -1e10 tie plateau
# (each prior group then has >= 5 distinct same-group candidates)
P = 5            # boxes per image
# vis encoder output dim == text encoder dim: the aug_with_matching
# fusion adds attmap @ _mid into encoded['x'] (ref: joint.py:673-674)
D_VIS = D_X
MH = 8           # match hidden

JM = joint_mod.DependencyBoxRel
jm = object.__new__(JM)
nn.Module.__init__(jm)
jm.cfg = types.SimpleNamespace(
    add_rel=True, add_attr=True, add_image=False, add_marginal=True,
    feat_fuse_mode="attention",
    feat_fuse_args=types.SimpleNamespace(aug_with_matching=True,
                                         replace=False),
    loss_grounding_args=types.SimpleNamespace(use_pos_prior=True,
                                              vis2txt=1.0),
    grounding_interpolation=0.3,
)
jm.vis_factor_names = ["obj", "rel", "attr"]
torch.manual_seed(3)
jm.word_encoder = nn_common.MLP(D_X, MH, dropout=0, activate=False)
jm.child_encoder = nn_common.MLP(D_X, MH, dropout=0, activate=True)
jm.parent_encoder = nn_common.MLP(D_X, MH, dropout=0, activate=True)
# random (not the reference's zeros-init) so the bilinear term is
# exercised tie-free
jm.arc_encoder_w1 = nn.Parameter(_t(_randn(MH, MH, MH, scale=0.3)))
jm.arc_encoder_w2 = nn.Parameter(_t(_randn(MH, MH, scale=0.3)))
jm.arc_encoder_b = nn.Parameter(_t(_randn(MH, scale=0.3)))
jm.vis_mlp_pre_matching = nn.Linear(D_VIS, MH, bias=False)
jm.feat_layernorm = nn.LayerNorm(D_X)
jm.criteria = nn.CrossEntropyLoss()
# POS priors over the N_TAG tag ids (disjoint groups)
jm.pos_for_obj = _t(np.array([0, 1], np.int64))
jm.pos_for_rel = _t(np.array([2], np.int64))
jm.pos_for_attr = _t(np.array([4], np.int64))
# group-method bindings normally done by set_impl_in_group
# (ref: base.py:131-142); identical functools.partial shape
jm.vis_feat = functools.partial(JM.vis_feat_unprune, jm)
jm.lang_feat = functools.partial(JM.lang_feat_max_tree, jm)
jm.gather_logit = functools.partial(JM.gather_logit_simple, jm)
jm.feat_fuse = functools.partial(JM.feat_fuse_attention, jm)
jm.dependency = types.SimpleNamespace(
    _forward=lambda inputs, encoded, vp: {"fused_x": encoded["x"]}
)
jm.eval()
_save_params("joint", jm)

box_feat = _randn(B, P, D_VIS)
rel_feat = _randn(B, P * P, D_VIS)
attr_feat = _randn(B, P, D_VIS)
box_mask = np.ones((B, P), bool)
box_mask[1, -1] = False
box_mask[3, -2:] = False
data["joint/in/box_feat"] = box_feat
data["joint/in/rel_feat"] = rel_feat
data["joint/in/attr_feat"] = attr_feat
data["joint/in/box_mask"] = box_mask

inputs_j = {
    "token": _t(tokens), "tag": _t(tags),
    "vis_box_mask": _t(box_mask),
    "vis_rel_mask": _t(np.ones((B, P, P), bool)),  # triggers triu branch
}
vis_encoded = {"box": _t(box_feat), "rel": _t(rel_feat),
               "attr": _t(attr_feat)}
vp = VarPool(seq_len=_t(seq_len), tag=_t(tags))
vp._pool["batch_size"] = B
vp._pool["max_len"] = L

with torch.no_grad():
    vis = jm.vis_feat_unprune(inputs_j, vis_encoded, vp)
data["joint/out/vis_feat"] = vis[0].rename(None).numpy()
data["joint/out/vis_mask"] = vis[1].rename(None).numpy()
data["joint/out/vis_split"] = np.asarray(vis[2])

encoded_x = {"x": _t(x_enc)}
with torch.no_grad():
    txt_w = jm.lang_feat_word_only(inputs_j, encoded_x, None, vp)
data["joint/out/word_repr"] = txt_w[0].rename(None).numpy()
data["joint/out/word_mask"] = txt_w[1].rename(None).numpy()
data["joint/out/word_marginal"] = txt_w[2].rename(None).numpy()

# word+maxdep factors need the DMV score tables: reuse the ldndmv leg's
# merged tables (same B/L) — the internal argmax/marginal DP is the
# reference torch-struct (already golden-pinned; here it pins the
# COMPOSITION: Viterbi heads -> gathered marginals -> arc bilinear)
lang_score = {
    "merged_dec": ld_out["merged_dec"].detach(),
    "merged_attach": ld_out["merged_attach"].detach(),
}
txt_m = jm.lang_feat_max_tree(inputs_j, encoded_x, lang_score, vp)
data["joint/out/maxdep_txt"] = txt_m[0].rename(None).detach().numpy()
data["joint/out/maxdep_mask"] = txt_m[1].rename(None).numpy()
data["joint/out/maxdep_marginal"] = txt_m[2].rename(None).detach().numpy()

with torch.no_grad():
    attmap = jm.gather_logit_simple(inputs_j, vis, txt_w, vp)
    logit_red = jm.gather_logit_reduced(inputs_j, vis, txt_w, vp)
data["joint/out/attmap"] = attmap.rename(None).numpy()
data["joint/out/logit_reduced"] = logit_red.rename(None).numpy()

# factor|ce grounding loss with POS priors + vis2txt
# (ref: joint.py:439-491). The self-normalization makes the VALUE
# degenerate (== num_token * (1 + vis2txt) whenever both terms are
# positive), so the discriminative pin is the GRADIENT through the
# whole chain (packing -> einsum -> masks -> POS priors -> max ->
# log_softmax -> marginal weighting -> normalization scale): run the
# loss on requires-grad leaves and freeze their grads.
box_g = _t(box_feat).requires_grad_()
rel_g = _t(rel_feat).requires_grad_()
attr_g = _t(attr_feat).requires_grad_()
x_g = _t(x_enc).requires_grad_()
vis_g = jm.vis_feat_unprune(
    inputs_j, {"box": box_g, "rel": rel_g, "attr": attr_g}, vp
)
txt_g = jm.lang_feat_word_only(inputs_j, {"x": x_g}, None, vp)
attmap_g = jm.gather_logit_simple(inputs_j, vis_g, txt_g, vp)
loss_in = {"match_logit": attmap_g, "txt_packed": txt_g,
           "vis_packed": vis_g}
loss, terms = jm.loss_grounding_factor_ce(loss_in, vp)
loss.backward()
data["joint/out/factor_ce_loss"] = loss.detach().numpy()
for k, v in terms.items():
    data[f"joint/out/factor_ce_{k}"] = v.detach().numpy()
data["joint/out/factor_ce_grad_box"] = box_g.grad.numpy()
data["joint/out/factor_ce_grad_rel"] = rel_g.grad.numpy()
data["joint/out/factor_ce_grad_attr"] = attr_g.grad.numpy()
data["joint/out/factor_ce_grad_x"] = x_g.grad.numpy()

# cap_img|ce (training-mode only; dropouts are 0) (ref: joint.py:493-499)
jm.train()
cap_loss, _ = jm.loss_grounding_cap_img_ll({"match_logit": logit_red}, vp)
data["joint/out/cap_img_loss"] = cap_loss.detach().numpy()
jm.eval()

# aug_with_matching fusion inside _forward (ref: joint.py:658-675)
encoded_full = {
    "x": _t(x_enc),
    "vis_box": _t(box_feat), "vis_rel": _t(rel_feat),
    "vis_attr": _t(attr_feat),
}
with torch.no_grad():
    fused = jm._forward(inputs_j, encoded_full, vp)
data["joint/out/fused_x"] = fused["fused_x"].rename(None).numpy()

# decode_grounding on_factor: POS priors (1e10 strength) -> best-box
# heuristics -> top-5 argsort -> (factor, box-id) index mapping
# (ref: joint.py:512-629). Runs on the word+maxdep attention map like
# the real pipeline (Q = 2(L+1) rows: words then arcs).
import json  # noqa: E402

jm.cfg.decode_grounding_args = types.SimpleNamespace(
    use_pos_prior=True, use_heuristic=True
)
with torch.no_grad():
    attmap_m = jm.gather_logit_simple(inputs_j, vis, txt_m, vp)
data["joint/out/attmap_maxdep"] = attmap_m.rename(None).detach().numpy()
box_index = rng.permutation(np.arange(4 * B * P))[:B * P].reshape(B, P)
data["joint/in/box_index"] = box_index
vp._pool["vis_box_index"] = _t(box_index)
if "seq_len_cpu" not in vp:
    vp._pool["seq_len_cpu"] = _t(seq_len)
dec_in = {
    "match_logit": attmap_m.detach().clone().refine_names(
        "B", "A", "Q", "V"
    ),
    "vis_packed": vis,
    "txt_packed": txt_m,
}
with torch.no_grad():
    dec_out = jm.decode_grounding_on_factor(dec_in, vp)
# ALSO freeze the post-edit diagonal logits and the raw top-5 flat
# indices: the -1e10 POS-prior/heuristic edits collapse to an EXACT
# f32 tie plateau (ulp(1e10) = 1024 > every score), so the top-5 tail
# order inside the plateau is argsort tie order — the test pins the
# VALUES everywhere, exact indices at unique ranks, and the index ->
# (factor, box) formatter on the reference's own indices.
dec_logit = dec_in["match_logit"].rename(None)  # mutated in place
dec_diag = dec_logit[torch.arange(B), torch.arange(B)]
data["joint/out/decode_logit"] = dec_diag.numpy()
data["joint/out/decode_top5_idx"] = (
    dec_diag.argsort(-1, descending=True)[..., :5].numpy()
)
data["joint/out/decode_factor_json"] = np.array(
    json.dumps(dec_out["txt_to_factor"])
)
data["joint/out/decode_img_json"] = np.array(json.dumps(
    [[int(v) for v in row] for row in dec_out["txt_to_img"]]
))

# prediction writer (ref: joint.py:718-743 + the on_factor ALIGN
# formatter joint.py:640-654): full CoNLL text with the ALIGN column(s)
# built from the decode output above, on stub dataset/vocab shells
import io  # noqa: E402


class _DSStub:
    """fastNLP DataSet surface write_prediction touches."""

    def __init__(self, rows):
        self.rows = rows

    def __getitem__(self, k):
        if isinstance(k, str):
            return types.SimpleNamespace(
                content=[r[k] for r in self.rows]
            )
        return self.rows[k]


class _VocabStub:
    def __init__(self, words):
        self._words = words

    def to_word(self, i):
        return self._words[int(i)]


tag_words = [f"TAG{i}" for i in range(N_TAG)]
ds_rows = [
    {
        "seq_len": int(seq_len[b]),
        "raw_word": [f"w{b}{i}" for i in range(L)],
        "tag": [int(t) for t in tags[b]],
    }
    for b in range(B)
]
pred_heads = [[int(h) for h in rng.integers(0, L + 1, L)]
              for _ in range(B)]
jm.format_factor_prediction = functools.partial(
    JM.format_factor_prediction_on_boxrel, jm
)
sio = io.StringIO()
jm.write_prediction(
    sio,
    {"arc": pred_heads, "txt_to_factor": dec_out["txt_to_factor"]},
    _DSStub(ds_rows),
    {"tag": _VocabStub(tag_words)},
)
data["joint/in/pred_heads"] = np.array(pred_heads)
data["joint/out/predict_text"] = np.array(sio.getvalue())

# on_img decode (ref: joint.py:506-510): argmax over images of the
# reduced caption logits
with torch.no_grad():
    on_img = jm.decode_grounding_on_image(
        {"match_logit": logit_red.rename(None)}, vp
    )
data["joint/out/decode_on_img"] = on_img["txt_to_img"].numpy()

# RNNEncoder composition (ref: text_encoder/rnn_encoder.py): the
# VariationalLSTM building block is pinned in nn_ref.npz; these legs
# pin the ENCODER wiring — per-layer output selection, multi-layer
# concat and ScalarMix, the hx (final-state) exposure — plus the
# context_mode='hx' consumption in ldndmv.extract_sent_repr
# (ref: ldndmv.py:223-224). Ragged descending lengths (sorted=True).
_stub_names = ("ScalarMix", "SharedDropout", "VariationalLSTM")
scalar_mix_mod = importlib.import_module("src.model.nn.scalar_mix")
dropout_mod = importlib.import_module("src.model.nn.dropout")
vlstm_mod = importlib.import_module("src.model.nn.variational_lstm")
nn_stub = sys.modules["src.model.nn"]
nn_stub.ScalarMix = scalar_mix_mod.ScalarMix
nn_stub.SharedDropout = dropout_mod.SharedDropout
nn_stub.IndependentDropout = dropout_mod.IndependentDropout
nn_stub.VariationalLSTM = vlstm_mod.VariationalLSTM
sys.modules["src.model.text_encoder"].__path__ = [
    os.path.join(REF, "src", "model", "text_encoder")
]
rnn_mod = importlib.import_module("src.model.text_encoder.rnn_encoder")

RNN_H = 4
rnn_lengths = np.array([L, L - 1, 2, 1], np.int64)
rnn_x = _randn(B, L, D_X)
data["rnn/in/x"] = rnn_x
data["rnn/in/lengths"] = rnn_lengths


def run_rnn(tag: str, **cfg_kw):
    torch.manual_seed(7)
    enc = rnn_mod.RNNEncoder(
        types.SimpleNamespace(embed_size=D_X),
        hidden_size=RNN_H, num_layers=2, lstm_dropout=0.0,
        shared_dropout=True, init_version="biased", **cfg_kw,
    )
    enc.eval()
    vp_r = VarPool(seq_len=_t(rnn_lengths))
    vp_r._pool["seq_len_cpu"] = _t(rnn_lengths)
    with torch.no_grad():
        out = enc(_t(rnn_x), vp_r)
    _save_params(tag, enc)
    data[f"{tag}/out/x"] = out["x"].numpy()
    data[f"{tag}/out/hiddens"] = out["hiddens"].numpy()
    return out


rnn_out = run_rnn("rnn_last", output_layers=-1)
run_rnn("rnn_concat", output_layers=[0, 1])
run_rnn("rnn_mix", output_layers=[0, 1], mix=True)

# context_mode='hx' consumption of the hx exposure
m_hx = object.__new__(ldndmv_mod.DiscriminativeNDMV)
nn.Module.__init__(m_hx)
m_hx.cfg = types.SimpleNamespace(context_mode="hx",
                                 variational_mode="none")
m_hx.variational_enc = None
m_hx.eval()
with torch.no_grad():
    ctx_hx, _ = m_hx.extract_sent_repr(
        {"x": rnn_out["x"], "hiddens": rnn_out["hiddens"]}
    )
data["rnn_last/out/hx_context"] = ctx_hx.numpy()

# embedding adaptor math (ref: embedding/fastnlp_embedding.py +
# embedding/embedding.py:155-166): count-weighted scalar whitening,
# per-dimension whitening (torch.std: ddof=1, no epsilon; padding row 0
# excluded), and the variational adaptor's eval forward (z = posterior
# mean) + VAE/IB KL
_stub("fastNLP.embeddings", StaticEmbedding=object, TokenEmbedding=object,
      CNNCharEmbedding=object, LSTMCharEmbedding=object)
# the embedding stub keeps its attrs (base/ldndmv imports) but gains a
# __path__ so the real submodules load
sys.modules["src.model.embedding"].__path__ = [
    os.path.join(REF, "src", "model", "embedding")
]
femb_mod = importlib.import_module("src.model.embedding.fastnlp_embedding")
emb_base_mod = importlib.import_module("src.model.embedding.embedding")

emb_table0 = _randn(N_WORD, D_WORD) * 2.0 + 0.5
emb_counts = rng.integers(1, 50, N_WORD).astype(np.float64)
data["embnorm/in/table"] = emb_table0
data["embnorm/in/counts"] = emb_counts
for method in ("mean", "std", "mean+std"):
    key = method.replace("+", "_")
    # count-weighted branch (StaticEmbedding path)
    ad = object.__new__(femb_mod.FastNLPEmbeddingAdaptor)
    nn.Module.__init__(ad)
    ad._normalize_warned = True
    ad._normalize_weight = None
    ad.emb = types.SimpleNamespace(
        embedding=nn.Embedding.from_pretrained(_t(emb_table0.copy())),
        mapped_counts=_t(emb_counts),
    )
    ad.normalize(method)
    data[f"embnorm/out/counted_{key}"] = (
        ad.emb.embedding.weight.detach().numpy().copy()
    )
    # per-dimension branch (no mapped_counts; padding_idx 0)
    ad2 = object.__new__(femb_mod.FastNLPEmbeddingAdaptor)
    nn.Module.__init__(ad2)
    ad2._normalize_warned = True
    ad2._normalize_weight = None
    w2 = nn.Embedding.from_pretrained(_t(emb_table0.copy()))
    ad2.emb = types.SimpleNamespace(
        embedding=w2,
        get_word_vocab=lambda: types.SimpleNamespace(padding_idx=0),
    )
    ad2.normalize(method)
    data[f"embnorm/out/perdim_{key}"] = (
        w2.weight.detach().numpy().copy()
    )

for vmode in ("vae", "ib"):
    torch.manual_seed(11)
    vad = object.__new__(femb_mod.FastNLPEmbeddingVariationalAdaptor)
    nn.Module.__init__(vad)
    vad.mode = vmode
    vad._embed_size = 3
    vad.emb = nn.Embedding.from_pretrained(_t(emb_table0))
    vad.enc = nn.Linear(D_WORD, 2 * 3)
    if vmode == "ib":
        vad.gaussian_kl = mkl_mod.MultVariateKLD("sum")
        vad.target_mean = nn.Parameter(_t(_randn(1, 3)))
        vad.target_lvar = nn.Parameter(_t(_randn(1, 3, scale=0.3)))
    vad.eval()
    vp_e = VarPool(seq_len=_t(seq_len))
    with torch.no_grad():
        z = vad(_t(words), vp_e)
    _save_params(f"embvar_{vmode}", vad)
    data[f"embvar_{vmode}/out/z"] = z.numpy()
    data[f"embvar_{vmode}/out/kl"] = vp_e.kl.detach().numpy()

# classic tabular DMV + EM M-step (ref: dmv.py:82-186): the per-token
# table gathers with the triu direction fold, the NLL, and one full EM
# cycle (E-counts = -grad of the loss; M-step = log-softmax of
# log(counts + smooth) over root axis 0 / dec axis 3 / trans CHILD
# axis 1)
km_real = importlib.import_module("src.model.dmv_helper.km_init")
good_real = importlib.import_module("src.model.dmv_helper.good_init")
helper_stub = sys.modules["src.model.dmv_helper"]
helper_stub.km_init = km_real.km_init
helper_stub.good_init = good_real.good_init
sys.modules.pop("src.model.dmv", None)
dmv_mod = importlib.import_module("src.model.dmv")

mdl = object.__new__(dmv_mod.DMV)
nn.Module.__init__(mdl)
mdl.cfg = types.SimpleNamespace(n_token=N_TOKEN, viterbi_training=False)
mdl.root_param = nn.Parameter(_t(_randn(N_TOKEN)))
mdl.trans_param = nn.Parameter(_t(_randn(N_TOKEN, N_TOKEN, 2, 2)))
mdl.dec_param = nn.Parameter(_t(_randn(N_TOKEN, 2, 2, 2)))
mdl.optimizer = None

dmv_tokens = rng.integers(0, N_TOKEN, (B, L)).astype(np.int64)
dmv_lengths = np.array([L, L - 1, 3, 2], np.int64)
data["dmv/in/tokens"] = dmv_tokens
data["dmv/in/lengths"] = dmv_lengths
# .copy(): the M-step's apply() swaps the OLD param storage into the
# accumulators and reset() zeroes it in place — a plain .numpy() view
# would be wiped before savez
data["dmv/param/root"] = mdl.root_param.detach().numpy().copy()
data["dmv/param/trans"] = mdl.trans_param.detach().numpy().copy()
data["dmv/param/dec"] = mdl.dec_param.detach().numpy().copy()

vp_d = VarPool(seq_len=_t(dmv_lengths))
vp_d._pool["batch_size"] = B
vp_d._pool["max_len"] = L
fwd_d = mdl._forward({"token": _t(dmv_tokens)}, {}, vp_d)
data["dmv/out/merged_dec"] = fwd_d["merged_dec"].detach().numpy()
data["dmv/out/merged_attach"] = fwd_d["merged_attach"].detach().numpy()
loss_d, aux_d = mdl.loss(fwd_d, {}, vp_d)
data["dmv/out/nll"] = loss_d.detach().numpy()

dmv_mod.DMV._instance = mdl
opt_d = dmv_mod.DMVMStepOptimizer(None, smooth=0.1)
loss_d.backward()
opt_d.step()
opt_d.apply()
data["dmv/out/em_root"] = mdl.root_param.detach().numpy()
data["dmv/out/em_trans"] = mdl.trans_param.detach().numpy()
data["dmv/out/em_dec"] = mdl.dec_param.detach().numpy()

# generate_rule_1o on a battery of head sequences incl. the root-row
# quirk cases (ref: good_init_nn.py:41-78) — extends the init-table
# goldens (init_ref.npz) to the per-sentence warmup targets
gi_mod = importlib.import_module("src.model.dmv_helper.good_init_nn")
rule_cases = [
    [0, 1, 1],               # chain off the root
    [2, 0, 2, 3],            # mixed directions
    [0],                     # single token
    [3, 3, 0, 3, 4],         # multi-dependent head + right chain
    [2, 0, 2, 2, 4, 5, 4],   # deep nesting, both outermost sides
]
for ci, heads in enumerate(rule_cases):
    out_r = gi_mod.generate_rule_1o(heads)
    data[f"rule1o_{ci}/in/heads"] = np.asarray(heads)
    for k, v in out_r.items():
        data[f"rule1o_{ci}/out/{k}"] = np.asarray(v)

np.savez(os.path.join(OUT, "model_ref.npz"), **data)
print(f"model_ref.npz: {len(data)} arrays")
print("  ldndmv attach[0,0,:3]:",
      data["ldndmv/out/attach"][0, 0, :3].round(4))
print("  factor_ce loss:", data["joint/out/factor_ce_loss"])
print("  cap_img loss:", data["joint/out/cap_img_loss"])
