"""Generate NEURAL-LAYER golden fixtures FROM THE REFERENCE implementation.

Extends the math-layer goldens (scripts/make_golden_fixtures.py) and the
host-protocol goldens (scripts/make_host_golden.py) to the neural
building blocks: runs the reference's torch nn modules
(/root/reference/src/model/nn/ + vis_encoder/box_rel.py) in eval mode on
fixed weights and inputs, and freezes weights + inputs + outputs as
``tests/golden/nn_ref.npz``. tests/test_nn_golden.py then loads the same
weights into the flax modules and asserts output parity, pinning the
layer semantics (activation order, skip connections, scaling, gate
layout) bit-for-bit against the reference.

The reference's ``src`` package __init__ needs pytorch_lightning (absent
here), so the nn modules are imported through synthetic package shells
whose __path__ points at the reference tree — every line of MODULE code
that runs is reference code. Only OUTPUT artifacts are committed; no
reference code is copied.

Usage: python scripts/make_nn_golden.py [reference_path]
"""

from __future__ import annotations

import importlib
import os
import sys
import types

import numpy as np
import torch

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")
os.makedirs(OUT, exist_ok=True)


def _shell(name: str, path: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    mod.__path__ = [path]
    sys.modules[name] = mod
    return mod


# package shells bypassing src/__init__ (which imports lightning)
_shell("src", os.path.join(REF, "src"))
_shell("src.model", os.path.join(REF, "src", "model"))
nn_pkg = _shell("src.model.nn", os.path.join(REF, "src", "model", "nn"))
ve_pkg = _shell(
    "src.model.vis_encoder", os.path.join(REF, "src", "model", "vis_encoder")
)

dropout_mod = importlib.import_module("src.model.nn.dropout")
common = importlib.import_module("src.model.nn.common")
dmv_spec = importlib.import_module("src.model.nn.dmv_spec")
affine = importlib.import_module("src.model.nn.affine")
affine_scorer = importlib.import_module("src.model.nn.affine_scorer")
scalar_mix_mod = importlib.import_module("src.model.nn.scalar_mix")
mkl_mod = importlib.import_module("src.model.nn.multivariate_kl")
vlstm_mod = importlib.import_module("src.model.nn.variational_lstm")
# attributes box_rel.py pulls from the shells
nn_pkg.MLP = common.MLP
nn_pkg.BiaffineScorer = affine_scorer.BiaffineScorer
ve_base = importlib.import_module("src.model.vis_encoder.base")
ve_pkg.VisEncoderBase = ve_base.VisEncoderBase
box_rel = importlib.import_module("src.model.vis_encoder.box_rel")

torch.manual_seed(0)
rng = np.random.default_rng(0)

data: dict = {}


def _save(prefix: str, module: torch.nn.Module, inputs: dict, outputs: dict):
    for name, p in module.named_parameters():
        data[f"{prefix}/param/{name}"] = p.detach().numpy()
    for k, v in inputs.items():
        data[f"{prefix}/in/{k}"] = v
    for k, v in outputs.items():
        data[f"{prefix}/out/{k}"] = v.detach().numpy()


def _randn(*shape):
    return rng.standard_normal(shape).astype(np.float32)


# ---- MLP (ref: common.py:23-51) -----------------------------------------
x = _randn(3, 5, 12)
m = common.MLP(12, 8, dropout=0, activate=True).eval()
_save("mlp", m, {"x": x}, {"y": m(torch.tensor(x))})

m = common.MLP(12, 8, dropout=0, activate=False).eval()
_save("mlp_noact", m, {"x": x}, {"y": m(torch.tensor(x))})

# ---- ResLayer (ref: common.py:7-20) --------------------------------------
x = _randn(4, 10)
m = common.ResLayer(10, 10).eval()
_save("res_layer", m, {"x": x}, {"y": m(torch.tensor(x))})

# ---- DMVSkipConnectEncoder (ref: dmv_spec.py:6-56) ------------------------
# output axes [..., dir, val, hidden]; the reference stacks
# [no_child, has_child] on the valence axis (dmv_spec.py:43)
x = _randn(2, 6, 16)
m = dmv_spec.DMVSkipConnectEncoder(16).eval()
_save("skip_enc", m, {"x": x}, {"y": m(torch.tensor(x))})

m = dmv_spec.DMVSkipConnectEncoder(16, n_bottleneck=4, n_mid=12).eval()
_save("skip_enc_bn", m, {"x": x}, {"y": m(torch.tensor(x))})

# ---- DMVFactorizedBilinear (ref: dmv_spec.py:59-76) -----------------------
x1 = _randn(2, 6, 2, 2, 16)
x2 = _randn(2, 9, 2, 2, 16)
m = dmv_spec.DMVFactorizedBilinear(16, r=4).eval()
_save("fact_bilinear", m, {"x1": x1, "x2": x2},
      {"y": m(torch.tensor(x1), torch.tensor(x2))})

# ---- Biaffine (ref: affine.py:7-72) ---------------------------------------
bx = _randn(2, 5, 7)
by = _randn(2, 5, 7)
m = affine.Biaffine(7, n_out=2, bias_x=True, bias_y=True)
with torch.no_grad():  # zeros init is degenerate; use random weights
    m.weight.copy_(torch.tensor(_randn(2, 8, 8)))
m = m.eval()
_save("biaffine", m, {"x": bx, "y": by},
      {"s": m(torch.tensor(bx), torch.tensor(by))})

# ---- BiaffineScorer (ref: affine_scorer.py:11-35) -------------------------
sx = _randn(2, 5, 12)
sy = _randn(2, 5, 12)
m = affine_scorer.BiaffineScorer(
    24, hidden_dim=8, out_dim=2, mlp_dropout=0, mlp_activate=True,
    scale=True,
)
with torch.no_grad():
    m.affine.weight.copy_(torch.tensor(_randn(2, 9, 9)))
m = m.eval()
_save("biaffine_scorer", m, {"x": sx, "y": sy},
      {"s": m(torch.tensor(sx), torch.tensor(sy))})

# ---- ScalarMix (ref: scalar_mix.py) ---------------------------------------
ts = [_randn(2, 4, 6) for _ in range(3)]
m = scalar_mix_mod.ScalarMix(3)
with torch.no_grad():
    m.weights.copy_(torch.tensor(np.array([0.3, -0.5, 1.1], np.float32)))
    m.gamma.copy_(torch.tensor([1.7]))
m = m.eval()
_save("scalar_mix", m, {f"t{i}": t for i, t in enumerate(ts)},
      {"y": m([torch.tensor(t) for t in ts])})

# ---- MultVariateKLD (ref: multivariate_kl.py) ------------------------------
mu1, mu2 = _randn(4, 6), _randn(4, 6)
lv1, lv2 = _randn(4, 6) * 0.3, _randn(4, 6) * 0.3
for red in ("sum", "mean"):
    m = mkl_mod.MultVariateKLD(red).eval()
    kl = m(torch.tensor(mu1), torch.tensor(mu2),
           torch.tensor(lv1), torch.tensor(lv2))
    data[f"mkl_{red}/out/kl"] = kl.detach().numpy()
data["mkl/in/mu1"], data["mkl/in/mu2"] = mu1, mu2
data["mkl/in/lv1"], data["mkl/in/lv2"] = lv1, lv2

# ---- VisBoxRelSimpleEncoder (ref: box_rel.py:8-56) -------------------------
feat = _randn(2, 5, 16)
m = box_rel.VisBoxRelSimpleEncoder(
    n_in=16, n_hidden=8, dropout=0, activate=True,
    use_attr=True, use_img=True, img_feat=True,
).eval()
out = m({"vis_box_feat": torch.tensor(feat)}, None)
_save("vis_box_rel", m, {"feat": feat}, out)

# ---- VariationalLSTM (ref: variational_lstm.py), eval mode ----------------
# 2-layer bidirectional over a PackedSequence with ragged lengths; the
# flax side must reproduce outputs at every REAL position (pads are 0)
from torch.nn.utils.rnn import pack_padded_sequence, pad_packed_sequence

B, L, D, H = 3, 6, 5, 4
lx = _randn(B, L, D)
lengths = np.array([6, 4, 2], np.int64)
m = vlstm_mod.VariationalLSTM(D, H, num_layers=2, dropout=0).eval()
packed = pack_padded_sequence(
    torch.tensor(lx), torch.tensor(lengths), batch_first=True
)
layer_outs, _ = m(packed)  # list of per-layer PackedSequences
y, _ = pad_packed_sequence(
    layer_outs[-1], batch_first=True, total_length=L
)
_save("vlstm", m, {"x": lx},
      {"y": y})
data["vlstm/in/lengths"] = lengths

np.savez(os.path.join(OUT, "nn_ref.npz"), **data)
print(f"wrote {os.path.join(OUT, 'nn_ref.npz')} with {len(data)} arrays")
