"""Neural-layer golden parity vs the reference implementation.

tests/golden/nn_ref.npz holds weights + inputs + outputs produced by
running the reference's torch nn modules (ref: src/model/nn/,
src/model/vis_encoder/box_rel.py) in eval mode — see
scripts/make_nn_golden.py. Loading the SAME weights into the flax
modules must reproduce the outputs, pinning layer semantics (activation
order, skip connections, valence/direction stacking, biaffine scaling,
LSTM gate layout) against the reference bit-for-bit (fp32 tolerance).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlgae_tpu.models.nn import (
    MLP,
    Biaffine,
    BiaffineScorer,
    DMVFactorizedBilinear,
    DMVSkipConnectEncoder,
    ResLayer,
    ScalarMix,
    multivariate_kl,
)
from vlgae_tpu.models.text_encoder import RNNEncoder
from vlgae_tpu.models.vis_encoder import VisBoxRelSimpleEncoder

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "nn_ref.npz")


@pytest.fixture(scope="module")
def ref():
    return np.load(GOLDEN)


def dense(ref, key):
    """torch nn.Linear -> flax Dense params (kernel is transposed)."""
    out = {"kernel": ref[f"{key}.weight"].T}
    if f"{key}.bias" in ref:
        out["bias"] = ref[f"{key}.bias"]
    return out


def sub(ref, prefix):
    """Slice an npz into a {suffix: array} dict."""
    p = prefix + "/"
    return {k[len(p):]: ref[k] for k in ref.files if k.startswith(p)}


def test_mlp(ref):
    for tag, activate in (("mlp", True), ("mlp_noact", False)):
        d = sub(ref, tag)
        params = {"params": {"Dense_0": dense(d, "param/linear")}}
        got = MLP(n_hidden=8, activate=activate).apply(params, d["in/x"])
        np.testing.assert_allclose(got, d["out/y"], rtol=1e-5, atol=1e-6)


def test_res_layer(ref):
    d = sub(ref, "res_layer")
    params = {"params": {
        "Dense_0": dense(d, "param/linear.0"),
        "Dense_1": dense(d, "param/linear.2"),
    }}
    got = ResLayer(n_hidden=10).apply(params, d["in/x"])
    np.testing.assert_allclose(got, d["out/y"], rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("tag,kw", [
    ("skip_enc", dict(n_bottleneck=0, n_mid=0)),
    ("skip_enc_bn", dict(n_bottleneck=4, n_mid=12)),
])
def test_dmv_skip_connect_encoder(ref, tag, kw):
    d = sub(ref, tag)
    p = {}
    for name in ("HASCHILD", "NOCHILD", "LEFT", "RIGHT"):
        if kw["n_bottleneck"] == 0:
            p[name] = dense(d, f"param/{name}_linear")
        else:
            p[f"{name}_down"] = dense(d, f"param/{name}_linear.0")
            p[f"{name}_up"] = dense(d, f"param/{name}_linear.1")
    p["valence"] = dense(d, "param/valence_linear")
    p["direction"] = dense(d, "param/direction_linear")
    p["mid1"] = dense(d, "param/linear1")
    p["mid2"] = dense(d, "param/linear2")
    got = DMVSkipConnectEncoder(hidden_size=16, **kw).apply(
        {"params": p}, d["in/x"]
    )
    # the reference stacks [no_child, has_child] on the valence axis
    # (ref: dmv_spec.py:43); this repo stacks [has_child, no_child] to
    # match its DP constants (HASCHILD=0) — same tensors, flipped axis
    np.testing.assert_allclose(
        got, d["out/y"][..., ::-1, :], rtol=1e-5, atol=1e-6
    )


def test_factorized_bilinear(ref):
    d = sub(ref, "fact_bilinear")
    p = {"project1": dense(d, "param/project1"),
         "project2": dense(d, "param/project2")}
    m = DMVFactorizedBilinear(r=4)
    got = m.apply({"params": p}, d["in/x1"], d["in/x2"])
    np.testing.assert_allclose(got, d["out/y"], rtol=1e-5, atol=1e-6)
    # tokens_last is a pure layout change of the same scores
    got_tl = m.apply({"params": p}, d["in/x1"], d["in/x2"],
                     tokens_last=True)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got_tl), -1, 2), d["out/y"],
        rtol=1e-5, atol=1e-6,
    )


def test_biaffine(ref):
    d = sub(ref, "biaffine")
    got = Biaffine(n_out=2).apply(
        {"params": {"weight": d["param/weight"]}}, d["in/x"], d["in/y"]
    )
    np.testing.assert_allclose(got, d["out/s"], rtol=1e-5, atol=1e-6)


def test_biaffine_scorer(ref):
    d = sub(ref, "biaffine_scorer")
    p = {
        "mlp1": {"Dense_0": dense(d, "param/mlp1.linear")},
        "mlp2": {"Dense_0": dense(d, "param/mlp2.linear")},
        "affine": {"weight": d["param/affine.weight"]},
    }
    got = BiaffineScorer(hidden_dim=8, out_dim=2).apply(
        {"params": p}, d["in/x"], d["in/y"]
    )
    np.testing.assert_allclose(got, d["out/s"], rtol=1e-5, atol=1e-6)


def test_scalar_mix(ref):
    d = sub(ref, "scalar_mix")
    p = {"weights": d["param/weights"], "gamma": d["param/gamma"]}
    ts = [d[f"in/t{i}"] for i in range(3)]
    got = ScalarMix(n_layers=3).apply({"params": p}, ts)
    np.testing.assert_allclose(got, d["out/y"], rtol=1e-5, atol=1e-6)


def test_multivariate_kl(ref):
    mu1, mu2 = ref["mkl/in/mu1"], ref["mkl/in/mu2"]
    lv1, lv2 = ref["mkl/in/lv1"], ref["mkl/in/lv2"]
    for red in ("sum", "mean"):
        got = multivariate_kl(mu1, mu2, lv1, lv2, reduction=red)
        want = ref[f"mkl_{red}/out/kl"]
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_vis_box_rel_encoder(ref):
    d = sub(ref, "vis_box_rel")
    p = {
        "box_fc": {"Dense_0": dense(d, "param/box_fc.linear")},
        "attr_fc": {"Dense_0": dense(d, "param/attr_fc.linear")},
        "img_fc": {"Dense_0": dense(d, "param/img_fc.linear")},
        # this repo factorizes the pairwise-mean rel MLP (the linear
        # layer distributes over the mean — see vis_encoder.py docstring)
        "rel_fc": {"kernel": d["param/rel_fc.linear.weight"].T},
        "rel_fc_bias": d["param/rel_fc.linear.bias"],
    }
    enc = VisBoxRelSimpleEncoder(
        n_hidden=8, use_attr=True, use_img=True, img_feat=True
    )
    got = enc.apply({"params": p}, {"vis_box_feat": d["in/feat"]})
    for key in ("box", "rel", "attr", "img"):
        np.testing.assert_allclose(
            got[key], d[f"out/{key}"], rtol=1e-4, atol=1e-5,
            err_msg=key,
        )


def _lstm_cell_params(d, torch_name):
    """torch LSTMCell (gate order i,f,g,o; two biases that add) ->
    flax OptimizedLSTMCell (per-gate denses; bias on the hidden ones)."""
    w_ih = d[f"param/{torch_name}.weight_ih"]
    w_hh = d[f"param/{torch_name}.weight_hh"]
    b = d[f"param/{torch_name}.bias_ih"] + d[f"param/{torch_name}.bias_hh"]
    H = w_hh.shape[1]
    out = {}
    for g, gate in enumerate("ifgo"):
        sl = slice(g * H, (g + 1) * H)
        out[f"i{gate}"] = {"kernel": w_ih[sl].T}
        out[f"h{gate}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return {"OptimizedLSTMCell_0": out}


def test_variational_lstm(ref):
    """The RNNEncoder's masked-scan BiLSTM reproduces the reference
    VariationalLSTM (PackedSequence loop) on ragged lengths, including
    zeros at padded positions (ref: nn/variational_lstm.py)."""
    d = sub(ref, "vlstm")
    x, lengths, want = d["in/x"], d["in/lengths"], d["out/y"]
    B, L, _ = x.shape
    mask = (np.arange(L)[None, :] < lengths[:, None]).astype(np.float32)

    p = {}
    for i in range(2):
        p[f"fwd_{i}"] = {"cell": _lstm_cell_params(d, f"f_cells.{i}")}
        p[f"bwd_{i}"] = {"cell": _lstm_cell_params(d, f"b_cells.{i}")}
    enc = RNNEncoder(hidden_size=4, num_layers=2, lstm_dropout=0.0)
    got = enc.apply({"params": p}, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(got["x"], want, rtol=1e-5, atol=1e-6)
