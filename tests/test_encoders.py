"""Text encoder tests: BiLSTM masking/determinism, MultiEncoder mapping."""

import numpy as np

import jax
import jax.numpy as jnp

from vlgae_tpu.models.text_encoder import (
    BlankEncoder,
    MLPEncoder,
    MultiEncoder,
    RNNEncoder,
)


def test_rnn_encoder_masking():
    rng = np.random.default_rng(0)
    B, L, D = 3, 7, 10
    emb = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = jnp.asarray(
        np.arange(L)[None, :] < np.array([7, 4, 2])[:, None]
    )
    enc = RNNEncoder(hidden_size=8, num_layers=2)
    params = enc.init(jax.random.key(0), emb, mask)
    out = enc.apply(params, emb, mask)
    x = np.asarray(out["x"])
    assert x.shape == (B, L, 16)
    # padding positions produce zeros
    assert np.allclose(x[1, 4:], 0.0)
    assert np.allclose(x[2, 2:], 0.0)
    # padding content must not influence valid outputs
    emb2 = emb.at[1, 5].set(99.0)
    x2 = np.asarray(enc.apply(params, emb2, mask)["x"])
    np.testing.assert_allclose(x[1, :4], x2[1, :4], atol=1e-6)
    assert out["hiddens"].shape == (2, B, 8)


def test_rnn_encoder_grads():
    rng = np.random.default_rng(1)
    B, L, D = 2, 5, 6
    emb = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = jnp.ones((B, L), bool)
    enc = RNNEncoder(hidden_size=4, num_layers=1)
    params = enc.init(jax.random.key(0), emb, mask)

    def loss(p):
        return jnp.sum(enc.apply(p, emb, mask)["x"] ** 2)

    g = jax.grad(loss)(params)
    assert all(
        np.all(np.isfinite(l)) for l in jax.tree_util.tree_leaves(g)
    )
    total = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert total > 0


def test_multi_encoder_mapping():
    rng = np.random.default_rng(2)
    B, L, D = 2, 4, 6
    emb = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    mask = jnp.ones((B, L), bool)
    enc = MultiEncoder(
        encoders=(("a", MLPEncoder(n_hidden=5)), ("b", BlankEncoder(n_in=D))),
        mapping=(("x", ("a.x", "b.x")), ("y", ("b.x",))),
    )
    params = enc.init(jax.random.key(0), emb, mask)
    out = enc.apply(params, emb, mask)
    assert out["x"].shape == (B, L, 5 + D)
    assert out["y"].shape == (B, L, D)
    assert enc.get_dim("x") == 5 + D


def test_biaffine_scorer_shapes_and_scale():
    from vlgae_tpu.models.nn import Biaffine, BiaffineScorer

    rng = np.random.default_rng(3)
    B, L, D, H = 2, 5, 8, 6
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)

    arc = BiaffineScorer(hidden_dim=H, out_dim=1)
    p = arc.init(jax.random.key(0), x, x2)
    out = arc.apply(p, x, x2)
    assert out.shape == (B, L, L, 1)
    # zero-initialized biaffine weight -> zero scores at init
    assert np.allclose(np.asarray(out), 0.0)

    lab = BiaffineScorer(hidden_dim=H, out_dim=3, scale=False)
    p = lab.init(jax.random.key(1), x, x2)
    out = lab.apply(p, x, x2)
    assert out.shape == (B, L, L, 3)

    # scale=True multiplies both MLP outputs by H**-0.25; with the bias
    # rows/cols of the affine weight zeroed the score is purely bilinear
    # in the MLP outputs, so the scaled score is H**-0.5 x unscaled
    w = jnp.asarray(rng.standard_normal(
        np.asarray(p["params"]["affine"]["weight"]).shape), jnp.float32)
    w = w.at[:, -1, :].set(0.0).at[:, :, -1].set(0.0)
    p_w = jax.tree_util.tree_map(lambda a: a, p)
    p_w["params"]["affine"]["weight"] = w
    unscaled = lab.apply(p_w, x, x2)
    scaled = BiaffineScorer(hidden_dim=H, out_dim=3, scale=True).apply(
        p_w, x, x2)
    np.testing.assert_allclose(
        np.asarray(scaled), np.asarray(unscaled) * H ** -0.5,
        rtol=1e-5, atol=1e-6)


def test_biaffine_bias_terms():
    from vlgae_tpu.models.nn import Biaffine

    rng = np.random.default_rng(4)
    B, L, D = 2, 4, 5
    x = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((B, L, D)), jnp.float32)
    bi = Biaffine(n_out=1, bias_x=True, bias_y=False)
    p = bi.init(jax.random.key(0), x, y)
    w = jnp.asarray(rng.standard_normal((1, D + 1, D)), jnp.float32)
    p = {"params": {"weight": w}}
    out = bi.apply(p, x, y)
    xb = np.concatenate([np.asarray(x), np.ones((B, L, 1), np.float32)], -1)
    want = np.einsum("bxi,ij,byj->bxy", xb, np.asarray(w[0]), np.asarray(y))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)
