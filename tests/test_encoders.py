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
