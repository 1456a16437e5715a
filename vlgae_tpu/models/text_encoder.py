"""Text encoders: MLP / Blank / BiLSTM (variational dropout) / Multi.

Re-designed from the reference encoder zoo (ref: src/model/text_encoder/
and src/model/nn/variational_lstm.py). The BiLSTM is a lax.scan over
time with per-sequence-shared (variational) dropout masks -- the JAX
counterpart of the hand-rolled PackedSequence LSTM.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as fnn

from .nn import ScalarMix, shared_dropout


class MLPEncoder(fnn.Module):
    """Linear + dropout encoder (ref: text_encoder/mlp_encoder.py)."""

    n_hidden: int
    dropout: float = 0.0
    shared_dropout: float = 0.0

    def get_dim(self, field: str = "x") -> int:
        return self.n_hidden

    @property
    def output_size(self):
        return self.n_hidden

    @fnn.compact
    def __call__(self, emb, mask, *, deterministic: bool = True):
        x = fnn.Dense(self.n_hidden)(emb)
        if not deterministic:
            if self.dropout > 0:
                x = fnn.Dropout(self.dropout, deterministic=False)(x)
            if self.shared_dropout > 0:
                x = shared_dropout(
                    self.make_rng("dropout"), x, self.shared_dropout, False
                )
        return {"x": x}


class BlankEncoder(fnn.Module):
    """Dropout-only passthrough (ref: text_encoder/blank_encoder.py)."""

    n_in: int = 0
    dropout: float = 0.0

    def get_dim(self, field: str = "x") -> int:
        return self.n_in

    @property
    def output_size(self):
        return self.n_in

    @fnn.compact
    def __call__(self, emb, mask, *, deterministic: bool = True):
        x = emb
        if self.dropout > 0 and not deterministic:
            x = fnn.Dropout(self.dropout, deterministic=False)(x)
        return {"x": x}


def _forget_bias_init(key, shape, dtype=jnp.float32):
    """Zero bias with the forget-gate block set to 1 (gate order in flax
    is i, f, g, o) — the reference's 'biased' init_version
    (ref: rnn_encoder.py reset_parameters)."""
    b = jnp.zeros(shape, dtype)
    h = shape[-1] // 4
    return b.at[..., h: 2 * h].set(1.0)


def _lstm_inits(init_version: str):
    if init_version == "zy":
        # orthogonal weights + zero bias
        return dict(
            kernel_init=fnn.initializers.orthogonal(),
            recurrent_kernel_init=fnn.initializers.orthogonal(),
            bias_init=fnn.initializers.zeros_init(),
        )
    if init_version == "biased":
        return dict(
            kernel_init=fnn.initializers.xavier_uniform(),
            recurrent_kernel_init=fnn.initializers.xavier_uniform(),
            bias_init=_forget_bias_init,
        )
    raise ValueError(f"unknown init_version: {init_version!r}")


class _MaskedLSTMStep(fnn.Module):
    """One masked LSTM step with a shared (variational) hidden-dropout
    mask carried alongside the state (ref: nn/variational_lstm.py)."""

    hidden: int
    init_version: str = "zy"

    @fnn.compact
    def __call__(self, carry, inp):
        c, h, hmask = carry
        xt, mt = inp
        cell = fnn.OptimizedLSTMCell(self.hidden,
                                     **_lstm_inits(self.init_version))
        (nc, nh), out = cell((c, h * hmask), xt)
        keep = mt[:, None]
        nc = jnp.where(keep, nc, c)
        nh = jnp.where(keep, nh, h)
        return (nc, nh, hmask), jnp.where(keep, out, 0.0)


class _LSTMLayer(fnn.Module):
    """One direction, one layer, with variational recurrent dropout."""

    hidden: int
    reverse: bool = False
    recurrent_dropout: float = 0.0
    init_version: str = "zy"

    @fnn.compact
    def __call__(self, x, mask, *, deterministic: bool = True):
        B, L, _ = x.shape
        if self.recurrent_dropout > 0 and not deterministic:
            rng = self.make_rng("dropout")
            hmask = jax.random.bernoulli(
                rng, 1 - self.recurrent_dropout, (B, self.hidden)
            ) / (1 - self.recurrent_dropout)
        else:
            hmask = jnp.ones((B, self.hidden))
        carry = (
            jnp.zeros((B, self.hidden)),
            jnp.zeros((B, self.hidden)),
            hmask.astype(jnp.float32),
        )

        xs = jnp.moveaxis(x, 1, 0)  # [L, B, D]
        ms = jnp.moveaxis(mask, 1, 0)  # [L, B]
        if self.reverse:
            xs, ms = xs[::-1], ms[::-1]

        scan = fnn.scan(
            _MaskedLSTMStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        _, ys = scan(self.hidden, self.init_version,
                     name="cell")(carry, (xs, ms))
        if self.reverse:
            ys = ys[::-1]
        return jnp.moveaxis(ys, 0, 1)


class RNNEncoder(fnn.Module):
    """BiLSTM encoder with variational dropout and layer selection
    (ref: text_encoder/rnn_encoder.py)."""

    hidden_size: int = 200
    num_layers: int = 2
    reproject_emb: int = 0
    reproject_out: int = 0
    mix: bool = False
    pre_shared_dropout: float = 0.0
    pre_dropout: float = 0.0
    post_shared_dropout: float = 0.0
    post_dropout: float = 0.0
    lstm_dropout: float = 0.33
    shared_dropout_flag: bool = True
    output_layers: int = -1  # -1: last layer; -2: concat/mix of all
    proj_size: int = 0
    init_version: str = "zy"
    cat_emb: bool = False
    cat_emb_size: int = 0  # embedding.embed_size, required when cat_emb

    def get_dim(self, field: str = "x") -> int:
        if self.output_layers == -2 and not self.mix:
            base = 2 * self.hidden_size * self.num_layers
        else:
            base = 2 * self.hidden_size
        if self.reproject_out:
            base = self.reproject_out
        if self.cat_emb:
            base += self.cat_emb_size
        return base

    @property
    def output_size(self):
        return self.get_dim("x")

    @fnn.compact
    def __call__(self, emb, mask, *, deterministic: bool = True):
        if self.proj_size:
            # the reference's own variational path asserts the same
            # (ref: rnn_encoder.py:80 'Not supported')
            raise NotImplementedError("proj_size > 0 is not supported")
        if self.cat_emb and not self.cat_emb_size:
            raise ValueError("cat_emb requires cat_emb_size "
                             "(= embedding.embed_size)")
        x = emb
        if self.reproject_emb:
            x = fnn.Dense(self.reproject_emb)(x)
        if not deterministic and self.pre_dropout > 0:
            x = fnn.Dropout(self.pre_dropout, deterministic=False)(x)
        if not deterministic and self.pre_shared_dropout > 0:
            x = shared_dropout(
                self.make_rng("dropout"), x, self.pre_shared_dropout, False
            )

        layer_outputs = []
        hidden_last = []
        for i in range(self.num_layers):
            fwd = _LSTMLayer(
                self.hidden_size, reverse=False,
                recurrent_dropout=self.lstm_dropout if self.shared_dropout_flag else 0.0,
                init_version=self.init_version,
                name=f"fwd_{i}",
            )(x, mask, deterministic=deterministic)
            bwd = _LSTMLayer(
                self.hidden_size, reverse=True,
                recurrent_dropout=self.lstm_dropout if self.shared_dropout_flag else 0.0,
                init_version=self.init_version,
                name=f"bwd_{i}",
            )(x, mask, deterministic=deterministic)
            x = jnp.concatenate([fwd, bwd], -1)
            if i + 1 < self.num_layers and self.lstm_dropout > 0 and not deterministic:
                x = shared_dropout(
                    self.make_rng("dropout"), x, self.lstm_dropout, False
                )
            layer_outputs.append(x)
            # final valid hidden state of each direction
            idx = jnp.maximum(mask.sum(-1).astype(jnp.int32) - 1, 0)
            h_fwd = jnp.take_along_axis(fwd, idx[:, None, None], axis=1)[:, 0]
            h_bwd = bwd[:, 0]
            hidden_last = [h_fwd, h_bwd]

        if self.output_layers == -2:
            if self.mix:
                out = ScalarMix(n_layers=self.num_layers)(
                    layer_outputs, deterministic=deterministic
                )
            else:
                out = jnp.concatenate(layer_outputs, -1)
        else:
            out = layer_outputs[self.output_layers]

        if not deterministic and self.post_dropout > 0:
            out = fnn.Dropout(self.post_dropout, deterministic=False)(out)
        if not deterministic and self.post_shared_dropout > 0:
            out = shared_dropout(
                self.make_rng("dropout"), out, self.post_shared_dropout, False
            )
        if self.reproject_out:
            out = fnn.Dense(self.reproject_out)(out)
        if self.cat_emb:
            # concat raw embeddings after projection (ref: rnn_encoder.py:180)
            out = jnp.concatenate([out, emb], -1)
        # 'hiddens' mirrors the reference's last-layer hx exposure used by
        # context_mode='hx' (ref: ldndmv.py:223-224)
        return {"x": out, "hiddens": jnp.stack(hidden_last)}


class MultiEncoder(fnn.Module):
    """Compose named sub-encoders with field mapping
    (ref: text_encoder/multi_encoder.py:8-78)."""

    encoders: Tuple[Tuple[str, Any], ...]  # (name, module) pairs
    mapping: Tuple[Tuple[str, Tuple[str, ...]], ...] = ()

    def get_dim(self, field: str = "x") -> int:
        for out_field, sources in self.mapping:
            if out_field == field:
                total = 0
                for src in sources:
                    enc_name, enc_field = src.split(".")
                    enc = dict(self.encoders)[enc_name]
                    total += enc.get_dim(enc_field)
                return total
        raise KeyError(field)

    @fnn.compact
    def __call__(self, emb, mask, *, deterministic: bool = True):
        outs = {}
        for name, enc in self.encoders:
            outs[name] = enc(emb, mask, deterministic=deterministic)
        result = {}
        for out_field, sources in self.mapping:
            parts = []
            for src in sources:
                enc_name, enc_field = src.split(".")
                parts.append(outs[enc_name][enc_field])
            result[out_field] = (
                jnp.concatenate(parts, -1) if len(parts) > 1 else parts[0]
            )
        return result
