"""Visual factor encoders.

Re-designed from the reference (ref: src/model/vis_encoder/box_rel.py):
project Faster-RCNN box features into box / relation (box-pair) /
attribute / whole-image factor embeddings.

TPU note: the reference materializes the [B, P, P, 2H] pairwise-mean
input before its relation MLP (ref: box_rel.py:42-43). Because that
input is a *linear* combination of the two box vectors, the MLP's
linear layer factorizes exactly: project each box once and sum the
pairwise projections before the activation -- algebraically identical,
~P/2 x less matmul work (the [B,P,P,2H] tensor never exists).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as fnn

from .nn import MLP, shared_dropout


class VisBoxRelSimpleEncoder(fnn.Module):
    """Box/rel/attr/img factor MLPs (ref: box_rel.py:8-56).

    Relations are all box *pairs*, embedded from the mean of the two box
    inputs; ``img_feat=True`` concatenates the mean image feature to
    every box input first.
    """

    n_hidden: int
    dropout: float = 0.0
    activate: bool = True
    use_attr: bool = True
    use_img: bool = False
    img_feat: bool = True
    n_in: int = 0  # config parity; inferred from inputs
    dtype: object = None  # bf16 MXU compute for the 2048-d projections

    def get_dim(self, field=None) -> int:
        return self.n_hidden

    @fnn.compact
    def __call__(self, x, *, deterministic: bool = True):
        feat = x["vis_box_feat"]  # [B, N, H]
        B, N, H = feat.shape
        if self.img_feat:
            mean_feat = jnp.broadcast_to(
                feat.mean(1, keepdims=True), feat.shape
            )
            inputs = jnp.concatenate([feat, mean_feat], -1)
        else:
            inputs = feat
        # factorized pairwise-mean relation MLP (see module docstring)
        rel_u = fnn.Dense(
            self.n_hidden,
            use_bias=False,
            kernel_init=fnn.initializers.orthogonal(),
            name="rel_fc",
            dtype=self.dtype,
        )(inputs).astype(jnp.float32)  # [B, N, h]
        rel_b = self.param(
            "rel_fc_bias", fnn.initializers.zeros_init(), (self.n_hidden,)
        )
        rel = (rel_u[:, :, None] + rel_u[:, None, :]) / 2 + rel_b
        if self.activate:
            rel = jax.nn.leaky_relu(rel)
        rel = rel.reshape(B, N * N, self.n_hidden)
        if self.dropout > 0 and not deterministic:
            rel = shared_dropout(
                self.make_rng("dropout"), rel, self.dropout, False
            )
        out = {
            "box": MLP(self.n_hidden, self.dropout, self.activate,
                       name="box_fc", dtype=self.dtype)(
                inputs, deterministic=deterministic),
            "rel": rel,
        }
        if self.use_attr:
            out["attr"] = MLP(self.n_hidden, self.dropout, self.activate,
                              name="attr_fc", dtype=self.dtype)(
                inputs, deterministic=deterministic)
        if self.use_img:
            out["img"] = MLP(self.n_hidden, self.dropout, self.activate,
                             name="img_fc", dtype=self.dtype)(
                feat.mean(1, keepdims=True), deterministic=deterministic
            )
        return out
