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

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
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
    def __call__(self, x, *, deterministic: bool = True,
                 rel_pairs=None):
        """``rel_pairs``: optional static ``(i_idx, j_idx)`` arrays — the
        relation group is then emitted only for those box pairs
        ([B, K, h] instead of the full [B, N*N, h]): rel(i,j)==rel(j,i)
        exactly (pairwise mean), so the training path requests the
        upper triangle and skips ~half of the largest tensor family in
        its graph. The compact rows are produced by a GEMM with a
        static 0.5/0.5 incidence matrix, so the backward is the
        transposed GEMM (MXU) instead of a scatter-add."""
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
        if rel_pairs is not None:
            ti, tj = (np.asarray(p) for p in rel_pairs)
            K = ti.shape[0]
            inc = np.zeros((K, N), np.float32)
            inc[np.arange(K), ti] += 0.5
            inc[np.arange(K), tj] += 0.5
            rel = jnp.einsum("bnh,kn->bkh", rel_u, jnp.asarray(inc)) \
                + rel_b
        else:
            rel = (rel_u[:, :, None] + rel_u[:, None, :]) / 2 + rel_b
            rel = rel.reshape(B, N * N, self.n_hidden)
        if self.activate:
            rel = jax.nn.leaky_relu(rel)
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


class VisViTPatchEncoder(fnn.Module):
    """ViT/CLIP-style patch-grid visual encoder (the "CLIP/ViT swap"
    stretch configuration).

    Instead of Faster-RCNN region features, raw pixels are encoded by a
    (by default frozen) ViT; every patch becomes a visual "box" factor
    whose geometry is its patch rectangle (:func:`patch_boxes`), so the
    whole grounding stack downstream — relations as patch pairs,
    attributes, matching, IoU decode — applies unchanged. Expects
    ``x["vis_pixels"]`` as ``[B, H, W, 3]`` floats (NHWC, the flax ViT
    convention).
    """

    n_hidden: int
    vit_config: Any = None  # transformers.ViTConfig
    requires_grad: bool = False
    dropout: float = 0.0
    activate: bool = True
    use_attr: bool = True
    use_img: bool = False
    img_feat: bool = True
    dtype: object = None

    def get_dim(self, field=None) -> int:
        return self.n_hidden

    @property
    def n_patches(self) -> int:
        g = self.vit_config.image_size // self.vit_config.patch_size
        return g * g

    def setup(self):
        from transformers.models.vit.modeling_flax_vit import FlaxViTModule

        self.vit = FlaxViTModule(self.vit_config, dtype=jnp.float32,
                                 add_pooling_layer=False)
        self.head = VisBoxRelSimpleEncoder(
            n_hidden=self.n_hidden, dropout=self.dropout,
            activate=self.activate, use_attr=self.use_attr,
            use_img=self.use_img, img_feat=self.img_feat, dtype=self.dtype,
            name="head",
        )

    def __call__(self, x, *, deterministic: bool = True,
                 rel_pairs=None):
        hidden = self.vit(
            pixel_values=x["vis_pixels"], deterministic=True
        ).last_hidden_state[:, 1:]  # drop CLS -> [B, n_patches, D]
        if not self.requires_grad:
            hidden = jax.lax.stop_gradient(hidden)
        return self.head({"vis_box_feat": hidden},
                         deterministic=deterministic,
                         rel_pairs=rel_pairs)


def load_vit_params(path: str, vit_config) -> dict:
    """Load pretrained ViT backbone weights for :class:`VisViTPatchEncoder`
    (the "CLIP/ViT swap", BASELINE config #5; config key
    ``vis_encoder.vit_weights``).

    Accepted formats:

    - a HF checkpoint **directory** (``config.json`` +
      ``flax_model.msgpack`` / ``model.safetensors`` / torch
      ``pytorch_model.bin`` — transformers handles the conversion,
      torch-cpu is available);
    - a flax **msgpack** file (``flax.serialization.msgpack_restore``)
      holding the ``FlaxViTModule`` param tree, optionally wrapped in
      ``{'params': ...}``;
    - an **npz** file with '/'-joined flattened param paths.

    The tree is validated against the module's own ``jax.eval_shape``
    init: every parameter the encoder expects must be present with the
    exact shape — missing or mismatched entries raise a ``ValueError``
    naming the offending paths (extra entries, e.g. a pooler head, are
    ignored). Returns the validated subtree ready for
    :func:`graft_vit_params`.
    """
    import os

    from flax import serialization, traverse_util
    from transformers.models.vit.modeling_flax_vit import FlaxViTModule

    if os.path.isdir(path):
        from transformers import FlaxViTModel, ViTConfig

        disk_cfg = ViTConfig.from_pretrained(path)
        for key in ("hidden_size", "num_hidden_layers",
                    "num_attention_heads", "intermediate_size",
                    "image_size", "patch_size"):
            want, got = getattr(vit_config, key), getattr(disk_cfg, key)
            if want != got:
                raise ValueError(
                    f"vit_weights checkpoint at {path} has {key}={got} "
                    f"but the recipe's vis_encoder expects {key}={want};"
                    " align vis_encoder.vit_* with the checkpoint"
                )
        try:
            hf = FlaxViTModel.from_pretrained(path)
        except (OSError, EnvironmentError):
            hf = FlaxViTModel.from_pretrained(path, from_pt=True)
        tree = jax.tree.map(np.asarray, dict(hf.params))
    elif path.endswith(".npz"):
        with np.load(path) as z:
            flat = {tuple(k.split("/")): z[k] for k in z.files}
        tree = traverse_util.unflatten_dict(flat)
    else:
        with open(path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
    if isinstance(tree, dict) and set(tree) == {"params"}:
        tree = tree["params"]

    module = FlaxViTModule(vit_config, dtype=jnp.float32,
                           add_pooling_layer=False)
    pixels = jax.ShapeDtypeStruct(
        (1, vit_config.image_size, vit_config.image_size, 3), jnp.float32
    )
    want = jax.eval_shape(
        lambda px: module.init(jax.random.key(0), pixel_values=px), pixels
    )["params"]
    want_flat = traverse_util.flatten_dict(want)
    have_flat = traverse_util.flatten_dict(tree)
    missing = [k for k in want_flat if k not in have_flat]
    bad = [
        (k, tuple(np.shape(have_flat[k])), tuple(want_flat[k].shape))
        for k in want_flat
        if k in have_flat and tuple(np.shape(have_flat[k]))
        != tuple(want_flat[k].shape)
    ]
    if missing or bad:
        msgs = ["/".join(map(str, k)) + " MISSING" for k in missing[:8]]
        msgs += [
            "/".join(map(str, k)) + f" has shape {h}, expected {w}"
            for k, h, w in bad[:8]
        ]
        raise ValueError(
            f"vit_weights at {path} do not match the ViT the recipe "
            "builds: " + "; ".join(msgs)
        )
    cast = {
        k: np.asarray(have_flat[k], want_flat[k].dtype)
        for k in want_flat
    }
    return traverse_util.unflatten_dict(cast)


def graft_vit_params(params, vit_tree, scope=("params", "vis_encoder",
                                              "vit")):
    """Return ``params`` with the ViT backbone subtree replaced by the
    pretrained ``vit_tree`` (from :func:`load_vit_params`). ``scope`` is
    the flax path of the backbone inside the full model's variables
    (``DependencyBoxRel.vis_encoder`` → ``VisViTPatchEncoder.vit``)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    prefix = tuple(scope)
    if not any(k[: len(prefix)] == prefix for k in flat):
        raise ValueError(
            f"no parameters under {'/'.join(prefix)}: vit_weights was "
            "set but the model has no ViT backbone there (is the "
            "vis_encoder a VisViTPatchEncoder?)"
        )
    kept = {k: v for k, v in flat.items() if k[: len(prefix)] != prefix}
    for k, v in traverse_util.flatten_dict(vit_tree).items():
        kept[prefix + k] = jnp.asarray(v)
    return traverse_util.unflatten_dict(kept)


def patch_boxes(image_size: int, patch_size: int) -> np.ndarray:
    """[n_patches, 4] (x1, y1, x2, y2) rectangles of a ViT patch grid, in
    row-major patch order (matching the ViT sequence order); use these as
    the proposal boxes for IoU-based grounding evaluation."""
    g = image_size // patch_size
    return np.array(
        [
            [c * patch_size, r * patch_size,
             (c + 1) * patch_size, (r + 1) * patch_size]
            for r in range(g)
            for c in range(g)
        ],
        dtype=np.float64,
    )
