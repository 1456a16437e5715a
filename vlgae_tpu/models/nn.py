"""Neural building blocks (flax.linen), TPU-native.

Re-designed equivalents of the reference's nn library
(ref: src/model/nn/): MLP with orthogonal init + shared dropout,
ResLayer, Biaffine scorer, ScalarMix, shared/independent dropout, the
DMV scorer stack (skip-connect valence/direction encoder + factorized
bilinear), and the diagonal-Gaussian KL.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as fnn


def shared_dropout(rng, x, p: float, deterministic: bool):
    """Dropout mask shared across the sequence dim (ref: dropout.py:5-65)."""
    if deterministic or p == 0:
        return x
    mask_shape = (x.shape[0], 1) + x.shape[2:]
    keep = jax.random.bernoulli(rng, 1 - p, mask_shape)
    return x * keep / (1 - p)


def independent_dropout(rng, items, p: float, deterministic: bool):
    """Mutually-compensating dropout across embedding items
    (ref: dropout.py:68-112)."""
    if deterministic or p == 0 or not items:
        return list(items)
    keys = jax.random.split(rng, len(items))
    masks = [
        jax.random.bernoulli(k, 1 - p, x.shape[:2]).astype(x.dtype)
        for k, x in zip(keys, items)
    ]
    total = sum(masks)
    scale = len(items) / jnp.maximum(total, 1.0)
    return [x * (m * scale)[..., None] for x, m in zip(items, masks)]


class MLP(fnn.Module):
    """Linear -> LeakyReLU -> SharedDropout (ref: common.py:23-51).

    ``dtype=bfloat16`` runs the matmul on the MXU in bf16 (params stay
    f32); outputs are cast back to f32.
    """

    n_hidden: int
    dropout: float = 0.0
    activate: bool = True
    n_in: Optional[int] = None  # accepted for config parity; inferred
    dtype: Optional[Any] = None

    @property
    def n_out(self):
        return self.n_hidden

    @fnn.compact
    def __call__(self, x, *, deterministic: bool = True):
        x = fnn.Dense(
            self.n_hidden,
            kernel_init=fnn.initializers.orthogonal(),
            bias_init=fnn.initializers.zeros_init(),
            dtype=self.dtype,
        )(x)
        if self.dtype is not None:
            x = x.astype(jnp.float32)
        if self.activate:
            x = fnn.leaky_relu(x) if hasattr(fnn, "leaky_relu") else jax.nn.leaky_relu(x)
        if self.dropout > 0 and not deterministic:
            rng = self.make_rng("dropout")
            x = shared_dropout(rng, x, self.dropout, deterministic)
        return x


class ResLayer(fnn.Module):
    """Residual 2-layer ReLU block (ref: common.py:7-20)."""

    n_hidden: int
    activate: bool = True

    @fnn.compact
    def __call__(self, x):
        h = fnn.Dense(self.n_hidden)(x)
        h = jax.nn.relu(h)
        h = fnn.Dense(self.n_hidden)(h)
        h = jax.nn.relu(h)
        if self.activate:
            h = jax.nn.leaky_relu(h)
        return h + x


class Biaffine(fnn.Module):
    """Dozat biaffine arc scorer (ref: affine.py:7-72)."""

    n_out: int = 1
    bias_x: bool = True
    bias_y: bool = True

    @fnn.compact
    def __call__(self, x, y):
        if self.bias_x:
            x = jnp.concatenate([x, jnp.ones_like(x[..., :1])], -1)
        if self.bias_y:
            y = jnp.concatenate([y, jnp.ones_like(y[..., :1])], -1)
        w = self.param(
            "weight",
            fnn.initializers.zeros_init(),
            (self.n_out, x.shape[-1], y.shape[-1]),
        )
        s = jnp.einsum("bxi,oij,byj->boxy", x, w, y)
        return s[:, 0] if self.n_out == 1 else s


class BiaffineScorer(fnn.Module):
    """MLP-projected biaffine scorer with 1/sqrt(sqrt(h)) scaling
    (ref: affine_scorer.py:11-35).

    Splits the input rep in half, projects each half through its own
    MLP, rescales both by ``hidden_dim ** -0.25`` (so the biaffine
    product is ~unit variance), and returns arc/label scores laid out
    ``[B, x, y, out]``.
    """

    hidden_dim: int
    out_dim: int = 1
    mlp_dropout: float = 0.0
    mlp_activate: bool = True
    scale: bool = True

    @property
    def n_out(self):
        return self.out_dim

    @fnn.compact
    def __call__(self, x, x2, *, deterministic: bool = True):
        h1 = MLP(self.hidden_dim, self.mlp_dropout, self.mlp_activate,
                 name="mlp1")(x, deterministic=deterministic)
        h2 = MLP(self.hidden_dim, self.mlp_dropout, self.mlp_activate,
                 name="mlp2")(x2, deterministic=deterministic)
        if self.scale:
            s = self.hidden_dim ** -0.25
            h1, h2 = h1 * s, h2 * s
        out = Biaffine(self.out_dim, bias_x=True,
                       bias_y=self.out_dim > 1, name="affine")(h1, h2)
        if self.out_dim == 1:
            return out[..., None]  # [B, x, y, 1]
        return jnp.moveaxis(out, 1, -1)  # [B, x, y, out]


class ScalarMix(fnn.Module):
    """Softmax-weighted layer mixture with gamma (ref: scalar_mix.py:5-50)."""

    n_layers: int
    dropout: float = 0.0

    @fnn.compact
    def __call__(self, tensors, *, deterministic: bool = True):
        w = self.param("weights", fnn.initializers.zeros_init(), (self.n_layers,))
        gamma = self.param("gamma", fnn.initializers.ones_init(), (1,))
        nw = jax.nn.softmax(w)
        if self.dropout > 0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1 - self.dropout, nw.shape)
            nw = jnp.where(keep, nw / (1 - self.dropout), 0.0)
        out = sum(wi * t for wi, t in zip(nw, tensors))
        return gamma * out


class DMVSkipConnectEncoder(fnn.Module):
    """Expand token reps to [..., dir, val, hidden] with skip connections
    (ref: dmv_spec.py:6-56)."""

    hidden_size: int
    n_bottleneck: int = 0
    n_mid: int = 0
    dropout: float = 0.0

    @property
    def n_out(self):
        return self.hidden_size

    def _maybe_bottleneck(self, name):
        if self.n_bottleneck == 0:
            return fnn.Dense(self.hidden_size, name=name)
        return fnn.Sequential([
            fnn.Dense(self.n_bottleneck, name=f"{name}_down"),
            fnn.Dense(self.hidden_size, name=f"{name}_up"),
        ])

    @fnn.compact
    def __call__(self, x, *, deterministic: bool = True):
        act = jax.nn.leaky_relu
        has_child = self._maybe_bottleneck("HASCHILD")(x) + x
        no_child = self._maybe_bottleneck("NOCHILD")(x) + x
        # valence axis order matches HASCHILD=0, NOCHILD=1 (ref: dmv_spec.py:42
        # stacks [no_child, has_child] -- NOTE the reference stacks NOCHILD
        # first, giving NOCHILD index 0 in the *rule* table; the rule tables
        # are then gathered/softmaxed identically, so only consistency with
        # the DP constants matters: we stack [HASCHILD, NOCHILD] to match
        # vlgae_tpu.struct.dmv (HASCHILD=0, NOCHILD=1)).
        h = jnp.stack([has_child, no_child], axis=-2)
        h = act(fnn.Dense(self.hidden_size, name="valence")(act(h)))

        x_ = x[..., None, :]
        left = self._maybe_bottleneck("LEFT")(h) + x_
        right = self._maybe_bottleneck("RIGHT")(h) + x_
        h = jnp.stack([left, right], axis=-3)  # LEFT=0, RIGHT=1
        h = act(fnn.Dense(self.hidden_size, name="direction")(act(h)))

        if self.dropout > 0 and not deterministic:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1 - self.dropout, h.shape)
            h = h * keep / (1 - self.dropout)
        n_mid = self.n_mid if self.n_mid else self.hidden_size
        h = fnn.Dense(n_mid, name="mid1")(h)
        return fnn.Dense(self.hidden_size, name="mid2")(act(h))


class DMVFactorizedBilinear(fnn.Module):
    """Low-rank bilinear scorer (ref: dmv_spec.py:59-76).

    ``tokens_last=True`` emits the scored-states axis LAST
    ([b, h, d, v, c] instead of [b, h, c, d, v]): downstream softmax /
    gather over the big token-state axis then run on the lane dimension
    — a middle-axis softmax over [b, n, 500, 2, 2] made XLA stage two
    full layout-change copies per step (~40% of the measured text-only
    train step).
    """

    r: int = 64

    @fnn.compact
    def __call__(self, x1, x2, tokens_last: bool = False):
        x1 = fnn.Dense(self.r, name="project1")(x1)
        x2 = fnn.Dense(self.r, name="project2")(x2)
        if x1.ndim == 5:
            spec = "bhdve,bcdve->bhdvc" if tokens_last else \
                "bhdve,bcdve->bhcdv"
            return jnp.einsum(spec, x1, x2)
        if x1.ndim == 4:
            spec = "hdve,cdve->hdvc" if tokens_last else "hdve,cdve->hcdv"
            return jnp.einsum(spec, x1, x2)
        raise NotImplementedError


def multivariate_kl(mean_q, mean_p, lvar_q, lvar_p, reduction="sum"):
    """KL(q || p) between diagonal Gaussians (ref: multivariate_kl.py:4-44)."""
    mean_q = mean_q.astype(jnp.float64) if jax.config.jax_enable_x64 else mean_q
    var_q = jnp.exp(lvar_q)
    var_p = jnp.exp(lvar_p)
    kl = 0.5 * (
        jnp.sum(lvar_p - lvar_q, -1)
        + jnp.sum(var_q / var_p, -1)
        + jnp.sum((mean_p - mean_q) ** 2 / var_p, -1)
        - mean_q.shape[-1]
    )
    if reduction == "sum":
        return kl.sum()
    if reduction == "mean":
        return kl.mean()
    return kl
