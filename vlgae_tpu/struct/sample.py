"""Sampling and sparsemax semirings (custom-VJP based).

Re-designed from the reference (ref: src/model/torch_struct/semirings/
sample.py, sparse_max.py): the "gradient" of a sampled/relaxed sum
routes mass through a sampled child, so grads of the chart total give
exact forward-filter backward-sample trees, straight-through Gumbel
relaxations, or sparsemax marginals.

JAX purity note: the reference draws from the global torch RNG inside
backward; here each semiring instance is seeded by a PRNG key, and each
sum *call site* folds in a trace-time counter so every chart reduction
gets an independent stream (deterministic given the key).
"""

from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from .semirings import NEGINF, _BaseLog, _stack_axis

_f0 = jax.dtypes.float0


def _key_ct(key):
    return np.zeros(key.shape, dtype=_f0)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sampled_logsumexp(x, key, axis):
    return jax.nn.logsumexp(x, axis=axis)


def _sampled_fwd(x, key, axis):
    return jax.nn.logsumexp(x, axis=axis), (x, key)


def _sampled_bwd(axis, res, g):
    x, key = res
    # sample one child per reduced slot (ref: sample.py:14-32)
    moved = jnp.moveaxis(x, axis, -1)
    idx = jax.random.categorical(key, moved, axis=-1)
    onehot = jax.nn.one_hot(idx, moved.shape[-1], dtype=x.dtype)
    s = jnp.moveaxis(onehot, -1, axis)
    return jnp.expand_dims(g, axis) * s, _key_ct(key)


_sampled_logsumexp.defvjp(_sampled_fwd, _sampled_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _gumbel_logsumexp(x, key, axis, temp):
    return jax.nn.logsumexp(x, axis=axis)


def _gumbel_fwd(x, key, axis, temp):
    return jax.nn.logsumexp(x, axis=axis), (x, key)


def _gumbel_bwd(axis, temp, res, g):
    x, key = res
    moved = jnp.moveaxis(x, axis, -1)
    gumbel = jax.random.gumbel(key, moved.shape, dtype=x.dtype)
    update = (moved + gumbel) / temp
    hard = jax.nn.one_hot(
        jnp.argmax(update, -1), moved.shape[-1], dtype=x.dtype
    )
    soft = jax.nn.softmax(update, -1)
    st = soft + jax.lax.stop_gradient(hard - soft)  # straight-through
    s = jnp.moveaxis(st, -1, axis)
    return jnp.expand_dims(g, axis) * s, _key_ct(key)


_gumbel_logsumexp.defvjp(_gumbel_fwd, _gumbel_bwd)


def SampledSemiring(key):
    """FFBS semiring: grads of the total give one exact sample
    (ref: sample.py:36-47)."""
    counter = itertools.count()

    class _Sampled(_BaseLog):
        @classmethod
        def sum(cls, xs, axis=-1):
            site = next(counter)
            k = jax.random.fold_in(key, site)
            return _sampled_logsumexp(xs, k, _stack_axis(axis))

    return _Sampled


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _multi_sampled_logsumexp(x, key, axis, k):
    return jax.nn.logsumexp(x, axis=axis)


def _multi_fwd(x, key, axis, k):
    return jax.nn.logsumexp(x, axis=axis), (x, key)


def _multi_bwd(axis, k, res, g):
    """Route k bit-packed sample masses (ref: sample.py:102-141).

    The cotangent ``g`` carries an integer bitmask per cell (sample i
    passes through the cell iff bit i is set; exactly representable in
    f32 for k <= 16). Each set bit draws an independent categorical
    child and forwards its bit there — so ONE backward pass yields k
    forward-filter backward-samples.
    """
    x, key = res
    moved = jnp.moveaxis(x, axis, -1)  # [..., n]
    n = moved.shape[-1]
    # inverse-CDF draws: ONE softmax/cumsum per cell + k cheap uniforms
    # (k gumbel fields per cell would cost ~k inside passes in RNG bits)
    cdf = jnp.cumsum(jax.nn.softmax(moved, axis=-1), axis=-1)
    u = jax.random.uniform(
        key, (k,) + moved.shape[:-1], dtype=x.dtype
    )  # [k, ...]
    idx = jnp.sum(
        u[..., None] > cdf[None], axis=-1
    ).clip(0, n - 1)  # [k, ...]
    onehot = (
        jnp.arange(n, dtype=idx.dtype) == idx[..., None]
    )  # [k, ..., n] bool
    gi = jnp.round(g).astype(jnp.uint32)
    shifts = jnp.arange(k, dtype=jnp.uint32).reshape((k,) + (1,) * g.ndim)
    gbits = (gi[None] >> shifts) & jnp.uint32(1)  # [k, ...]
    weights = gbits.astype(x.dtype) * (2.0 ** np.arange(k)).reshape(
        (k,) + (1,) * g.ndim
    ).astype(x.dtype)
    out = jnp.where(onehot, weights[..., None], 0.0).sum(0)  # [..., n]
    return jnp.moveaxis(out, -1, axis), _key_ct(key)


_multi_sampled_logsumexp.defvjp(_multi_fwd, _multi_bwd)


def MultiSampledSemiring(key, k: int = 16):
    """k samples per single backward via bit packing
    (ref: sample.py:102-160). k <= 16 keeps the packed mass exactly
    representable in float32 (< 2^24)."""
    assert 1 <= k <= 16, "bit packing supports at most 16 samples"
    counter = itertools.count()

    class _Multi(_BaseLog):
        @classmethod
        def sum(cls, xs, axis=-1):
            site = next(counter)
            kk = jax.random.fold_in(key, site)
            return _multi_sampled_logsumexp(xs, kk, _stack_axis(axis), k)

    return _Multi


def multi_sample_grads(inside_total_fn, potentials, key, num_samples: int):
    """k exact FFBS samples for ~ceil(k/16) inside passes.

    ``inside_total_fn(potentials, semiring) -> [B] totals``. Returns
    sample indicator tensors ``[num_samples, *potentials.shape]``:
    one vjp with a bit-packed cotangent per chunk of 16 samples.
    """
    chunks = []
    left = num_samples
    i = 0
    while left > 0:
        k = min(16, left)
        S = MultiSampledSemiring(jax.random.fold_in(key, i), k)
        val, vjp = jax.vjp(lambda p: inside_total_fn(p, S), potentials)
        (packed,) = vjp(jnp.full(val.shape, float(2 ** k - 1), val.dtype))
        gi = jnp.round(packed).astype(jnp.uint32)
        shifts = jnp.arange(k, dtype=jnp.uint32).reshape(
            (k,) + (1,) * packed.ndim
        )
        chunks.append(((gi[None] >> shifts) & jnp.uint32(1)).astype(
            jnp.float32
        ))
        left -= k
        i += 1
    return jnp.concatenate(chunks, axis=0)


def GumbelCRFSemiring(key, temp: float = 1.0):
    """Straight-through Gumbel-CRF semiring (ref: sample.py:50-99)."""
    counter = itertools.count()

    class _Gumbel(_BaseLog):
        @classmethod
        def sum(cls, xs, axis=-1):
            site = next(counter)
            k = jax.random.fold_in(key, site)
            return _gumbel_logsumexp(xs, k, _stack_axis(axis), temp)

    return _Gumbel


# -- sparsemax ---------------------------------------------------------------


def project_simplex(v, axis: int = -1, z: float = 1.0):
    """Euclidean projection onto the simplex (ref: sparse_max.py:57-65)."""
    v_sorted = jnp.sort(v, axis=axis)[
        tuple(
            slice(None, None, -1) if i == (axis % v.ndim) else slice(None)
            for i in range(v.ndim)
        )
    ]
    cssv = jnp.cumsum(v_sorted, axis=axis) - z
    n = v.shape[axis]
    shape = [1] * v.ndim
    shape[axis] = n
    ind = jnp.arange(1, n + 1, dtype=v.dtype).reshape(shape)
    cond = (v_sorted - cssv / ind) >= 0
    k = jnp.sum(cond, axis=axis, keepdims=True)
    tau = jnp.take_along_axis(cssv, k - 1, axis=axis) / k.astype(v.dtype)
    return jnp.clip(v - tau, 0, None)


def sparsemax_grad(dout, w_star, axis: int):
    """(ref: sparse_max.py:68-75)"""
    supp = w_star > 0
    out = jnp.where(supp, dout, 0.0)
    nnz = jnp.maximum(supp.astype(dout.dtype).sum(axis, keepdims=True), 1.0)
    out = out - out.sum(axis, keepdims=True) / nnz
    return jnp.where(supp, out, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _simplex_project_sum(x, axis):
    w = project_simplex(x, axis)
    return (x * w).sum(axis) - jnp.linalg.norm(w, axis=axis)


def _sp_fwd(x, axis):
    w = project_simplex(x, axis)
    val = (x * w).sum(axis) - jnp.linalg.norm(w, axis=axis)
    return val, w


def _sp_bwd(axis, w, g):
    # first-order grad is w*; second-order handled by sparsemax_grad on
    # the incoming cotangent (ref: sparse_max.py:22-53)
    return (jnp.expand_dims(g, axis) * w,)


_simplex_project_sum.defvjp(_sp_fwd, _sp_bwd)


class SparseMaxSemiring(_BaseLog):
    """Differentiable sparsemax DP (ref: sparse_max.py:6-20)."""

    @classmethod
    def sum(cls, xs, axis=-1):
        return _simplex_project_sum(xs, _stack_axis(axis))
