"""Exact top-k by iterated argmax — a TPU-shaped replacement for
``jax.lax.top_k`` at small k over wide lanes.

XLA lowers ``lax.top_k`` on TPU to a (partial) sort of the full lane
axis; at the grounding decode's shape ([B=64, Q=101, V=703] f32,
ref decode: /root/reference/src/model/joint.py:506-629) that sort
measures 5.03 ms on v5e — 90% of the whole batched decode
(scripts/profile_ground_decode.py). k successive argmax+mask passes
compute the identical result in ~2k fused VPU passes over the tensor
(~0.2 ms at the same shape): top-k for tiny k is a reduction problem,
not a sorting problem.

Tie order matches ``lax.top_k`` exactly: XLA's TopK is stable (equal
values ordered by ascending index) and ``jnp.argmax`` returns the
first (lowest-index) maximum, so the i-th pass picks the i-th element
of a tie plateau in the same order the sort would.
"""

from __future__ import annotations

import jax.numpy as jnp


def exact_top_k(x, k: int):
    """Top-k values and indices over the last axis, == ``jax.lax.top_k``.

    Exact (no approximation) and bit-identical to ``lax.top_k`` in both
    values and tie ordering, for NaN-free floating inputs. Intended for
    small static k (the decode uses k=5); cost is k fused passes over
    ``x``.

    One razor edge: entries exactly equal to ``finfo(dtype).min`` tie
    with ``-inf`` entries in selection order (the working copy clamps
    at ``finfo.min`` so that ``-inf`` stays free as the mask value);
    returned VALUES are still the true ones, only the order within
    such a mixed {-inf, finfo.min} plateau can differ from lax.top_k.
    """
    if k <= 0:
        raise ValueError(f"exact_top_k needs k >= 1, got {k}")
    V = x.shape[-1]
    if k > V:
        raise ValueError(f"exact_top_k: k={k} > lane width {V}")
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(
            f"exact_top_k supports floating dtypes only, got {x.dtype}"
        )
    lanes = jnp.arange(V, dtype=jnp.int32)
    neg = jnp.asarray(-jnp.inf, x.dtype)
    # the selection copy is clamped to the finite minimum so masked-out
    # winners (set to -inf) sort strictly below every remaining entry,
    # including entries that were -inf in x itself
    w = jnp.maximum(x, jnp.asarray(jnp.finfo(x.dtype).min, x.dtype))
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(w, axis=-1).astype(jnp.int32)
        vals.append(
            jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0]
        )
        idxs.append(i)
        w = jnp.where(lanes == i[..., None], neg, w)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)
