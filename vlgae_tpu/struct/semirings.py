"""Semiring library for chart dynamic programs, TPU-native (JAX).

Re-designed from the semiring layer of the reference implementation
(ref: src/model/torch_struct/semirings/semirings.py) with the same
algebraic capabilities:

* ``LogSemiring``      -- (logsumexp, +): partition; grads give marginals.
* ``MaxSemiring``      -- (max, +): Viterbi; grads give argmax indicators.
* ``StdSemiring``      -- (+, *): counting.
* ``KMaxSemiring(k)``  -- top-k Viterbi (stacked k channel).
* ``EntropySemiring``  -- expectation semiring computing H[p].
* ``CrossEntropySemiring`` -- H[p, q] over paired potentials.
* ``KLDivergenceSemiring`` -- KL[p || q] over paired potentials.
* ``RiskSemiring``     -- expected cost E_p[cost].

Design notes (TPU-first):
  - A semiring is a *class* with pure static methods; chart fills are
    written once, generically, and specialise under ``jax.jit`` -- the
    semiring choice is static so XLA sees straight-line fused code.
  - Multi-channel ("expectation") semirings carry a leading stacked
    dimension of size ``cls.size`` exactly like the reference
    (ref: semirings.py:294-319), so a single chart layout serves all.
  - There is no genbmm/keops analogue: the batched span-merge itself is
    the Pallas kernel surface (see vlgae_tpu/ops/), not a matmul hook.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Matches the reference NEGINF convention (ref: semirings.py:16). The
# fp16 switch of the reference (src/__init__.py:110-120) is not needed:
# charts are always f32 on TPU; inputs may be bf16 and are upcast.
NEGINF = -1e12


def _stack_axis(axis: int) -> int:
    """Translate a per-channel axis to an axis in the stacked layout."""
    return axis + 1 if axis >= 0 else axis


class Semiring:
    """Base semiring. Values are stacked arrays ``[size, ...]``."""

    size: int = 1
    zero: float = NEGINF
    one: float = 0.0

    # -- conversion ------------------------------------------------------
    @classmethod
    def convert(cls, xs):
        """Lift raw potentials to the stacked representation."""
        return xs[None]

    @classmethod
    def unconvert(cls, xs):
        """Read the result channel out of the stacked representation."""
        return xs[0]

    # -- algebra ---------------------------------------------------------
    @classmethod
    def mul(cls, a, b):
        raise NotImplementedError

    @classmethod
    def sum(cls, xs, axis: int = -1):
        """Semiring-sum over *per-channel* ``axis`` of stacked ``xs``."""
        raise NotImplementedError

    @classmethod
    def prod(cls, xs, axis: int = -1):
        """Semiring product (= channelwise for log-like semirings)."""
        raise NotImplementedError

    @classmethod
    def times(cls, *xs):
        out = xs[0]
        for x in xs[1:]:
            out = cls.mul(out, x)
        return out

    # -- constants -------------------------------------------------------
    @classmethod
    def zeros(cls, shape, dtype=jnp.float32):
        """Stacked array of additive identities, shape excludes `size`."""
        return jnp.full((cls.size,) + tuple(shape), cls.zero, dtype)

    @classmethod
    def ones(cls, shape, dtype=jnp.float32):
        return jnp.full((cls.size,) + tuple(shape), cls.one, dtype)

    @classmethod
    def mask(cls, xs, keep):
        """Replace entries where ``keep`` is False by semiring zero.

        ``keep`` broadcasts against the per-channel view (no stacked dim).
        """
        return jnp.where(keep[None], xs, cls.zeros(xs.shape[1:], xs.dtype))


class _BaseLog(Semiring):
    zero = NEGINF
    one = 0.0

    @classmethod
    def mul(cls, a, b):
        return a + b

    @classmethod
    def prod(cls, xs, axis=-1):
        return jnp.sum(xs, axis=_stack_axis(axis))


class LogSemiring(_BaseLog):
    """(logsumexp, +, -inf, 0). Gradients of the total give marginals."""

    @classmethod
    def sum(cls, xs, axis=-1):
        return jax.nn.logsumexp(xs, axis=_stack_axis(axis))


class MaxSemiring(_BaseLog):
    """(max, +, -inf, 0). Gradients of the total give argmax indicators.

    Note: unlike torch.max (which routes the gradient to the first
    maximal element), jnp.max splits gradients equally among exact ties.
    With continuous potentials ties have measure zero.
    """

    @classmethod
    def sum(cls, xs, axis=-1):
        return jnp.max(xs, axis=_stack_axis(axis))


class StdSemiring(Semiring):
    """Counting semiring (+, *, 0, 1) (ref: semirings.py:151-170)."""

    zero = 0.0
    one = 1.0

    @classmethod
    def mul(cls, a, b):
        return a * b

    @classmethod
    def sum(cls, xs, axis=-1):
        return jnp.sum(xs, axis=_stack_axis(axis))

    @classmethod
    def prod(cls, xs, axis=-1):
        return jnp.prod(xs, axis=_stack_axis(axis))


def TempMaxSemiring(alpha: float):
    """Temperature-annealed max semiring (ref: semirings.py TempMax).

    ``sum = logsumexp(alpha * x) / alpha``: alpha -> inf recovers
    MaxSemiring, alpha = 1 recovers LogSemiring. Gradients of the total
    are the temperature-``alpha`` posterior over structures, useful for
    annealed (soft-to-hard) decoding.
    """

    class _TempMax(_BaseLog):
        @classmethod
        def sum(cls, xs, axis=-1):
            return jax.nn.logsumexp(alpha * xs, axis=_stack_axis(axis)) / alpha

    _TempMax.__name__ = f"TempMaxSemiring({alpha})"
    return _TempMax


def KMaxSemiring(k: int):
    """Top-k max semiring factory (ref: semirings.py:210-275).

    Values are stacked ``[k, ...]`` sorted descending; channel 0 is max.
    """

    class _KMax(_BaseLog):
        size = k

        @classmethod
        def convert(cls, xs):
            out = jnp.full((k,) + xs.shape, NEGINF, xs.dtype)
            return out.at[0].set(xs)

        @classmethod
        def unconvert(cls, xs):
            return xs[0]

        @classmethod
        def zeros(cls, shape, dtype=jnp.float32):
            return jnp.full((k,) + tuple(shape), NEGINF, dtype)

        @classmethod
        def ones(cls, shape, dtype=jnp.float32):
            out = jnp.full((k,) + tuple(shape), NEGINF, dtype)
            return out.at[0].set(0.0)

        @classmethod
        def mul(cls, a, b):
            # pairwise combine then take the k best (ref: semirings.py:265-273)
            c = a[:, None] + b[None, :]
            c = c.reshape((k * k,) + c.shape[2:])
            top = jax.lax.top_k(jnp.moveaxis(c, 0, -1), k)[0]
            return jnp.moveaxis(top, -1, 0)

        @classmethod
        def sum(cls, xs, axis=-1):
            # fold the reduced axis into the channel axis, keep top-k
            ax = _stack_axis(axis)
            xs = jnp.moveaxis(xs, ax, -1)  # [k, ..., m]
            xs = jnp.moveaxis(xs, 0, -2)  # [..., k, m]
            flat = xs.reshape(xs.shape[:-2] + (-1,))
            top = jax.lax.top_k(flat, k)[0]  # [..., k]
            return jnp.moveaxis(top, -1, 0)

    return _KMax


class EntropySemiring(Semiring):
    """Expectation semiring computing (logZ, H) (ref: semirings.py:424-488).

    Channel 0: log inside scores. Channel 1: running entropy term.
    """

    size = 2

    @classmethod
    def convert(cls, xs):
        return jnp.stack([xs, jnp.zeros_like(xs)])

    @classmethod
    def unconvert(cls, xs):
        return xs[1]

    @classmethod
    def zeros(cls, shape, dtype=jnp.float32):
        z = jnp.zeros((2,) + tuple(shape), dtype)
        return z.at[0].set(NEGINF)

    @classmethod
    def ones(cls, shape, dtype=jnp.float32):
        return jnp.zeros((2,) + tuple(shape), dtype)

    @classmethod
    def mul(cls, a, b):
        return a + b

    @classmethod
    def prod(cls, xs, axis=-1):
        return jnp.sum(xs, axis=_stack_axis(axis))

    @classmethod
    def sum(cls, xs, axis=-1):
        ax = axis  # per-channel view (no stack dim): non-negative axes
        # need no +1 shift and negative axes index from the end
        # either way, so the per-channel axis is just `axis`
        # (_stack_axis(axis)-1 mis-mapped axis=-1 to -2)
        part = jax.nn.logsumexp(xs[0], axis=ax)
        log_sm = xs[0] - jnp.expand_dims(part, ax)
        sm = jnp.exp(log_sm)
        ent = jnp.sum(xs[1] * sm - log_sm * sm, axis=ax)
        return jnp.stack([part, ent])

    @classmethod
    def mask(cls, xs, keep):
        z0 = jnp.where(keep, xs[0], NEGINF)
        z1 = jnp.where(keep, xs[1], 0.0)
        return jnp.stack([z0, z1])


class _PairedExpectation(Semiring):
    """Shared machinery for cross-entropy / KL semirings (size 3)."""

    size = 3

    @classmethod
    def convert(cls, xs):
        p, q = xs
        return jnp.stack([p, q, jnp.zeros_like(p)])

    @classmethod
    def unconvert(cls, xs):
        return xs[2]

    @classmethod
    def zeros(cls, shape, dtype=jnp.float32):
        z = jnp.zeros((3,) + tuple(shape), dtype)
        return z.at[0].set(NEGINF).at[1].set(NEGINF)

    @classmethod
    def ones(cls, shape, dtype=jnp.float32):
        return jnp.zeros((3,) + tuple(shape), dtype)

    @classmethod
    def mul(cls, a, b):
        return a + b

    @classmethod
    def prod(cls, xs, axis=-1):
        return jnp.sum(xs, axis=_stack_axis(axis))

    @classmethod
    def mask(cls, xs, keep):
        z0 = jnp.where(keep, xs[0], NEGINF)
        z1 = jnp.where(keep, xs[1], NEGINF)
        z2 = jnp.where(keep, xs[2], 0.0)
        return jnp.stack([z0, z1, z2])


class CrossEntropySemiring(_PairedExpectation):
    """Computes (logZp, logZq, H[p, q]) (ref: semirings.py:351-421)."""

    @classmethod
    def sum(cls, xs, axis=-1):
        ax = axis  # per-channel view, see EntropySemiring.sum
        part_p = jax.nn.logsumexp(xs[0], axis=ax)
        part_q = jax.nn.logsumexp(xs[1], axis=ax)
        log_sm_p = xs[0] - jnp.expand_dims(part_p, ax)
        log_sm_q = xs[1] - jnp.expand_dims(part_q, ax)
        sm_p = jnp.exp(log_sm_p)
        ce = jnp.sum(xs[2] * sm_p - log_sm_q * sm_p, axis=ax)
        return jnp.stack([part_p, part_q, ce])


class KLDivergenceSemiring(_PairedExpectation):
    """Computes (logZp, logZq, KL[p || q]) (ref: semirings.py:278-348)."""

    @classmethod
    def sum(cls, xs, axis=-1):
        ax = axis  # per-channel view, see EntropySemiring.sum
        part_p = jax.nn.logsumexp(xs[0], axis=ax)
        part_q = jax.nn.logsumexp(xs[1], axis=ax)
        log_sm_p = xs[0] - jnp.expand_dims(part_p, ax)
        log_sm_q = xs[1] - jnp.expand_dims(part_q, ax)
        sm_p = jnp.exp(log_sm_p)
        kl = jnp.sum(
            xs[2] * sm_p - log_sm_q * sm_p + log_sm_p * sm_p, axis=ax
        )
        return jnp.stack([part_p, part_q, kl])


class RiskSemiring(_PairedExpectation):
    """Computes expected cost E_p[cost] (ref: semirings.py:509-565).

    convert takes (log_potentials, cost).
    """

    @classmethod
    def zeros(cls, shape, dtype=jnp.float32):
        z = jnp.zeros((3,) + tuple(shape), dtype)
        return z.at[0].set(NEGINF)

    @classmethod
    def mask(cls, xs, keep):
        z0 = jnp.where(keep, xs[0], NEGINF)
        z1 = jnp.where(keep, xs[1], 0.0)
        z2 = jnp.where(keep, xs[2], 0.0)
        return jnp.stack([z0, z1, z2])

    @classmethod
    def sum(cls, xs, axis=-1):
        ax = axis  # per-channel view, see EntropySemiring.sum
        part_p = jax.nn.logsumexp(xs[0], axis=ax)
        log_sm_p = xs[0] - jnp.expand_dims(part_p, ax)
        sm_p = jnp.exp(log_sm_p)
        risk = jnp.sum((xs[1] + xs[2]) * sm_p, axis=ax)
        return jnp.stack([part_p, jnp.zeros_like(part_p), risk])
