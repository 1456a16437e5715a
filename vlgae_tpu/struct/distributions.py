"""Structured distributions over dependency trees, TPU-native.

Re-designed from the reference distribution wrappers
(ref: src/model/torch_struct/distributions.py). In JAX, marginals and
argmax come from ``jax.grad`` of the (semiring) partition -- exactly the
gradient identities the reference relies on via autograd
(ref: helpers.py:118-157) -- so there is no Python backtracking anywhere.

Unlike the reference's lazy torch ``Distribution`` objects, these are
lightweight pytree-friendly wrappers whose methods are pure functions of
the potentials; everything composes with ``jax.jit`` / ``jax.grad``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import deptree as _deptree
from . import dmv as _dmv
from .dmv import HASCHILD, NOCHILD, RIGHT
from .semirings import (
    NEGINF,
    CrossEntropySemiring,
    EntropySemiring,
    KLDivergenceSemiring,
    KMaxSemiring,
    LogSemiring,
    MaxSemiring,
    RiskSemiring,
    StdSemiring,
)


def dmv_merge(dec, attach, root, one: float = 0.0, zero: float = NEGINF):
    """Fold root potentials into position 0 (ref: distributions.py:253-265).

    The root token becomes the first token: it attaches exactly one child
    rightward with valence NOCHILD (score = ``root``), and its own
    decisions are free.

    Args:
      dec: ``[B, N, 2, 2, 2]`` per-word decision log-potentials.
      attach: ``[B, N, N, 2]`` head x child x valence attach log-potentials.
      root: ``[B, N]`` root-attachment log-potentials.

    Returns:
      ``(dec_wroot [B, N+1, 2, 2, 2], attach_wroot [B, N+1, N+1, 2])``.
    """
    B, N = dec.shape[:2]
    dt = dec.dtype
    attach_w = jnp.full((B, N + 1, N + 1, 2), zero, dt)
    attach_w = attach_w.at[:, 0, 1:, NOCHILD].set(root.astype(dt))
    attach_w = attach_w.at[:, 1:, 1:, :].set(attach.astype(dt))
    dec_w = jnp.full((B, N + 1, 2, 2, 2), zero, dt)
    dec_w = dec_w.at[:, 0, RIGHT, :, :].set(one)
    dec_w = dec_w.at[:, 1:].set(dec)
    return dec_w, attach_w


def dmv_total_fast(dec, attach, lengths, kind: str = "log"):
    """Backend-dispatched DMV semiring total.

    Uses the Pallas TPU kernels (vlgae_tpu.ops) when running on a real
    TPU backend -- including their hand-written outside-pass backward --
    and the pure-JAX scan elsewhere. Both paths are custom-vjp/grad
    compatible, so ``jax.grad`` of this function yields marginals (log)
    or argmax indicators (max) either way.
    """
    from ..ops import dmv_max_pallas, dmv_partition_pallas, pallas_available
    from ..ops.dmv_pallas import backward_fits_vmem

    if pallas_available() and backward_fits_vmem(attach.shape[1]):
        fn = dmv_partition_pallas if kind == "log" else dmv_max_pallas
        return fn(dec, attach, lengths)
    sr = LogSemiring if kind == "log" else MaxSemiring
    return _dmv.dmv_partition(dec, attach, lengths, sr)


def dmv_grads_fast(dec, attach, lengths, kind: str = "log"):
    """d(total)/d(dec, attach) via the dispatched backend."""

    def total(d, a):
        return jnp.sum(dmv_total_fast(d, a, lengths, kind))

    return jax.grad(total, argnums=(0, 1))(dec, attach)


def dmv_value_and_grads_fast(dec, attach, lengths, kind: str = "log"):
    """Per-sentence totals AND both grad tables from ONE fused pass.

    Returns ``(per_sentence [B], d/d dec, d/d attach)``. The fused TPU
    kernel computes the forward chart and both adjoint tables in a
    single launch, so asking for the value alongside the grads costs
    nothing extra — callers that need totals and marginals/indicators
    of the SAME potentials (e.g. the joint model's loss + language
    factors, ref: src/model/joint.py:251-258 + src/model/ldndmv.py:277-281)
    should use this once instead of two separate DP calls."""

    def total(d, a):
        per = dmv_total_fast(d, a, lengths, kind)
        return jnp.sum(per), per

    (_, per), (gd, ga) = jax.value_and_grad(
        total, argnums=(0, 1), has_aux=True
    )(dec, attach)
    return per, gd, ga


class DMV1o:
    """First-order valence DMV distribution (ref: distributions.py:245-265).

    ``log_potentials`` is the pair ``(dec, attach)`` in merged (with-root)
    form; see :func:`dmv_merge`.
    """

    def __init__(self, log_potentials, lengths):
        self.dec, self.attach = log_potentials
        self.lengths = lengths

    # -- totals ------------------------------------------------------------
    @property
    def partition(self):
        return dmv_total_fast(self.dec, self.attach, self.lengths, "log")

    @property
    def max(self):
        return dmv_total_fast(self.dec, self.attach, self.lengths, "max")

    @property
    def entropy(self):
        return _dmv.dmv_partition(
            self.dec, self.attach, self.lengths, EntropySemiring
        )

    def cross_entropy(self, other: "DMV1o"):
        return _dmv.dmv_partition(
            [self.dec, other.dec],
            [self.attach, other.attach],
            self.lengths,
            CrossEntropySemiring,
        )

    def kl(self, other: "DMV1o"):
        return _dmv.dmv_partition(
            [self.dec, other.dec],
            [self.attach, other.attach],
            self.lengths,
            KLDivergenceSemiring,
        )

    @property
    def count(self):
        ones_d = jnp.where(self.dec <= NEGINF / 2, 0.0, 1.0)
        ones_a = jnp.where(self.attach <= NEGINF / 2, 0.0, 1.0)
        return _dmv.dmv_partition(ones_d, ones_a, self.lengths, StdSemiring)

    def kmax(self, k: int):
        """Scores of the k best trees, ``[k, B]`` (ref: distributions.py:135-144)."""
        value, _ = _dmv.dmv_inside(
            self.dec, self.attach, self.lengths, KMaxSemiring(k)
        )
        return value

    def topk(self, k: int):
        """Attach indicators of the k best trees, ``[k, B, N1, N1, 2]``
        (ref: distributions.py:146-156): grads of the i-th kmax channel
        route through that tree's top-k selections."""
        S = KMaxSemiring(k)

        def channel(i):
            def total(a):
                v, _ = _dmv.dmv_inside(self.dec, a, self.lengths, S)
                return jnp.sum(v[i])

            return jax.grad(total)(self.attach)

        return jnp.stack([channel(i) for i in range(k)])

    # -- gradients -----------------------------------------------------------
    @property
    def marginals(self):
        """Attach marginals ``[B, N1, N1, 2]`` (ref: dmv.py:68-69)."""
        _, a = dmv_grads_fast(self.dec, self.attach, self.lengths, "log")
        return a

    @property
    def marginals_full(self):
        """(dec, attach) expected counts, as used by the EM E-step."""
        return dmv_grads_fast(self.dec, self.attach, self.lengths, "log")

    @property
    def argmax(self):
        """Viterbi attach indicators ``[B, N1, N1, 2]``."""
        _, a = dmv_grads_fast(self.dec, self.attach, self.lengths, "max")
        return a

    @property
    def argmax_heads(self):
        """Viterbi head array ``[B, N]`` (1-based heads, 0 = root)."""
        ind = self.argmax.sum(-1)  # [B, N1, N1]
        return jnp.argmax(ind[:, :, 1:], axis=1)

    # -- sampling ------------------------------------------------------------
    def sample(self, key, num_samples: int = 1):
        """Exact FFBS samples: attach indicators ``[k, B, N1, N1, 2]``
        (ref: distributions.py:195-217).

        Bit-packed multi-sampling (ref: sample.py:102-160): every chunk
        of up to 16 samples costs ONE inside pass + ONE backward — the
        packed cotangent routes 16 independent sample masses at once."""
        from .sample import multi_sample_grads

        def total(a, S):
            v, _ = _dmv.dmv_inside(self.dec, a, self.lengths, S)
            return S.unconvert(v)

        return multi_sample_grads(total, self.attach, key, num_samples)

    def gumbel_crf(self, key, temperature: float = 1.0):
        """Straight-through Gumbel relaxed sample
        (ref: distributions.py:183-188)."""
        from .sample import GumbelCRFSemiring

        S = GumbelCRFSemiring(key, temperature)

        def total(a):
            v, _ = _dmv.dmv_inside(self.dec, a, self.lengths, S)
            return jnp.sum(S.unconvert(v))

        return jax.grad(total)(self.attach)


def deptree_total_fast(arc, lengths, kind: str = "log",
                       multiroot: bool = False):
    """Backend-dispatched Eisner CRF total.

    On TPU this reuses the DMV Pallas kernels: an Eisner CRF is exactly
    a DMV with free (zero) decisions and valence-independent attach
    scores -- the tree score reduces to the sum of arc scores. Labeled
    potentials are semiring-summed over labels first.

    Dead-valence cost, measured on v5e (2026-08-17, differential
    timing): the CRF argmax leg is 31% of MBR decode at b64/len10
    (0.006 of 0.019 ms) and 36% at b128/len30 (0.067 of 0.188 ms) —
    the duplicated valence channel roughly doubles that leg. A
    single-valence kernel variant would recover at most ~0.03 ms per
    decode batch, 1-2% of any realistic eval step, so the
    specialization is deliberately NOT built; revisit only if decode
    ever dominates an eval profile.
    """
    from ..ops import dmv_max_pallas, dmv_partition_pallas, pallas_available
    from ..ops.dmv_pallas import backward_fits_vmem

    # multiroot cannot ride the DMV kernels: the DMV chart (and its
    # Pallas port) bake in the single-root zeroing of root-headed
    # sub-spans (struct/dmv.py step(), ref: dmv.py:63), so multiroot
    # always takes the pure Eisner fill below.
    if (
        not multiroot
        and not isinstance(arc, (tuple, list))
        and pallas_available()
        and backward_fits_vmem(arc.shape[1])
    ):
        if arc.ndim == 4:  # labeled: reduce labels (ref: deptree.py:41)
            arc = (
                jax.nn.logsumexp(arc, axis=-1) if kind == "log"
                else jnp.max(arc, axis=-1)
            )
        B, N1 = arc.shape[:2]
        dec = jnp.zeros((B, N1, 2, 2, 2), jnp.float32)
        attach = jnp.stack([arc, arc], axis=-1)
        # only one root child: the second root attachment would use
        # HASCHILD valence (matches dmv_merge's root row)
        attach = attach.at[:, 0, :, HASCHILD].set(NEGINF)
        fn = dmv_partition_pallas if kind == "log" else dmv_max_pallas
        return fn(dec, attach, lengths)
    sr = LogSemiring if kind == "log" else MaxSemiring
    return _deptree.deptree_partition(arc, lengths, sr, multiroot)


def deptree_grads_fast(arc, lengths, kind: str = "log",
                       multiroot: bool = False):
    def total(a):
        return jnp.sum(deptree_total_fast(a, lengths, kind, multiroot))

    return jax.grad(total)(arc)


class DependencyCRF:
    """Projective dependency CRF (ref: distributions.py:269-298).

    ``multiroot=False`` (the VLGAE default) allows exactly one child of
    the root; ``multiroot=True`` is the standard Eisner recursion where
    position 0 may head any number of words (ref: deptree.py:70-72,
    80-135 -- the reference's legacy ``_dp_orig`` chart supports it).
    """

    def __init__(self, log_potentials, lengths, multiroot: bool = False):
        self.arc = log_potentials
        self.lengths = lengths
        self.multiroot = bool(multiroot)

    @property
    def partition(self):
        return deptree_total_fast(self.arc, self.lengths, "log", self.multiroot)

    @property
    def max(self):
        return deptree_total_fast(self.arc, self.lengths, "max", self.multiroot)

    @property
    def entropy(self):
        return _deptree.deptree_partition(
            self.arc, self.lengths, EntropySemiring, self.multiroot
        )

    def cross_entropy(self, other: "DependencyCRF"):
        return _deptree.deptree_partition(
            [self.arc, other.arc], self.lengths, CrossEntropySemiring,
            self.multiroot,
        )

    def kl(self, other: "DependencyCRF"):
        return _deptree.deptree_partition(
            [self.arc, other.arc], self.lengths, KLDivergenceSemiring,
            self.multiroot,
        )

    def risk(self, cost):
        return _deptree.deptree_partition(
            [self.arc, cost], self.lengths, RiskSemiring, self.multiroot
        )

    @property
    def count(self):
        ones = jnp.where(self.arc <= NEGINF / 2, 0.0, 1.0)
        return _deptree.deptree_partition(
            ones, self.lengths, StdSemiring, self.multiroot
        )

    @property
    def marginals(self):
        return deptree_grads_fast(self.arc, self.lengths, "log", self.multiroot)

    @property
    def argmax(self):
        return deptree_grads_fast(self.arc, self.lengths, "max", self.multiroot)

    @property
    def argmax_heads(self):
        """Viterbi head array ``[B, N]`` (head of word j at column j+1)."""
        return jnp.argmax(self.argmax[:, :, 1:], axis=1)

    def sample(self, key, num_samples: int = 1):
        """Exact FFBS tree samples: arc indicators ``[k, B, N1, N1]``.
        One inside pass + one packed backward per 16 samples
        (ref: sample.py:102-160)."""
        from .sample import multi_sample_grads

        def total(a, S):
            v, _ = _deptree.deptree_inside(
                a, self.lengths, S, multiroot=self.multiroot
            )
            return S.unconvert(v)

        return multi_sample_grads(total, self.arc, key, num_samples)

    def gumbel_crf(self, key, temperature: float = 1.0):
        from .sample import GumbelCRFSemiring

        S = GumbelCRFSemiring(key, temperature)

        def total(a):
            v, _ = _deptree.deptree_inside(
                a, self.lengths, S, multiroot=self.multiroot
            )
            return jnp.sum(S.unconvert(v))

        return jax.grad(total)(self.arc)

    def kmax(self, k: int):
        """Scores of the k best trees, ``[k, B]``."""
        value, _ = _deptree.deptree_inside(
            self.arc, self.lengths, KMaxSemiring(k), multiroot=self.multiroot
        )
        return value

    def topk(self, k: int):
        """Arc indicators of the k best trees, ``[k, B, N1, N1]``."""
        S = KMaxSemiring(k)

        def channel(i):
            def total(a):
                v, _ = _deptree.deptree_inside(
                    a, self.lengths, S, multiroot=self.multiroot
                )
                return jnp.sum(v[i])

            return jax.grad(total)(self.arc)

        return jnp.stack([channel(i) for i in range(k)])

    def log_prob(self, heads):
        """Log-probability of head sequences ``[B, N]`` (1-based, 0=root)."""
        B, N1 = self.arc.shape[:2]
        cols = jnp.arange(1, N1)
        pos_ok = cols[None, :] <= self.lengths[:, None]
        score = jnp.take_along_axis(
            self.arc[:, :, 1:], heads[:, None, :], axis=1
        )[:, 0]
        score = jnp.where(pos_ok, score, 0.0).sum(-1)
        return score - self.partition
