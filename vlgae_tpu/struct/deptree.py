"""Projective dependency tree (Eisner) inside algorithm, TPU-native.

Re-designed from the reference Eisner chart DP
(ref: src/model/torch_struct/deptree.py:25-76). Same diagonal-major,
dual-indexed chart layout as :mod:`vlgae_tpu.struct.dmv` -- see that
module's docstring for the layout rationale.

Chart semantics:
  - ``Cr[w, i]``: complete right span, head ``i`` covering ``i..i+w``.
  - ``Cl[w, i]``: complete left span, head ``i+w`` covering ``i..i+w``.
  - ``Ir[w, i]`` / ``Il[w, i]``: incomplete spans head ``i`` -> dep
    ``i+w`` / head ``i+w`` -> dep ``i``.

Recursions (ref: deptree.py:47-72):
  ilr[w,i]  = ⊕_t Cr[t,i] ⊗ Cl[w-1-t,i+1+t]
  Il[w,i]   = ilr ⊗ arc[i+w, i]
  Ir[w,i]   = ilr ⊗ arc[i, i+w]
  Cl[w,i]   = ⊕_t Il[w-t,i+t] ⊗ Cl[t,i]
  Cr[w,i]   = ⊕_t Ir[t+1,i] ⊗ Cr[w-1-t,i+1+t]
Single root is enforced by zeroing ``Cr[w, 0]`` unless ``w == length``
(ref: deptree.py:71-72); the total is ``Cr[length, 0]``
(ref: deptree.py:74-75). Arc potentials are ``[B, N1, N1]`` head x child
with the root at row 0; entries beyond each sentence length are masked
to semiring zero before the fill (ref: deptree.py:146-162).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .dmv import _convert, _flip_shift
from .semirings import LogSemiring, Semiring


def _diagonalize2(table, zero):
    """``out[s, w, B, i] = table[s, B, i, i+w]`` (upper diagonals)."""
    s, B, N1, _ = table.shape
    w_idx = jnp.arange(N1)[:, None]
    i_idx = jnp.arange(N1)[None, :]
    c = jnp.minimum(i_idx + w_idx, N1 - 1)
    out = table[:, :, i_idx, c]  # [s, B, N1(w), N1(i)]
    out = jnp.moveaxis(out, 2, 1)
    valid = (i_idx + w_idx) <= (N1 - 1)
    return jnp.where(valid[None, :, None, :], out, zero)


def deptree_inside(arc, lengths, semiring: type[Semiring] = LogSemiring,
                   remat: bool = False, multiroot: bool = False):
    """Inside pass for the projective dependency CRF.

    Args:
      arc: ``[B, N1, N1]`` arc log-potentials, ``arc[b, h, c]`` scores the
        arc head ``h`` -> child ``c``; row 0 holds root scores. A labeled
        ``[B, N1, N1, L]`` table is summed over labels first
        (ref: deptree.py:41); gradients still flow to the labeled table,
        so max-semiring marginals give labeled argmax indicators.
      lengths: ``[B]`` word counts (excluding root).
      semiring: semiring class.
      multiroot: when True, position 0 may head any number of words --
        the single-root ``Cr[w, 0]`` zeroing is skipped, which is the
        standard Eisner recursion (ref: deptree.py:70-72 gates the
        zeroing on ``not multiroot``; deptree.py:80-135 is the legacy
        multiroot-capable chart).

    Returns:
      ``(value, charts)`` with ``value`` stacked ``[s, B]``.
    """
    S = semiring
    if not isinstance(arc, (tuple, list)) and arc.ndim == 4:
        arc = S.sum(_convert(S, arc), axis=-1)
    else:
        arc = _convert(S, arc)
    arc = S.mask(
        arc,
        (jnp.arange(arc.shape[2])[None, :, None] <= lengths[:, None, None])
        & (jnp.arange(arc.shape[2])[None, None, :] <= lengths[:, None, None]),
    )
    s, B, N1 = arc.shape[:3]
    IP = 2 * N1

    zero = S.zeros((), jnp.float32).reshape((s,) + (1,) * 3)
    arcR_diag = _diagonalize2(arc, zero)  # [s, w, B, i]: arc[i, i+w]
    arcL_diag = _diagonalize2(arc.swapaxes(2, 3), zero)  # arc[i+w, i]

    def init_chart():
        return S.zeros((N1, B, IP), jnp.float32)

    one_row = S.ones((B, N1), jnp.float32)
    Cr = init_chart().at[:, 0, :, :N1].set(one_row)
    CrE = Cr
    Cl = init_chart().at[:, 0, :, :N1].set(one_row)
    ClK = Cl
    Ir = init_chart()
    IlH = init_chart()

    i_idx = jnp.arange(N1)
    t_idx = jnp.arange(N1)
    pad_rows = init_chart()

    def flip_pad(x):
        return jnp.concatenate([jnp.flip(x, axis=1), pad_rows], axis=1)

    def step(carry, w):
        Cr, CrE, Cl, ClK, Ir, IlH = carry
        tmask = (t_idx < w)[:, None, None]
        valid_i = (i_idx < N1 - w)[None, :]

        clk_rs = _flip_shift(flip_pad(ClK), N1 - w, w, N1, N1)
        cre_rs = _flip_shift(flip_pad(CrE), N1 - w, w, N1, N1)

        cr_slab = Cr[:, :, :, :N1]
        cl_slab = Cl[:, :, :, :N1]

        def put(chart, row, col_shift):
            return lax.dynamic_update_slice(
                chart, row[:, None], (0, w, 0, col_shift)
            )

        ilr = S.sum(S.mask(S.mul(cr_slab, clk_rs), tmask), axis=0)
        il_new = S.mul(
            ilr, lax.dynamic_slice(arcL_diag, (0, w, 0, 0), (s, 1, B, N1))[:, 0]
        )
        ir_new = S.mul(
            ilr, lax.dynamic_slice(arcR_diag, (0, w, 0, 0), (s, 1, B, N1))[:, 0]
        )
        il_new = S.mask(il_new, valid_i)
        ir_new = S.mask(ir_new, valid_i)
        # Complete-span updates at width w read width-w incomplete spans,
        # so write the I rows first.
        Ir = put(Ir, ir_new, 0)
        IlH = put(IlH, il_new, w)

        ilh_rs = _flip_shift(flip_pad(IlH), N1 - 1 - w, w, N1, N1)
        ir_shift = jnp.concatenate(
            [Ir[:, 1:, :, :N1], pad_rows[:, :1, :, :N1]], axis=1
        )

        cl_new = S.sum(S.mask(S.mul(ilh_rs, cl_slab), tmask), axis=0)
        cr_new = S.sum(S.mask(S.mul(ir_shift, cre_rs), tmask), axis=0)

        if multiroot:
            cr_new = S.mask(cr_new, valid_i)
        else:
            keep_root = (i_idx[None, :] != 0) | (lengths[:, None] == w)
            cr_new = S.mask(cr_new, keep_root & valid_i)
        cl_new = S.mask(cl_new, valid_i)

        Cr = put(Cr, cr_new, 0)
        CrE = put(CrE, cr_new, w)
        Cl = put(Cl, cl_new, 0)
        ClK = put(ClK, cl_new, w)
        return (Cr, CrE, Cl, ClK, Ir, IlH), None

    if N1 > 1:
        body = jax.checkpoint(step) if remat else step
        (Cr, CrE, Cl, ClK, Ir, IlH), _ = lax.scan(
            body, (Cr, CrE, Cl, ClK, Ir, IlH), jnp.arange(1, N1)
        )

    root_col = Cr[:, :, :, 0]  # [s, w, B]
    value = jnp.take_along_axis(
        root_col, lengths[None, None, :].astype(jnp.int32), axis=1
    )[:, 0]
    charts = {"Cr": Cr, "Cl": Cl, "Ir": Ir, "IlH": IlH}
    return value, charts


@functools.partial(jax.jit, static_argnames=("semiring", "multiroot"))
def deptree_partition(arc, lengths, semiring: type[Semiring] = LogSemiring,
                      multiroot: bool = False):
    value, _ = deptree_inside(arc, lengths, semiring, multiroot=multiroot)
    return semiring.unconvert(value)


@functools.partial(jax.jit, static_argnames=("semiring", "multiroot"))
def deptree_marginals(arc, lengths, semiring: type[Semiring] = LogSemiring,
                      multiroot: bool = False):
    """d(total)/d(arc): marginals (Log) or argmax indicators (Max)."""

    def total(a):
        return jnp.sum(deptree_partition(a, lengths, semiring, multiroot))

    return jax.grad(total)(arc)


def deptree_nonproj_marginals(arc_scores, eps: float = 1e-5):
    """Matrix-tree-theorem marginals for non-projective trees.

    ``arc_scores``: ``[B, N, N]`` with root scores on the diagonal
    (ref: deptree.py:277-309). Returns ``[B, N, N]`` arc marginals with
    root marginals on the diagonal.
    """
    x = arc_scores
    N = x.shape[1]
    eye = jnp.eye(N, dtype=bool)
    lap = jnp.exp(x) + eps
    lap = jnp.where(eye, 0.0, lap)
    lap = -lap + jnp.zeros_like(lap).at[
        :, jnp.arange(N), jnp.arange(N)
    ].set(lap.sum(1))
    lap = lap.at[:, 0].set(jnp.exp(jnp.diagonal(x, axis1=-2, axis2=-1)))
    inv = jnp.linalg.inv(lap)
    factor = jnp.broadcast_to(
        jnp.diagonal(inv, axis1=-2, axis2=-1)[:, :, None], x.shape
    ).swapaxes(1, 2)
    term1 = jnp.exp(x) * factor
    term2 = jnp.exp(x) * inv.swapaxes(1, 2)
    term1 = term1.at[:, :, 0].set(0.0)
    term2 = term2.at[:, 0].set(0.0)
    out = term1 - term2
    roots = jnp.exp(jnp.diagonal(x, axis1=-2, axis2=-1)) * inv.swapaxes(1, 2)[:, 0]
    return out + jnp.zeros_like(out).at[:, jnp.arange(N), jnp.arange(N)].set(roots)


def deptree_nonproj_partition(arc_scores, eps: float = 1e-5):
    """Log-partition of non-projective trees via MTT (ref: deptree.py:315-322)."""
    x = arc_scores
    N = x.shape[1]
    eye = jnp.eye(N, dtype=bool)
    lap = jnp.exp(x) + eps
    lap = jnp.where(eye, 0.0, lap)
    lap = -lap + jnp.zeros_like(lap).at[
        :, jnp.arange(N), jnp.arange(N)
    ].set(lap.sum(1))
    lap = lap.at[:, 0].set(jnp.exp(jnp.diagonal(x, axis1=-2, axis2=-1)))
    sign, logdet = jnp.linalg.slogdet(lap)
    return logdet
