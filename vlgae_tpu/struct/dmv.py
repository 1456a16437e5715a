"""First-order DMV (with valence) inside algorithm, TPU-native.

Re-designed from the reference chart DP (ref: src/model/torch_struct/dmv.py:19-66),
which relies on ``as_strided`` diagonal stripe views and in-place diagonal
writes -- neither exists in JAX/XLA. Here the chart is stored
*diagonal-major*: cell ``(width w, start i)`` lives at ``[w, i]``, so every
step of the width recursion reads contiguous slabs via
``lax.dynamic_slice`` and writes one row via ``lax.dynamic_update_slice``.
To keep all reads slab-contiguous we maintain each chart twice, indexed by
span *start* and by span *end/head* (a start-indexed row is written at
offset 0, its end-indexed twin at offset ``w``); this removes every gather
from the hot loop, which is what lets XLA tile the fill efficiently.

Chart semantics (derived from the reference recursion):
  - ``Cr[w, i, v]``: right-facing complete span, head ``i`` covering
    ``i..i+w``; ``v`` is the *entry valence*: the valence index used for
    the head's outermost-child attachment (or its STOP if childless).
    The generative story attaches children outermost-first, so the
    farthest child in each direction is generated with NOCHILD.
  - ``Cl[w, i, v]``: left-facing complete span, head ``i+w`` covering
    ``i..i+w``.
  - ``Ir[w, i, v]`` / ``Il[w, i, v]``: incomplete spans, head ``i`` /
    ``i+w`` attaching dependent ``i+w`` / ``i``.

Recursions (⊗/⊕ = semiring mul/sum, NC/HC = NOCHILD/HASCHILD):
  Il[w,i,v] = (⊕_t Cr[t,i,NC] ⊗ Cl[w-1-t,i+1+t,HC]) ⊗ attach[i+w,i,v] ⊗ dec[i+w,L,v,GO]
  Ir[w,i,v] = (⊕_t Cr[t,i,HC] ⊗ Cl[w-1-t,i+1+t,NC]) ⊗ attach[i,i+w,v] ⊗ dec[i,R,v,GO]
  Cl[w,i,v] = ⊕_t Il[w-t,i+t,v] ⊗ Cl[t,i,NC]
  Cr[w,i,v] = ⊕_t Ir[t+1,i,v] ⊗ Cr[w-1-t,i+1+t,NC]
with seeds Cr[0,i,v] = dec[i,R,v,STOP], Cl[0,i,v] = dec[i,L,v,STOP];
the single-root constraint zeroes ``Cr[w, 0]`` unless ``w == length``
(ref: dmv.py:63), and the partition is ``Cr[length, 0, NC]``
(ref: dmv.py:65).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .semirings import LogSemiring, Semiring

# Constants -- match the reference conventions (ref: dmv.py:7-15).
NOCHILD = 1
HASCHILD = 0
LEFT = 0
RIGHT = 1
GO = 0
STOP = 1


def _convert(S, x):
    """Lift raw or paired potentials into the stacked semiring layout."""
    if isinstance(x, (tuple, list)):
        return S.convert(tuple(xi.astype(jnp.float32) for xi in x))
    return S.convert(x.astype(jnp.float32))


def _diagonalize(table, zero):
    """Rearrange ``[s, B, N1, N1, V]`` (head, child) into diagonal-major.

    Returns ``out[s, w, B, i, V] = table[s, B, i, i+w, V]`` for the upper
    (right-arc) diagonals; invalid cells are filled with semiring zero.
    Pass ``table.swapaxes(2, 3)`` for lower (left-arc) diagonals.
    """
    s, B, N1, _, V = table.shape
    w_idx = jnp.arange(N1)[:, None]
    i_idx = jnp.arange(N1)[None, :]
    h = i_idx
    c = jnp.minimum(i_idx + w_idx, N1 - 1)
    out = table[:, :, h, c, :]  # [s, B, N1(w), N1(i), V]
    out = jnp.moveaxis(out, 2, 1)  # [s, N1(w), B, N1(i), V]
    valid = (i_idx + w_idx) <= (N1 - 1)  # [N1, N1]
    return jnp.where(valid[None, :, None, :, None], out, zero)


def _flip_shift(x, row_start, col_shift, n_rows, n_cols):
    """Read ``y[t, i] = x[::-1][row_start + t, col_shift + i]``.

    ``x`` is ``[s, W2, B, IP, *rest]`` with the row axis pre-flipped and
    zero-padded to ``W2 = 2 * n_rows``; all starts are in-bounds so
    ``dynamic_slice`` never clamps.
    """
    starts = (0, row_start, 0, col_shift) + (0,) * (x.ndim - 4)
    sizes = (x.shape[0], n_rows, x.shape[2], n_cols) + x.shape[4:]
    return lax.dynamic_slice(x, starts, sizes)


def dmv_inside(dec, attach, lengths, semiring: type[Semiring] = LogSemiring,
               remat: bool = False):
    """Inside pass of the first-order valence DMV.

    Args:
      dec: ``[B, N1, 2(dir), 2(val), 2(decision)]`` merged log-potentials
        (root at position 0, see :func:`vlgae_tpu.struct.distributions.dmv_merge`).
      attach: ``[B, N1, N1, 2(val)]`` head x child attach log-potentials.
      lengths: ``[B]`` word counts (excluding root).
      semiring: semiring class.
      remat: rematerialize scan steps in the backward pass, trading
        compute for O(N) less memory (the JAX counterpart of the
        reference's checkpoint semirings, ref: semirings/checkpoint.py).

    Returns:
      ``(value, charts)`` where ``value`` is the stacked ``[s, B]``
      semiring total (use ``semiring.unconvert``) and ``charts`` is a dict
      of final chart tensors (diagnostics / outside reuse).
    """
    S = semiring
    dec = _convert(S, dec)
    attach = _convert(S, attach)
    s, B, N1 = dec.shape[:3]
    IP = 2 * N1

    zero = S.zeros((), jnp.float32).reshape((s,) + (1,) * 4)

    # Pre-fold GO decisions into attach scores and lay them out
    # diagonal-major (ref: dmv.py:36-37 builds attach_left/right once).
    att_r = S.mul(attach, dec[:, :, :, None, RIGHT, :, GO])
    att_l = S.mul(attach, dec[:, :, :, None, LEFT, :, GO])
    attR_diag = _diagonalize(att_r, zero)  # [s, N1(w), B, N1(i), 2]
    attL_diag = _diagonalize(att_l.swapaxes(2, 3), zero)
    # attL_diag[w, i, v] = att_l[head=i+w, child=i, v]

    def init_chart():
        return S.zeros((N1, B, IP, 2), jnp.float32)

    # Width-0 seeds: STOP decisions (ref: dmv.py:39-40).
    seed_r = dec[:, :, :, RIGHT, :, STOP]  # [s, B, N1, 2]
    seed_l = dec[:, :, :, LEFT, :, STOP]
    Cr = init_chart().at[:, 0, :, :N1, :].set(seed_r)
    CrE = Cr  # end == start at width 0
    Cl = init_chart().at[:, 0, :, :N1, :].set(seed_l)
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

        tmask = (t_idx < w)[:, None, None]  # [t, B, i] per-channel view
        valid_i = (i_idx < N1 - w)[None, :]  # [B, i]

        clk_rs = _flip_shift(flip_pad(ClK), N1 - w, w, N1, N1)
        cre_rs = _flip_shift(flip_pad(CrE), N1 - w, w, N1, N1)

        cr_slab = Cr[:, :, :, :N1, :]
        cl_slab = Cl[:, :, :, :N1, :]

        def put(chart, row, col_shift):
            return lax.dynamic_update_slice(
                chart, row[:, None], (0, w, 0, col_shift, 0)
            )

        # --- incomplete spans (ref: dmv.py:50-56) ---
        t1 = S.mul(cr_slab[..., NOCHILD], clk_rs[..., HASCHILD])
        il_new = S.mul(
            S.sum(S.mask(t1, tmask), axis=0)[..., None],
            lax.dynamic_slice(
                attL_diag, (0, w, 0, 0, 0), (s, 1, B, N1, 2)
            )[:, 0],
        )
        t2 = S.mul(cr_slab[..., HASCHILD], clk_rs[..., NOCHILD])
        ir_new = S.mul(
            S.sum(S.mask(t2, tmask), axis=0)[..., None],
            lax.dynamic_slice(
                attR_diag, (0, w, 0, 0, 0), (s, 1, B, N1, 2)
            )[:, 0],
        )
        il_new = S.mask(il_new, valid_i[..., None])
        ir_new = S.mask(ir_new, valid_i[..., None])
        # The complete-span updates at width w read incomplete spans OF
        # width w (t = 0 / t = w - 1 terms), so write I rows first.
        Ir = put(Ir, ir_new, 0)
        IlH = put(IlH, il_new, w)

        ilh_rs = _flip_shift(flip_pad(IlH), N1 - 1 - w, w, N1, N1)
        # Ir shifted by one width: row t holds Ir[t+1].
        ir_shift = jnp.concatenate(
            [Ir[:, 1:, :, :N1, :], pad_rows[:, :1, :, :N1, :]], axis=1
        )

        # --- complete spans (ref: dmv.py:58-62) ---
        t3 = S.mul(ilh_rs, cl_slab[..., NOCHILD][..., None])
        cl_new = S.sum(S.mask(t3, tmask[..., None]), axis=0)
        t4 = S.mul(ir_shift, cre_rs[..., NOCHILD][..., None])
        cr_new = S.sum(S.mask(t4, tmask[..., None]), axis=0)

        # Single-root constraint: a root-headed complete span must cover
        # the whole sentence (ref: dmv.py:63).
        keep_root = (i_idx[None, :] != 0) | (lengths[:, None] == w)
        cr_new = S.mask(cr_new, (keep_root & valid_i)[..., None])
        cl_new = S.mask(cl_new, valid_i[..., None])

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

    # Partition readout: Cr[length, 0, NOCHILD] (ref: dmv.py:65).
    root_col = Cr[:, :, :, 0, NOCHILD]  # [s, w, B]
    value = jnp.take_along_axis(
        root_col, lengths[None, None, :].astype(jnp.int32), axis=1
    )[:, 0]
    charts = {"Cr": Cr, "Cl": Cl, "Ir": Ir, "IlH": IlH}
    return value, charts


@functools.partial(jax.jit, static_argnames=("semiring",))
def dmv_partition(dec, attach, lengths, semiring: type[Semiring] = LogSemiring):
    """Semiring total over all DMV trees; ``[B]``."""
    value, _ = dmv_inside(dec, attach, lengths, semiring)
    return semiring.unconvert(value)


@functools.partial(jax.jit, static_argnames=("semiring",))
def dmv_marginals(dec, attach, lengths, semiring: type[Semiring] = LogSemiring):
    """Gradients of the semiring total w.r.t. (dec, attach).

    With LogSemiring these are the expected rule counts (marginals); with
    MaxSemiring they are Viterbi-tree indicator counts. Replaces the
    reference's autograd-through-the-chart (ref: helpers.py:118-157).
    """

    def total(d, a):
        return jnp.sum(dmv_partition(d, a, lengths, semiring))

    return jax.grad(total, argnums=(0, 1))(dec, attach)
