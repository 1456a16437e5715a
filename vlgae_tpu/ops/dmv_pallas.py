"""Pallas TPU kernels for the DMV inside/outside chart fills.

This is the framework's designated native-acceleration point, replacing
the reference's optional genbmm/pykeops CUDA kernels
(ref: src/model/torch_struct/semirings/fast_semirings.py, keops.py) with
kernels designed for the TPU memory hierarchy:

  - The whole O(n^3) chart fill runs in ONE kernel launch per batch tile
    with all charts resident in VMEM -- the pure-XLA scan writes each
    diagonal back to HBM, so for the small per-step working sets of this
    DP the kernel removes essentially all HBM round-trips.
  - Layout: charts are ``[width, valence, position, batch_tile]``, so the
    minor-most dims map to (sublanes=positions, lanes=128 sentences). All
    sentences in a tile share the same control flow; every vector op
    covers the full lane width.
  - Diagonal-shifted chart reads/writes (the ``as_strided`` stripe trick
    of the reference, ref: dmv.py:72-133) are staged through small
    double-width scratch rows, keeping every chart 8-sublane aligned.
  - The backward pass is a hand-derived *outside* pass (the adjoint of
    the inside recursion, processed width-descending), recomputing the
    inside charts in-kernel rather than staging them through HBM --
    compute is cheap here, bandwidth is not.

Supports the log semiring (partition/marginals: adjoints accumulate with
logaddexp; grads are ``exp(inside + outside - logZ)``) and the max
semiring (Viterbi/argmax: adjoints accumulate with max; grads are
on-best-path indicators).

Chart semantics match :mod:`vlgae_tpu.struct.dmv` (see its docstring;
derived from ref: src/model/torch_struct/dmv.py:19-66).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..struct.dmv import GO, HASCHILD, LEFT, NOCHILD, RIGHT, STOP
from ..struct.semirings import NEGINF

# Tolerance for on-best-path tests in the max-semiring backward.
_MAX_EPS = 1e-4

BT = 128  # batch tile = lane width


def _round8(x):
    return (x + 7) // 8 * 8


def backward_fits_vmem(n1: int) -> bool:
    """Whether the outside kernel's buffers fit VMEM at some launch
    size (column-padded layout; see :func:`_outside_max_launch`).
    Verified on hardware at n1 = 65 (sentence length 64)."""
    return _outside_max_launch(n1) > 0


# ---------------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------------


def _shift_read(pad, chart, row, shift, n1r):
    """Return ``value[:, i, :] = chart[row, :, shift + i, :]`` (width n1r).

    Out-of-range positions read the pad's NEGINF fill; callers mask them.
    """
    pad[:, :n1r, :] = chart[row, :, :, :]
    return pad[:, pl.ds(shift, n1r), :]


def _shift_accum(pad, chart, row, shift, value, n1r, plus):
    """``chart[row, :, shift + i, :] ⊕= value[:, i, :]`` for i in [0, n1r).

    Contributions that would land at columns >= n1r are dropped; they only
    arise from invalid (masked) positions.
    """
    pad[:, :, :] = jnp.full(pad.shape, NEGINF, jnp.float32)
    pad[:, pl.ds(shift, n1r), :] = value
    chart[row, :, :, :] = plus(chart[row, :, :, :], pad[:, :n1r, :])


# ---------------------------------------------------------------------------
# forward (inside) fill
# ---------------------------------------------------------------------------


def _inside_fill(n1, n1r, is_max, attL, attR, seedR, seedL, lengths_row,
                 Cr, Cl, Ir, Il, padA, padB):
    """Shared inside fill writing the four charts; returns out row [BT]."""

    def plus(a, b):
        return jnp.maximum(a, b) if is_max else jnp.logaddexp(a, b)

    neg_all = jnp.full((n1, 2, n1r, BT), NEGINF, jnp.float32)
    Cr[:, :, :, :] = neg_all
    Cl[:, :, :, :] = neg_all
    Ir[:, :, :, :] = neg_all
    Il[:, :, :, :] = neg_all
    Cr[0, :, :, :] = seedR[:]
    Cl[0, :, :, :] = seedL[:]
    # pads must start at semiring zero: _shift_read only overwrites the
    # first n1r columns, and uninitialised VMEM is garbage on hardware
    padA[:, :, :] = jnp.full(padA.shape, NEGINF, jnp.float32)
    padB[:, :, :] = jnp.full(padB.shape, NEGINF, jnp.float32)

    i_iota = lax.broadcasted_iota(jnp.int32, (n1r, BT), 0)
    lengths = lengths_row[0, :]  # [BT]
    out0 = jnp.full((BT,), NEGINF, jnp.float32)

    def w_body(w, out_acc):
        # ---- incomplete spans (ref: dmv.py:50-56) ----
        def t_body(t, carry):
            acc_l, acc_r = carry
            cl_pair = _shift_read(padA, Cl, w - 1 - t, 1 + t, n1r)
            cr_nc = Cr[t, NOCHILD, :, :]
            cr_hc = Cr[t, HASCHILD, :, :]
            acc_l = plus(acc_l, cr_nc + cl_pair[HASCHILD])
            acc_r = plus(acc_r, cr_hc + cl_pair[NOCHILD])
            return acc_l, acc_r

        init = (jnp.full((n1r, BT), NEGINF, jnp.float32),) * 2
        inner_l, inner_r = lax.fori_loop(0, w, t_body, init)

        valid = (i_iota < n1 - w)[None]  # [1, n1r, BT]
        il_new = jnp.where(valid, inner_l[None] + attL[w], NEGINF)
        ir_new = jnp.where(valid, inner_r[None] + attR[w], NEGINF)
        Il[w, :, :, :] = il_new
        Ir[w, :, :, :] = ir_new

        # ---- complete spans (ref: dmv.py:58-62) ----
        def t_body2(t, carry):
            acc_cl, acc_cr = carry
            il_wt = _shift_read(padA, Il, w - t, t, n1r)
            cr_wt = _shift_read(padB, Cr, w - 1 - t, 1 + t, n1r)
            cl_t = Cl[t, NOCHILD, :, :][None]
            ir_t1 = Ir[t + 1, :, :, :]
            acc_cl = plus(acc_cl, il_wt + cl_t)
            acc_cr = plus(acc_cr, ir_t1 + cr_wt[NOCHILD][None])
            return acc_cl, acc_cr

        init2 = (jnp.full((2, n1r, BT), NEGINF, jnp.float32),) * 2
        cl_new, cr_new = lax.fori_loop(0, w, t_body2, init2)

        # single-root constraint (ref: dmv.py:63)
        root_keep = (i_iota != 0) | (lengths[None, :] == w)
        cr_new = jnp.where(valid & root_keep[None], cr_new, NEGINF)
        cl_new = jnp.where(valid, cl_new, NEGINF)
        Cl[w, :, :, :] = cl_new
        Cr[w, :, :, :] = cr_new

        # partition readout accumulates when w == length (ref: dmv.py:65)
        out_acc = jnp.where(lengths == w, cr_new[NOCHILD, 0, :], out_acc)
        return out_acc

    return lax.fori_loop(1, n1, w_body, out0)


def _inside_fill_v2(n1, n1r, ip, is_max, attL, attR, seedR, seedL,
                    lengths_row, Cr, Cl, Ir, Il, ClKF, CrEF, IlHF):
    """Vectorized-width inside fill: every per-width update is one
    logsumexp reduction over a [N1, 2, n1r, BT] slab instead of a
    sequential split-point loop.

    Dual-layout trick: flipped, position-indexed copies of the charts
    (``ClKF``/``CrEF`` indexed by the span's head/end position, rows
    stored width-reversed) turn the diagonal stripe reads of the
    recursion into contiguous (row-slab, column-shift) dynamic slices:
      Cl[w-1-t, i+1+t] == ClKF[flip(w-1-t), i+w]   (column shift w only)
    ``Il`` is kept in the plain layout too so the (v1) outside kernel can
    consume the saved charts unchanged. ``Ir`` has one extra NEG row so
    ``Ir[t+1]`` is a static row-offset slab.
    """

    def plus(a, b):
        return jnp.maximum(a, b) if is_max else jnp.logaddexp(a, b)

    def lse_t(x, tmask):
        x = jnp.where(tmask, x, NEGINF)
        if is_max:
            return jnp.max(x, axis=0)
        m = jnp.max(x, axis=0)
        s = jnp.sum(jnp.exp(x - m[None]), axis=0)
        return m + jnp.log(s)

    neg_plain = jnp.full((n1, 2, n1r, BT), NEGINF, jnp.float32)
    Cr[:, :, :, :] = neg_plain
    Cl[:, :, :, :] = jnp.full((n1 + 1, 2, n1r, BT), NEGINF, jnp.float32)
    Ir[:, :, :, :] = jnp.full((n1 + 1, 2, n1r, BT), NEGINF, jnp.float32)
    if Il is not None:
        Il[:, :, :, :] = neg_plain
    neg_flip = jnp.full((2 * n1, 2, ip, BT), NEGINF, jnp.float32)
    ClKF[:, :, :, :] = neg_flip
    CrEF[:, :, :, :] = neg_flip
    IlHF[:, :, :, :] = neg_flip

    Cr[0, :, :, :] = seedR[:]
    Cl[0, :, :, :] = seedL[:]
    ClKF[n1 - 1, :, pl.ds(0, n1r), :] = seedL[:]
    CrEF[n1 - 1, :, pl.ds(0, n1r), :] = seedR[:]

    t_iota = lax.broadcasted_iota(jnp.int32, (n1, 1, n1r, BT), 0)
    i_iota = lax.broadcasted_iota(jnp.int32, (n1r, BT), 0)
    lengths = lengths_row[0, :]
    out0 = jnp.full((BT,), NEGINF, jnp.float32)

    def w_body(w, out_acc):
        tmask = t_iota < w
        valid = (i_iota < n1 - w)[None]

        clk = ClKF[pl.ds(n1 - w, n1), :, pl.ds(w, n1r), :]
        cr_nc = Cr[:, NOCHILD, :, :][:, None]
        cr_hc = Cr[:, HASCHILD, :, :][:, None]
        inner_l = lse_t(cr_nc + clk[:, HASCHILD][:, None], tmask)[0]
        inner_r = lse_t(cr_hc + clk[:, NOCHILD][:, None], tmask)[0]

        il_new = jnp.where(valid, inner_l[None] + attL[w], NEGINF)
        ir_new = jnp.where(valid, inner_r[None] + attR[w], NEGINF)
        Ir[w, :, :, :] = ir_new
        if Il is not None:
            Il[w, :, :, :] = il_new
        IlHF[n1 - 1 - w, :, pl.ds(w, n1r), :] = il_new

        # The complete-span updates consume the width-w incomplete rows
        # written just above. Reading a just-written row through a
        # dynamically-indexed slab races on hardware (Mosaic misses the
        # overlap), so the t=0 / t=w-1 terms are folded in from the
        # in-register values and the slabs exclude the fresh rows
        # (their stale lanes are masked out and thus harmless).
        tmask1 = t_iota < (w - 1)
        # Cl[w,i,v] = [sum_{t>=1} Il[w-t,i+t,v]*Cl[t,i,NC]] + il_new*Cl[0,i,NC]
        ilh = IlHF[pl.ds(n1 - w, n1), :, pl.ds(w, n1r), :]
        cl_rest = lse_t(ilh + Cl[pl.ds(1, n1), NOCHILD, :, :][:, None],
                        tmask1)
        cl_new = plus(cl_rest, il_new + Cl[0, NOCHILD, :, :][None])
        # Cr[w,i,v] = [sum_{t<=w-2} Ir[t+1,i,v]*CrE[w-1-t,i+w,NC]]
        #             + ir_new*CrE[0,i+w,NC]
        cre = CrEF[pl.ds(n1 - w, n1), NOCHILD, pl.ds(w, n1r), :][:, None]
        cr_rest = lse_t(Ir[pl.ds(1, n1), :, :, :] + cre, tmask1)
        cre0 = CrEF[n1 - 1, NOCHILD, pl.ds(w, n1r), :]
        cr_new = plus(cr_rest, ir_new + cre0[None])

        root_keep = (i_iota != 0) | (lengths[None, :] == w)
        cr_new = jnp.where(valid & root_keep[None], cr_new, NEGINF)
        cl_new = jnp.where(valid, cl_new, NEGINF)
        Cr[w, :, :, :] = cr_new
        Cl[w, :, :, :] = cl_new
        ClKF[n1 - 1 - w, :, pl.ds(w, n1r), :] = cl_new
        CrEF[n1 - 1 - w, :, pl.ds(w, n1r), :] = cr_new

        out_acc = jnp.where(lengths == w, cr_new[NOCHILD, 0, :], out_acc)
        return out_acc

    return lax.fori_loop(1, n1, w_body, out0)


TCH = 8  # chunk rows for the v3 streaming split-point reductions


def _flip_cols(n1: int) -> int:
    """Column capacity for the v3 end-indexed flip buffers. Flip reads
    and writes index column ``e = w + i``; under width-banding the slab
    width is ``C <= roundup(n1 - w, 8) <= n1 - w + 7``, so every access
    spans columns ``< w + C <= n1 + 7``. (The pre-banding fills read
    full ``n1r``-wide slabs at shift ``w`` and needed
    ``round8(n1 - 1 + n1r)``; banding halves the flip footprint at
    n1 = 65.)"""
    return _round8(n1 + 7)


def _width_bands(n1, n1r, g=8):
    """Partition widths [1, n1) into bands sharing a STATIC column count.

    At width ``w`` only ``n1 - w`` start positions are valid, yet a
    single fori_loop body must slice a static column width — so the
    plain loop does every slab op over all ``n1r`` columns and wastes
    >50% of the VPU work on masked positions (worst exactly at the
    large widths that carry the most split points). Banding the width
    loop into ``ceil(n1/g)`` phases with descending static widths
    ``C = roundup(n1 - w_lo, g)`` makes per-width work proportional to
    the true ``w * (n1 - w)`` profile: at n1 = 65 the dominant
    split-point loops shrink 2.77x (sum w*C vs sum w*n1r).

    Returns [(w_lo, w_hi, C)] covering widths [1, n1), C multiple of
    ``g`` and C >= n1 - w for every w in the band.
    """
    bands = []
    w = 1
    while w < n1:
        C = min(n1r, -(-(n1 - w) // g) * g)
        w_hi = min(n1, n1 - C + g)
        bands.append((w, w_hi, C))
        w = w_hi
    return bands


def _stream_init(shape, is_max):
    m = jnp.full(shape, NEGINF, jnp.float32)
    if is_max:
        return (m,)
    return (m, jnp.zeros(shape, jnp.float32))


def _stream_add(carry, x, is_max):
    """Fold a ``[TCH, ...]`` chunk into a streaming semiring reduction.

    Log semiring: running-max + rescaled partial sum (one exp per chunk
    element, one rescale per chunk). NEGINF rows contribute exp(-huge)=0,
    so partial chunks whose tail rows sit in NEGINF-initialised padding
    mask themselves.
    """
    mc = jnp.max(x, axis=0)
    if is_max:
        return (jnp.maximum(carry[0], mc),)
    m, s = carry
    nm = jnp.maximum(m, mc)
    s = s * jnp.exp(m - nm) + jnp.sum(jnp.exp(x - nm[None]), axis=0)
    return (nm, s)


def _stream_fin(carry, is_max):
    if is_max:
        return carry[0]
    m, s = carry
    # log(0) -> -inf for empty reductions; clamp back to the finite
    # NEGINF convention so no -inf/NaN escapes into later arithmetic.
    return jnp.maximum(m + jnp.log(s), NEGINF)


def _ms_acc(m, s, x):
    """Fold one value into a (running max, scaled sum) accumulator pair.

    ``logaddexp`` with the log amortized away: whichever of the running
    max ``m`` and the incoming ``x`` is smaller gets rescaled onto the
    larger, so each accumulate costs ONE exp and NO log (``exp(-|d|)``
    is the rescale factor for either side). The outside pass pays the
    single ``log`` per cell only when a row is finalized (read) — an
    O(n^2) count against the O(n^3) pushes. Semiring-zero cells are
    (m = NEGINF, s = 0); pushes of NEGINF land as mass at the NEGINF
    scale, which any real push later rescales to exactly 0.
    """
    return _ms_acc2(m, s, x, 1.0)


def _ms_acc2(m, s, mx, sx):
    """Fold an incoming (max ``mx``, scaled sum ``sx``) pair into the
    (m, s) accumulator — still one exp, no log: the scale difference
    rescales whichever side is smaller."""
    d = mx - m
    e = jnp.exp(-jnp.abs(d))
    s2 = jnp.where(d > 0.0, s * e + sx, s + sx * e)
    return jnp.maximum(m, mx), s2


# Minimum chart size (n1 = N + 1) at which the outside pass keeps its
# channel combines in (m,s) form (see _outside_fill.ms_comb for the
# measured rationale). len30 (n1=31) measured below this bar, len64
# (n1=65) above it; 48 is the untested midpoint.
MS_COMBINE_MIN_N1 = 48


def _pair_ms(x0, x1):
    """Combine two log values into an (m, s) pair: one exp, no log
    (vs logaddexp's exp + log1p). The pair adds a log-domain offset by
    addition on ``m`` alone, so downstream pushes stay log-free."""
    mc = jnp.maximum(x0, x1)
    sc = 1.0 + jnp.exp(-jnp.abs(x0 - x1))
    return mc, sc


def _ms_fin(m, s):
    """Finalize an (m, s) accumulator pair to a log-domain value (one
    log per cell; empty cells clamp back to the finite NEGINF)."""
    return jnp.maximum(m + jnp.log(s), NEGINF)


# Chart STORAGE dtype for the no-save v3 inside fill (the bf16
# chart-storage lever, VERDICT r3 #10): accumulators always stay f32 in
# registers; bf16 only rounds the VMEM-resident chart cells, halving
# chart bytes/launch. Trace-time flag, A/B'd by scripts/ab_bf16_chart.py;
# the save path (outside consumes the charts) is f32-only by contract.
CHART_STORE_DTYPE = jnp.float32


def _inside_fill_v3(n1, n1r, ip, fr, is_max, attL, attR, seedR, seedL,
                    lengths_row, Cr, Cl, Ir, Il, ClKF, CrEF, IlHF):
    """Chunked streaming inside fill (v3).

    v2 reduces a full ``[n1, ...]`` slab per width of which only ``w``
    rows are valid — ~6x masked waste over the whole fill. v3 walks the
    split dimension in ``ceil(w / TCH)`` row chunks, accumulating into
    registers with a streaming logsumexp, so per-width work is
    proportional to ``w``. All chart buffers carry ``TCH`` extra
    NEGINF rows (``nx = n1 + TCH`` plain rows, ``fr`` flipped rows) so
    the final partial chunk reads in-bounds padding instead of needing
    a mask; the same padding makes future-width rows (not yet written)
    read as semiring zero.

    Hazard note (same dual-layout scheme as v2): the width-w complete
    updates must not see the width-w incomplete rows through their
    chunked slab reads, so the fresh ``il_new``/``ir_new`` terms are
    folded in-register and the ``Ir[w]`` row write is DEFERRED to after
    the complete-span reductions (a chunk at row ``w`` would otherwise
    read it: chunks round up past ``w - 1``).

    The chart buffers may carry MORE than ``n1r`` columns (the fused
    fwd+bwd kernel hands in outside-layout buffers padded to
    ``round8(n1 + 7)``); the fill only ever touches the first ``n1r``
    and leaves the rest at semiring zero.
    """
    nx = n1 + TCH
    cw = Cr.shape[2]  # chart column capacity (>= n1r)
    # storage dtype: casts are no-ops at f32; at bf16 only the chart
    # cells round -- every reduction below runs on f32 registers
    dt = Cr.dtype
    st = lambda x: x.astype(dt)
    ld = lambda x: x.astype(jnp.float32)

    def plus(a, b):
        return jnp.maximum(a, b) if is_max else jnp.logaddexp(a, b)

    neg_chart = jnp.full((nx, 2, cw, BT), NEGINF, dt)
    Cr[:, :, :, :] = neg_chart
    Cl[:, :, :, :] = neg_chart
    Ir[:, :, :, :] = neg_chart
    if Il is not None:
        Il[:, :, :, :] = neg_chart
    neg_flip = jnp.full((fr, 2, ip, BT), NEGINF, dt)
    ClKF[:, :, :, :] = neg_flip
    # CrEF is valence-sliced: the fill (and the v4 outside) only ever
    # read its NOCHILD channel
    CrEF[:, :, :, :] = neg_flip[:, :1]
    IlHF[:, :, :, :] = neg_flip

    Cr[0, :, pl.ds(0, n1r), :] = st(seedR[:])
    Cl[0, :, pl.ds(0, n1r), :] = st(seedL[:])
    ClKF[n1 - 1, :, pl.ds(0, n1r), :] = st(seedL[:])
    CrEF[n1 - 1, 0, pl.ds(0, n1r), :] = st(seedR[NOCHILD])

    lengths = lengths_row[0, :]
    out0 = jnp.full((BT,), NEGINF, jnp.float32)

    def band_body(C):
        """Width-loop body over a band with STATIC column count C
        (C >= n1 - w for every width in the band; see _width_bands):
        every slab op narrows from n1r to C columns, skipping the
        masked-position waste. Columns >= C of the width-w rows are
        never written and keep their NEGINF initialisation."""
        i_iota = lax.broadcasted_iota(jnp.int32, (C, BT), 0)

        def w_body(w, out_acc):
            valid = (i_iota < n1 - w)[None]

            # ---- incomplete spans: reduce over t in [0, w) ----
            # chunk row t pairs Cr[t] with ClKF[n1-w+t] (= Cl width
            # w-1-t, keyed by end position, column-shifted by w); rows
            # t >= w read NEGINF (future widths / flip padding).
            nck = (w + TCH - 1) // TCH

            def inner_chunk(c, carry):
                sL, sR = carry
                t0 = c * TCH
                clk = ld(ClKF[pl.ds(n1 - w + t0, TCH), :, pl.ds(w, C), :])
                crc = ld(Cr[pl.ds(t0, TCH), :, pl.ds(0, C), :])
                sL = _stream_add(sL, crc[:, NOCHILD] + clk[:, HASCHILD],
                                 is_max)
                sR = _stream_add(sR, crc[:, HASCHILD] + clk[:, NOCHILD],
                                 is_max)
                return sL, sR

            sL, sR = lax.fori_loop(
                0, nck, inner_chunk,
                (_stream_init((C, BT), is_max),
                 _stream_init((C, BT), is_max)),
            )
            inner_l = _stream_fin(sL, is_max)
            inner_r = _stream_fin(sR, is_max)

            att_l = attL[w, :, pl.ds(0, C), :]
            att_r = attR[w, :, pl.ds(0, C), :]
            il_new = jnp.where(valid, inner_l[None] + att_l, NEGINF)
            ir_new = jnp.where(valid, inner_r[None] + att_r, NEGINF)
            if Il is not None:
                Il[w, :, pl.ds(0, C), :] = st(il_new)
            IlHF[n1 - 1 - w, :, pl.ds(w, C), :] = st(il_new)
            # Ir[w] write deferred (see hazard note).

            # ---- complete spans: rest terms, chunk row r in [0, w-1) --
            # Cl: row r pairs IlHF[n1-w+r] (Il width w-1-r) with
            # Cl[r+1,NC]; Cr: row r pairs Ir[r+1] with CrEF[n1-w+r]
            # (CrE width w-1-r). Row r = w-1 self-masks for Cl
            # (IlHF[n1-1] is the never-written width-0 row) and for Cr
            # (Ir[w] not yet written); the true fresh terms are folded
            # in-register below.
            nck2 = (w - 1 + TCH - 1) // TCH

            def rest_chunk(c, carry):
                sCl, sCr = carry
                r0 = c * TCH
                ilh = ld(IlHF[pl.ds(n1 - w + r0, TCH), :, pl.ds(w, C), :])
                clr = ld(Cl[pl.ds(1 + r0, TCH), NOCHILD, pl.ds(0, C), :])
                sCl = _stream_add(sCl, ilh + clr[:, None], is_max)
                cre = ld(CrEF[pl.ds(n1 - w + r0, TCH), 0, pl.ds(w, C), :])
                irr = ld(Ir[pl.ds(1 + r0, TCH), :, pl.ds(0, C), :])
                sCr = _stream_add(sCr, irr + cre[:, None], is_max)
                return sCl, sCr

            sCl, sCr = lax.fori_loop(
                0, nck2, rest_chunk,
                (_stream_init((2, C, BT), is_max),
                 _stream_init((2, C, BT), is_max)),
            )
            cl_rest = _stream_fin(sCl, is_max)
            cr_rest = _stream_fin(sCr, is_max)
            cl_new = plus(cl_rest,
                          il_new + ld(Cl[0, NOCHILD, pl.ds(0, C), :])[None])
            cre0 = ld(CrEF[n1 - 1, 0, pl.ds(w, C), :])
            cr_new = plus(cr_rest, ir_new + cre0[None])

            root_keep = (i_iota != 0) | (lengths[None, :] == w)
            cr_new = jnp.where(valid & root_keep[None], cr_new, NEGINF)
            cl_new = jnp.where(valid, cl_new, NEGINF)
            Ir[w, :, pl.ds(0, C), :] = st(ir_new)
            Cr[w, :, pl.ds(0, C), :] = st(cr_new)
            Cl[w, :, pl.ds(0, C), :] = st(cl_new)
            ClKF[n1 - 1 - w, :, pl.ds(w, C), :] = st(cl_new)
            CrEF[n1 - 1 - w, 0, pl.ds(w, C), :] = st(cr_new[NOCHILD])

            out_acc = jnp.where(lengths == w, cr_new[NOCHILD, 0, :],
                                out_acc)
            return out_acc

        return w_body

    out = out0
    for w_lo, w_hi, C in _width_bands(n1, n1r):
        out = lax.fori_loop(w_lo, w_hi, band_body(C), out)
    return out


def _inside_kernel_v3(n1, n1r, ip, fr, is_max,
                      attL_ref, attR_ref, seedR_ref, seedL_ref, len_ref,
                      out_ref, Cr, Cl, Ir, ClKF, CrEF, IlHF):
    out_ref[0, :] = _inside_fill_v3(
        n1, n1r, ip, fr, is_max, attL_ref, attR_ref, seedR_ref, seedL_ref,
        len_ref, Cr, Cl, Ir, None, ClKF, CrEF, IlHF,
    )


def _inside_kernel_v3_save(n1, n1r, ip, fr, is_max,
                           attL_ref, attR_ref, seedR_ref, seedL_ref,
                           len_ref, out_ref, outCr, outCl, outIr, outIl,
                           ClKF, CrEF, IlHF):
    """Save variant: the row-padded charts AND the three flipped
    end-indexed layouts are output refs — the v4 outside consumes the
    flips directly (they are exactly the E-layouts its chunked pushes
    need), so the backward requires no XLA-side re-staging at all."""
    out_ref[0, :] = _inside_fill_v3(
        n1, n1r, ip, fr, is_max, attL_ref, attR_ref, seedR_ref, seedL_ref,
        len_ref, outCr, outCl, outIr, outIl, ClKF, CrEF, IlHF,
    )


def _inside_kernel_v2(n1, n1r, ip, is_max,
                      attL_ref, attR_ref, seedR_ref, seedL_ref, len_ref,
                      out_ref, Cr, Cl, Ir, ClKF, CrEF, IlHF):
    out_ref[0, :] = _inside_fill_v2(
        n1, n1r, ip, is_max, attL_ref, attR_ref, seedR_ref, seedL_ref,
        len_ref, Cr, Cl, Ir, None, ClKF, CrEF, IlHF,
    )


def _inside_kernel_v2_save(n1, n1r, ip, is_max,
                           attL_ref, attR_ref, seedR_ref, seedL_ref,
                           len_ref, out_ref, outCr, outCl, outIrX, outIl,
                           ClKF, CrEF, IlHF):
    """Save variant: plain charts are output refs (outIrX has the extra
    row; the wrapper trims it)."""
    out_ref[0, :] = _inside_fill_v2(
        n1, n1r, ip, is_max, attL_ref, attR_ref, seedR_ref, seedL_ref,
        len_ref, outCr, outCl, outIrX, outIl, ClKF, CrEF, IlHF,
    )


def _inside_kernel(n1, n1r, is_max,
                   attL_ref, attR_ref, seedR_ref, seedL_ref, len_ref,
                   out_ref, Cr, Cl, Ir, Il, padA, padB):
    out_ref[0, :] = _inside_fill(
        n1, n1r, is_max, attL_ref, attR_ref, seedR_ref, seedL_ref,
        len_ref, Cr, Cl, Ir, Il, padA, padB,
    )


def _inside_kernel_save(n1, n1r, is_max,
                        attL_ref, attR_ref, seedR_ref, seedL_ref, len_ref,
                        out_ref, Cr, Cl, Ir, Il, padA, padB):
    """Variant whose charts ARE output refs: the fill works directly in
    the output VMEM blocks, so saving residuals for the backward costs
    nothing beyond the HBM write-back of the blocks."""
    out_ref[0, :] = _inside_fill(
        n1, n1r, is_max, attL_ref, attR_ref, seedR_ref, seedL_ref,
        len_ref, Cr, Cl, Ir, Il, padA, padB,
    )


# ---------------------------------------------------------------------------
# backward (outside) kernel
# ---------------------------------------------------------------------------


def _outside_fill(n1, n1r, is_max,
                  attL_ref, attR_ref, lengths, gout, logz,
                  Cr, Cl, Ir, Il,
                  gattL_ref, gattR_ref, gseedR_ref, gseedL_ref,
                  OCr, OCl, OIr, OIl,
                  SCr=None, SCl=None, SIr=None, SIl=None):
    """Outside pass over inside charts, walking widths downward.

    Adjoints ``O*`` are log-domain outside scores. For the log semiring
    the gradient of logZ w.r.t. a log-potential is
    ``exp(inside + outside - logZ)``; for the max semiring it is the
    on-best-path indicator. The incoming cotangent ``gout`` scales the
    final gradients. The inside charts (``Cr/Cl/Ir/Il``) are read-only
    here; they may carry extra padding rows beyond ``n1`` (never read).

    Layout: charts and adjoints share a column capacity ``cp``
    (positions; NEGINF beyond the valid span) — so every
    diagonal-shifted read/accumulate of the reference's stripe trick is
    a direct dynamic-slice (read or RMW) with no staging pads. Under
    width-banding every shifted access spans at most ``n1 + 6``
    columns, so ``cp >= round8(n1 + 7)`` suffices. Shifted
    accumulations may land in the padding region; those cells are never
    read (they correspond to masked positions).

    ``S*``: optional scaled-sum buffers switching the matching adjoint
    table to the (max, scaled sum) representation of :func:`_ms_acc` —
    each of the 7 RMW pushes per (w, t) then costs one exp and NO log
    (vs logaddexp's exp + log1p), and a row pays its single log at its
    one finalization read. An adjoint row is only ever read at its own
    width iteration (pushes flow strictly from larger to smaller
    widths, except OIr[w] which receives its last push earlier in the
    SAME iteration), so finalization is a pure read — no write-back.
    ``SCr/SCl`` cover the O_C tables (5 of the 7 pushes), ``SIr/SIl``
    the O_I tables; pass only what fits VMEM.

    ``lengths``/``gout``/``logz`` are ``[BT]`` arrays (logz = the log
    partition or max score).
    """
    cp = OCr.shape[2]
    if is_max:  # max pushes are already log-free; (m,s) would add work
        SCr = SCl = SIr = SIl = None
    # Measured (round 3, same-window A/B): keeping the c2/c4/tmp channel
    # combines in (m,s) form wins at len64 (+7-10%: 226K -> 241-249K
    # sent/s) but LOSES ~10% at len30 (1.50-1.70M -> 1.36-1.52M): at
    # small bands the doubled (m,s)-pair slab traffic outweighs the
    # saved log1p. Gate the combine representation on chart size; the
    # (m,s) push targets themselves stay on whenever the selector
    # enables them.
    ms_comb = SCr is not None and n1 >= MS_COMBINE_MIN_N1

    def plus(a, b):
        return jnp.maximum(a, b) if is_max else jnp.logaddexp(a, b)

    def rmw(T, S, idx, x):
        """``T[idx] ⊕= x`` (semiring accumulate, (m,s)-aware)."""
        if S is None:
            T[idx] = plus(T[idx], x)
        else:
            m2, s2 = _ms_acc(T[idx], S[idx], x)
            T[idx] = m2
            S[idx] = s2

    def rmw2(T, S, idx, mx, sx):
        """``T[idx] ⊕= (mx, sx)`` — accumulate an incoming (max,
        scaled-sum) pair from :func:`_pair_ms` without ever taking a
        log (requires an (m,s) target)."""
        m2, s2 = _ms_acc2(T[idx], S[idx], mx, sx)
        T[idx] = m2
        S[idx] = s2

    def fin(T, S, idx):
        """Read ``T[idx]`` as a log-domain value."""
        if S is None:
            return T[idx]
        return _ms_fin(T[idx], S[idx])

    _all = slice(None)
    neg_all = jnp.full(OCr.shape, NEGINF, jnp.float32)
    OCr[:, :, :, :] = neg_all
    OCl[:, :, :, :] = neg_all
    OIr[:, :, :, :] = neg_all
    OIl[:, :, :, :] = neg_all
    zero_all = jnp.zeros(OCr.shape, jnp.float32)
    if SCr is not None:
        SCr[:, :, :, :] = zero_all
        SCl[:, :, :, :] = zero_all
    if SIr is not None:
        SIr[:, :, :, :] = zero_all
        SIl[:, :, :, :] = zero_all

    def grad_of(inside, outside):
        if is_max:
            ind = inside + outside >= logz[None, None, :] - _MAX_EPS
            return jnp.where(ind, 1.0, 0.0) * gout[None, None, :]
        return (
            jnp.exp(jnp.minimum(inside + outside - logz[None, None, :], 88.0))
            * gout[None, None, :]
        )

    def band_body(C, w_hi):
        """Width-loop body with STATIC column count C >= n1 - w (see
        _width_bands): all split-point reads and adjoint RMWs narrow
        from n1r to C columns. Adjoint values at invalid positions
        (i >= n1 - w) are semiring-zero by induction — pushes into them
        carry NEGINF — so narrowed pushes drop only no-ops, and rows
        are consumed at exactly the C that still covers their valid
        span."""
        i_iota = lax.broadcasted_iota(jnp.int32, (C, BT), 0)
        sel_nc = lax.broadcasted_iota(jnp.int32, (2, C, BT), 0) == NOCHILD

        def w_body(wrev, _):
            w = w_hi - 1 - wrev  # descending within the band

            # -- final-cell init: O_Cr[length, 0, NC] = one ---------------
            at_final = (lengths[None, :] == w) & (i_iota == 0)
            ocr_w = fin(OCr, SCr, (w, _all, pl.ds(0, C), _all))
            ocr_w = jnp.where(
                sel_nc & at_final[None], jnp.maximum(ocr_w, 0.0), ocr_w
            )
            # The forward masks Cr[w, 0] to semiring-zero unless
            # w == length (single-root constraint); the adjoint of a
            # masked cell must not propagate into its inputs.
            root_keep = (i_iota != 0) | (lengths[None, :] == w)
            ocr_w = jnp.where(root_keep[None], ocr_w, NEGINF)
            if SCr is None:
                # plain mode keeps the write-back; (m,s) rows are never
                # re-read after their own width iteration, so skip it.
                OCr[w, :, pl.ds(0, C), :] = ocr_w
            ocl_w = fin(OCl, SCl, (w, _all, pl.ds(0, C), _all))

            # ==== adjoints of the complete-span updates at width w ====
            # Cl[w,i,v] = sum_t Il[w-t,i+t,v] * Cl[t,i,NC]
            # Cr[w,i,v] = sum_t Ir[t+1,i,v] * Cr[w-1-t,i+1+t,NC]
            def t_body2(t, _):
                il_wt = Il[w - t, :, pl.ds(t, C), :]
                cr_wt_nc = Cr[w - 1 - t, NOCHILD, pl.ds(1 + t, C), :]
                cl_t = Cl[t, NOCHILD, pl.ds(0, C), :][None]
                ir_t1 = Ir[t + 1, :, pl.ds(0, C), :]
                # O_Il[w-t, i+t, v] ⊕= O_Cl[w,i,v] + Cl[t,i,NC]
                rmw(OIl, SIl, (w - t, _all, pl.ds(t, C), _all),
                    ocl_w + cl_t)
                # O_Cl[t, i, NC] ⊕= sum_v O_Cl[w,i,v] + Il[w-t,i+t,v]
                c2 = ocl_w + il_wt
                if not ms_comb:
                    rmw(OCl, SCl, (t, NOCHILD, pl.ds(0, C), _all),
                        plus(c2[0], c2[1]))
                else:
                    # channel combine stays in (m,s) form: no log here
                    rmw2(OCl, SCl, (t, NOCHILD, pl.ds(0, C), _all),
                         *_pair_ms(c2[0], c2[1]))
                # O_Ir[t+1, i, v] ⊕= O_Cr[w,i,v] + Cr[w-1-t,i+1+t,NC]
                rmw(OIr, SIr, (t + 1, _all, pl.ds(0, C), _all),
                    ocr_w + cr_wt_nc[None])
                # O_Cr[w-1-t, i+1+t, NC] ⊕= sum_v O_Cr[w,i,v] + Ir[t+1,i,v]
                c4 = ocr_w + ir_t1
                if not ms_comb:
                    rmw(OCr, SCr,
                        (w - 1 - t, NOCHILD, pl.ds(1 + t, C), _all),
                        plus(c4[0], c4[1]))
                else:
                    rmw2(OCr, SCr,
                         (w - 1 - t, NOCHILD, pl.ds(1 + t, C), _all),
                         *_pair_ms(c4[0], c4[1]))
                return 0

            lax.fori_loop(0, w, t_body2, 0)

            # ==== adjoints of the incomplete-span updates at width w ====
            # Il[w,i,v] = inner_l[w,i] + attL[w,i,v]. The attach-grad
            # rows are written FULL width (columns >= C read
            # semiring-zero adjoints and produce exact 0 gradients).
            oil_full = fin(OIl, SIl, (w, _all, pl.ds(0, n1r), _all))
            oir_full = fin(OIr, SIr, (w, _all, pl.ds(0, n1r), _all))
            il_w = Il[w, :, pl.ds(0, n1r), :]
            ir_w = Ir[w, :, pl.ds(0, n1r), :]
            gattL_ref[w, :, :, :] = grad_of(il_w, oil_full)
            gattR_ref[w, :, :, :] = grad_of(ir_w, oir_full)

            oil_w = oil_full[:, :C, :]
            oir_w = oir_full[:, :C, :]
            tl = oil_w + attL_ref[w, :, pl.ds(0, C), :]
            tr = oir_w + attR_ref[w, :, pl.ds(0, C), :]
            if ms_comb:
                # (m,s) targets: keep the valence combine as an (m,s)
                # pair too — adding chart scores to the max alone is the
                # log-domain offset, so the t_body3 pushes stay log-free
                tml, tsl = _pair_ms(tl[0], tl[1])  # [C, BT]
                tmr, tsr = _pair_ms(tr[0], tr[1])
            else:
                tmp_l = plus(tl[0], tl[1])  # [C, BT]
                tmp_r = plus(tr[0], tr[1])

            def t_body3(t, _):
                cl_pair = Cl[w - 1 - t, :, pl.ds(1 + t, C), :]
                cr_nc = Cr[t, NOCHILD, pl.ds(0, C), :]
                cr_hc = Cr[t, HASCHILD, pl.ds(0, C), :]
                # O_Cr[t, i, NC] ⊕= tmp_l + Cl[w-1-t,i+1+t,HC]
                # O_Cr[t, i, HC] ⊕= tmp_r + Cl[w-1-t,i+1+t,NC]
                # O_Cl[w-1-t, i+1+t, HC] ⊕= tmp_l + Cr[t,i,NC]
                # O_Cl[w-1-t, i+1+t, NC] ⊕= tmp_r + Cr[t,i,HC]
                if ms_comb:
                    rmw2(OCr, SCr, (t, NOCHILD, pl.ds(0, C), _all),
                         tml + cl_pair[HASCHILD], tsl)
                    rmw2(OCr, SCr, (t, HASCHILD, pl.ds(0, C), _all),
                         tmr + cl_pair[NOCHILD], tsr)
                    mchan = [None, None]
                    schan = [None, None]
                    mchan[HASCHILD] = tml + cr_nc
                    schan[HASCHILD] = tsl
                    mchan[NOCHILD] = tmr + cr_hc
                    schan[NOCHILD] = tsr
                    rmw2(OCl, SCl,
                         (w - 1 - t, _all, pl.ds(1 + t, C), _all),
                         jnp.stack(mchan), jnp.stack(schan))
                else:
                    rmw(OCr, SCr, (t, NOCHILD, pl.ds(0, C), _all),
                        tmp_l + cl_pair[HASCHILD])
                    rmw(OCr, SCr, (t, HASCHILD, pl.ds(0, C), _all),
                        tmp_r + cl_pair[NOCHILD])
                    chans = [None, None]
                    chans[HASCHILD] = tmp_l + cr_nc
                    chans[NOCHILD] = tmp_r + cr_hc
                    rmw(OCl, SCl, (w - 1 - t, _all, pl.ds(1 + t, C), _all),
                        jnp.stack(chans))
                return 0

            lax.fori_loop(0, w, t_body3, 0)
            return 0

        return w_body

    for w_lo, w_hi, C in reversed(_width_bands(n1, n1r)):
        lax.fori_loop(0, w_hi - w_lo, band_body(C, w_hi), 0)

    # width-0 rows of the attach grads are never produced by the loop
    gattL_ref[0, :, :, :] = jnp.zeros((2, n1r, BT), jnp.float32)
    gattR_ref[0, :, :, :] = jnp.zeros((2, n1r, BT), jnp.float32)

    # seed (STOP decision) gradients at width 0
    gseedR_ref[:] = grad_of(Cr[0, :, pl.ds(0, n1r), :],
                            fin(OCr, SCr, (0, _all, pl.ds(0, n1r), _all)))
    gseedL_ref[:] = grad_of(Cl[0, :, pl.ds(0, n1r), :],
                            fin(OCl, SCl, (0, _all, pl.ds(0, n1r), _all)))


def _outside_kernel(n1, n1r, cp, is_max,
                    attL_ref, attR_ref, len_ref,
                    gout_ref, logz_ref, Cr, Cl, Ir, Il,
                    gattL_ref, gattR_ref, gseedR_ref, gseedL_ref,
                    OCr, OCl, OIr, OIl):
    """Standalone outside kernel over charts SAVED by the forward (the
    fallback when the fused fwd+bwd kernel does not fit VMEM)."""
    del cp  # implied by the adjoint buffer shapes
    _outside_fill(
        n1, n1r, is_max, attL_ref, attR_ref,
        len_ref[0, :], gout_ref[0, :], logz_ref[0, :],
        Cr, Cl, Ir, Il,
        gattL_ref, gattR_ref, gseedR_ref, gseedL_ref,
        OCr, OCl, OIr, OIl,
    )


def _fused_kernel(n1, n1r, ip, fr, is_max, ms_tables,
                  attL_ref, attR_ref, seedR_ref, seedL_ref, len_ref,
                  out_ref, gattL_ref, gattR_ref, gseedR_ref, gseedL_ref,
                  Cr, Cl, Ir, Il, ClKF, CrEF, IlHF,
                  OCr, OCl, OIr, OIl, *ms_refs):
    """Fused forward + backward in ONE launch: the v3 banded inside fill
    leaves all four charts resident in VMEM and the banded outside runs
    straight over them with ``gout = 1`` — gradients are linear in the
    cotangent, so the true cotangent is applied as a cheap elementwise
    scale in the VJP wrapper.

    vs the save-charts path this removes (per launch) the 4-chart HBM
    write + re-read AND the XLA column-pad staging copies, and the VJP
    residuals shrink from 4 charts to the 2 attach-grad tables. The
    chart buffers are allocated in the outside's tight column layout
    (``cp = round8(n1 + 7)``, enough under width-banding); the fill
    only touches the first ``n1r`` columns. The tight layout is safe
    here precisely because there is no pallas->pallas chart hand-off
    (the hand-off is what crashed the v5e worker in round 3; see
    ``_outside_cp``).

    ``ms_tables`` ∈ {0, 2, 4}: how many adjoint tables carry the
    (max, scaled-sum) representation (see :func:`_ms_acc`) — 2 covers
    the O_C pair (5 of the 7 pushes per (w, t)), 4 adds the O_I pair.
    Each costs one extra adjoint-sized VMEM scratch buffer;
    :func:`_fused_ms_tables` picks the most that fits.
    """
    SCr = SCl = SIr = SIl = None
    if ms_tables >= 2:
        SCr, SCl = ms_refs[0], ms_refs[1]
    if ms_tables >= 4:
        SIr, SIl = ms_refs[2], ms_refs[3]
    out = _inside_fill_v3(
        n1, n1r, ip, fr, is_max, attL_ref, attR_ref, seedR_ref, seedL_ref,
        len_ref, Cr, Cl, Ir, Il, ClKF, CrEF, IlHF,
    )
    out_ref[0, :] = out
    ones = jnp.ones((BT,), jnp.float32)
    _outside_fill(
        n1, n1r, is_max, attL_ref, attR_ref,
        len_ref[0, :], ones, out,
        Cr, Cl, Ir, Il,
        gattL_ref, gattR_ref, gseedR_ref, gseedL_ref,
        OCr, OCl, OIr, OIl,
        SCr=SCr, SCl=SCl, SIr=SIr, SIl=SIl,
    )


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------


def _prep_inputs(dec, attach, n1r):
    """Build diagonal-major attach tables and STOP seeds, batch-last.

    attL[w, v, i, b] = attach[b, i+w, i, v] + dec[b, i+w, LEFT, v, GO]
    attR[w, v, i, b] = attach[b, i, i+w, v] + dec[b, i, RIGHT, v, GO]
    seedR[v, i, b]   = dec[b, i, RIGHT, v, STOP]; seedL analogous.
    The position axis is zero-padded (with NEGINF) to ``n1r``.
    """
    B, n1 = attach.shape[:2]
    att_l = attach + dec[:, :, None, LEFT, :, GO]
    att_r = attach + dec[:, :, None, RIGHT, :, GO]
    w_idx = jnp.arange(n1)[:, None]
    i_idx = jnp.arange(n1)[None, :]
    h = jnp.minimum(i_idx + w_idx, n1 - 1)
    valid = ((i_idx + w_idx) <= (n1 - 1))[None, :, :, None]
    attL = jnp.where(valid, att_l[:, h, i_idx, :], NEGINF)  # [B, w, i, v]
    attR = jnp.where(valid, att_r[:, i_idx, h, :], NEGINF)
    attL = jnp.transpose(attL, (1, 3, 2, 0))  # [w, v, i, B]
    attR = jnp.transpose(attR, (1, 3, 2, 0))
    seedR = jnp.transpose(dec[:, :, RIGHT, :, STOP], (2, 1, 0))  # [v, i, B]
    seedL = jnp.transpose(dec[:, :, LEFT, :, STOP], (2, 1, 0))
    pad_i = [(0, 0), (0, 0), (0, n1r - n1), (0, 0)]
    attL = jnp.pad(attL, pad_i, constant_values=NEGINF)
    attR = jnp.pad(attR, pad_i, constant_values=NEGINF)
    seedR = jnp.pad(seedR, pad_i[1:], constant_values=NEGINF)
    seedL = jnp.pad(seedL, pad_i[1:], constant_values=NEGINF)
    return attL, attR, seedR, seedL


def _unprep_grads(gattL, gattR, gseedR, gseedL, n1):
    """Map diagonal-layout grads back to (dec, attach) grads."""
    # to [B, w, i, v] (trim the position padding)
    gL = jnp.transpose(gattL[:, :, :n1, :], (3, 0, 2, 1))
    gR = jnp.transpose(gattR[:, :, :n1, :], (3, 0, 2, 1))
    B = gL.shape[0]
    h_idx = jnp.arange(n1)[:, None]
    c_idx = jnp.arange(n1)[None, :]
    # left arcs: head h > child c: gL[w=h-c, i=c]
    wl = jnp.clip(h_idx - c_idx, 0, n1 - 1)
    g_att_l = jnp.where(
        (h_idx > c_idx)[None, :, :, None], gL[:, wl, c_idx, :], 0.0
    )
    # right arcs: head h < child c: gR[w=c-h, i=h]
    wr = jnp.clip(c_idx - h_idx, 0, n1 - 1)
    g_att_r = jnp.where(
        (h_idx < c_idx)[None, :, :, None], gR[:, wr, h_idx, :], 0.0
    )
    g_attach = g_att_l + g_att_r  # [B, h, c, v]

    g_dec = jnp.zeros((B, n1, 2, 2, 2), jnp.float32)
    # dec[h, dir, v, GO] is shared by every arc of head h in that
    # direction, so its grad sums the arc grads over the child axis.
    g_dec = g_dec.at[:, :, LEFT, :, GO].set(g_att_l.sum(2))
    g_dec = g_dec.at[:, :, RIGHT, :, GO].set(g_att_r.sum(2))
    g_dec = g_dec.at[:, :, RIGHT, :, STOP].set(
        jnp.transpose(gseedR[:, :n1, :], (2, 1, 0))
    )
    g_dec = g_dec.at[:, :, LEFT, :, STOP].set(
        jnp.transpose(gseedL[:, :n1, :], (2, 1, 0))
    )
    return g_dec, g_attach


def _specs(n1, n1r):
    att_spec = pl.BlockSpec((n1, 2, n1r, BT), lambda g: (0, 0, 0, g),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((2, n1r, BT), lambda g: (0, 0, g),
                             memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, BT), lambda g: (0, g),
                            memory_space=pltpu.VMEM)
    return att_spec, seed_spec, row_spec


# Cap the per-launch batch so the kernel grid stays at <= 2 tiles: larger
# grids at big n1 have faulted/hung the v5e worker near the VMEM ceiling.
_MAX_LAUNCH_B = 2 * BT


def _chunked(call, n_out, *args, chunk_b: int = _MAX_LAUNCH_B):
    """Split args along their (trailing) batch axis into launch chunks."""
    B = args[0].shape[-1]
    outs = []
    for start in range(0, B, chunk_b):
        chunk = [
            jax.lax.slice_in_dim(
                a, start, min(start + chunk_b, B), axis=a.ndim - 1
            )
            for a in args
        ]
        outs.append(call(*chunk))
    if n_out == 1:
        return jnp.concatenate(outs, axis=-1)
    return tuple(
        jnp.concatenate([o[i] for o in outs], axis=-1) for i in range(n_out)
    )


# Vectorized-width inside kernel (v2). Flip to False to fall back to the
# split-point-loop (v1) fill.
USE_V2_INSIDE = True

_V2_BUDGET = 86 * 1024 * 1024


def _v2_vmem_bytes(n1: int, save: bool, grid: int) -> int:
    """Per-launch VMEM estimate for the v2 inside kernel.

    In/out blocks are double-buffered by the pipeline when grid > 1;
    scratch buffers are not. The 3 flipped dual-layout buffers are
    [2*n1, 2, ip, BT] scratch.
    """
    n1r = _round8(n1)
    ip = _round8(n1 - 1 + n1r)
    chart = n1 * 2 * n1r * BT * 4
    flips = 3 * (2 * n1) * 2 * ip * BT * 4
    seeds_rows = 2 * (2 * n1r * BT * 4) + 2 * BT * 4
    buf = 2 if grid > 1 else 1
    blocks = 2 * chart + seeds_rows  # attL, attR in-blocks
    if save:
        # charts ARE out blocks (two have one extra row)
        blocks += 4 * chart + 2 * (2 * n1r * BT * 4)
        scratch = flips
    else:
        blocks += BT * 4  # out row
        scratch = flips + 3 * chart + 2 * (2 * n1r * BT * 4)
    return buf * blocks + scratch


def _v2_max_launch(n1: int, save: bool) -> int:
    """Largest per-launch batch (0 if v2 cannot fit): prefer the 2-tile
    double-buffered launch; at big n1 fall back to grid=1 single-buffered
    128-lane launches (the blocks stop double-buffering, freeing ~half
    the block VMEM at the cost of pipelining)."""
    if _v2_vmem_bytes(n1, save, grid=2) <= _V2_BUDGET:
        return _MAX_LAUNCH_B
    if _v2_vmem_bytes(n1, save, grid=1) <= _V2_BUDGET:
        return BT
    return 0


# Chunked streaming inside kernel (v3): preferred over v2.
USE_V3_INSIDE = True


def _v3_vmem_bytes(n1: int, save: bool, grid: int) -> int:
    """Per-launch VMEM estimate for the v3 inside kernel (row-padded
    charts nx = n1 + TCH; flip buffers fr rows instead of v2's 2*n1)."""
    n1r = _round8(n1)
    ip = _flip_cols(n1)
    nx = n1 + TCH
    fr = n1 + TCH  # no row-tiling constraint; match v4's block rows exactly
    chart = nx * 2 * n1r * BT * 4
    flips = 5 * fr * ip * BT * 4  # ClKF + IlHF (2 valences) + CrEF (NC)
    att = 2 * (n1 * 2 * n1r * BT * 4)
    seeds_rows = 2 * (2 * n1r * BT * 4) + 2 * BT * 4
    buf = 2 if grid > 1 else 1
    blocks = att + seeds_rows
    if save:
        # charts AND flips are out blocks (flips feed the v4 outside)
        blocks += 4 * chart + flips + BT * 4
        scratch = 0
    else:
        blocks += BT * 4
        scratch = flips + 3 * chart
    return buf * blocks + scratch


def _v3_max_launch(n1: int, save: bool) -> int:
    if n1 < 2 + TCH:  # tiny charts: padding rows would dominate; use v2
        return 0
    if _v3_vmem_bytes(n1, save, grid=2) <= _V2_BUDGET:
        return _MAX_LAUNCH_B
    if _v3_vmem_bytes(n1, save, grid=1) <= _V2_BUDGET:
        return BT
    return 0


def _pallas_inside_call_v3(attL, attR, seedR, seedL, lengths, *, is_max,
                           interpret, save_charts: bool = False):
    n1, _, n1r, B = attL.shape
    ip = _flip_cols(n1)
    fr = n1 + TCH  # no row-tiling constraint; match v4's block rows exactly
    nx = n1 + TCH
    grid = (B // BT,)
    att_spec, seed_spec, row_spec = _specs(n1, n1r)
    # chart STORAGE dtype (see CHART_STORE_DTYPE); the save path hands
    # its charts to the v4 outside, whose layout contract is f32
    cdt = CHART_STORE_DTYPE if not save_charts else jnp.float32
    flip = lambda v: pltpu.VMEM((fr, v, ip, BT), cdt)
    chart = lambda: pltpu.VMEM((nx, 2, n1r, BT), cdt)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    cost = pl.CostEstimate(
        flops=12 * n1 ** 3 * B,
        bytes_accessed=(2 * n1 * n1 * 2 + 4 * n1 * 2 + 3) * B * 4,
        transcendentals=0 if is_max else 2 * n1 ** 3 * B,
    )
    if save_charts:
        kernel = functools.partial(_inside_kernel_v3_save, n1, n1r, ip, fr,
                                   is_max)
        chart_spec = pl.BlockSpec(
            (nx, 2, n1r, BT), lambda g: (0, 0, 0, g),
            memory_space=pltpu.VMEM,
        )
        chart_shape = jax.ShapeDtypeStruct((nx, 2, n1r, B), jnp.float32)
        # charts keep their TCH padding rows; the outside reads the
        # padded layout directly (rows >= n1 are never touched)
        out, Cr, Cl, Ir, Il = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[att_spec, att_spec, seed_spec, seed_spec, row_spec],
            out_specs=(row_spec,) + (chart_spec,) * 4,
            out_shape=(jax.ShapeDtypeStruct((1, B), jnp.float32),)
            + (chart_shape,) * 4,
            scratch_shapes=[flip(2), flip(1), flip(2)],
            compiler_params=params,
            interpret=interpret,
            cost_estimate=cost,
        )(attL, attR, seedR, seedL, lengths)
        return out[0], (Cr, Cl, Ir, Il)
    kernel = functools.partial(_inside_kernel_v3, n1, n1r, ip, fr, is_max)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[att_spec, att_spec, seed_spec, seed_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[chart(), chart(), chart(),
                        flip(2), flip(1), flip(2)],
        compiler_params=params,
        interpret=interpret,
        cost_estimate=cost,
    )(attL, attR, seedR, seedL, lengths)
    return out[0], None


def _pallas_inside_call_v2(attL, attR, seedR, seedL, lengths, *, is_max,
                           interpret, save_charts: bool = False):
    n1, _, n1r, B = attL.shape
    ip = _round8(n1 - 1 + n1r)
    grid = (B // BT,)
    att_spec, seed_spec, row_spec = _specs(n1, n1r)
    flip = lambda: pltpu.VMEM((2 * n1, 2, ip, BT), jnp.float32)
    chart = lambda rows: pltpu.VMEM((rows, 2, n1r, BT), jnp.float32)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    cost = pl.CostEstimate(
        flops=12 * n1 ** 3 * B,
        bytes_accessed=(2 * n1 * n1 * 2 + 4 * n1 * 2 + 3) * B * 4,
        transcendentals=0 if is_max else 2 * n1 ** 3 * B,
    )
    if save_charts:
        kernel = functools.partial(_inside_kernel_v2_save, n1, n1r, ip,
                                   is_max)
        chart_spec = lambda rows: pl.BlockSpec(
            (rows, 2, n1r, BT), lambda g: (0, 0, 0, g),
            memory_space=pltpu.VMEM,
        )
        out, Cr, ClX, IrX, Il = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[att_spec, att_spec, seed_spec, seed_spec, row_spec],
            out_specs=(row_spec, chart_spec(n1), chart_spec(n1 + 1),
                       chart_spec(n1 + 1), chart_spec(n1)),
            out_shape=(
                jax.ShapeDtypeStruct((1, B), jnp.float32),
                jax.ShapeDtypeStruct((n1, 2, n1r, B), jnp.float32),
                jax.ShapeDtypeStruct((n1 + 1, 2, n1r, B), jnp.float32),
                jax.ShapeDtypeStruct((n1 + 1, 2, n1r, B), jnp.float32),
                jax.ShapeDtypeStruct((n1, 2, n1r, B), jnp.float32),
            ),
            scratch_shapes=[flip(), flip(), flip()],
            compiler_params=params,
            interpret=interpret,
            cost_estimate=cost,
        )(attL, attR, seedR, seedL, lengths)
        return out[0], (Cr, ClX[:n1], IrX[:n1], Il)
    kernel = functools.partial(_inside_kernel_v2, n1, n1r, ip, is_max)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[att_spec, att_spec, seed_spec, seed_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[chart(n1), chart(n1 + 1), chart(n1 + 1),
                        flip(), flip(), flip()],
        compiler_params=params,
        interpret=interpret,
        cost_estimate=cost,
    )(attL, attR, seedR, seedL, lengths)
    return out[0], None


def _pallas_inside_call(attL, attR, seedR, seedL, lengths, *, is_max,
                        interpret, save_charts: bool = False):
    B_total = attL.shape[-1]
    n1 = attL.shape[0]
    v3_launch = _v3_max_launch(n1, save_charts) if USE_V3_INSIDE else 0
    v2_launch = _v2_max_launch(n1, save_charts) if USE_V2_INSIDE else 0
    launch_b = v3_launch or v2_launch or _MAX_LAUNCH_B
    n_charts = 4
    if B_total > launch_b:
        if save_charts:
            def one(*a):
                out, charts = _pallas_inside_call(
                    *a, is_max=is_max, interpret=interpret,
                    save_charts=True,
                )
                return (out,) + charts

            outs = _chunked(
                one, 1 + n_charts, attL, attR, seedR, seedL, lengths,
                chunk_b=launch_b,
            )
            return outs[0], tuple(outs[1:])
        out = _chunked(
            lambda *a: _pallas_inside_call(*a, is_max=is_max,
                                           interpret=interpret)[0],
            1, attL, attR, seedR, seedL, lengths, chunk_b=launch_b,
        )
        return out, None
    if v3_launch:
        return _pallas_inside_call_v3(
            attL, attR, seedR, seedL, lengths, is_max=is_max,
            interpret=interpret, save_charts=save_charts,
        )
    if v2_launch:
        return _pallas_inside_call_v2(
            attL, attR, seedR, seedL, lengths, is_max=is_max,
            interpret=interpret, save_charts=save_charts,
        )
    n1, _, n1r, B = attL.shape
    grid = (B // BT,)
    chart = lambda: pltpu.VMEM((n1, 2, n1r, BT), jnp.float32)
    pad = lambda: pltpu.VMEM((2, _round8(n1 + n1r), BT), jnp.float32)
    att_spec, seed_spec, row_spec = _specs(n1, n1r)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    cost = pl.CostEstimate(
        flops=12 * n1 ** 3 * B,
        bytes_accessed=(2 * n1 * n1 * 2 + 4 * n1 * 2 + 3) * B * 4,
        transcendentals=0 if is_max else 6 * n1 ** 3 * B,
    )
    if save_charts:
        kernel = functools.partial(_inside_kernel_save, n1, n1r, is_max)
        chart_shape = jax.ShapeDtypeStruct((n1, 2, n1r, B), jnp.float32)
        out, Cr, Cl, Ir, Il = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[att_spec, att_spec, seed_spec, seed_spec, row_spec],
            out_specs=(row_spec, att_spec, att_spec, att_spec, att_spec),
            out_shape=(jax.ShapeDtypeStruct((1, B), jnp.float32),
                       chart_shape, chart_shape, chart_shape, chart_shape),
            scratch_shapes=[pad(), pad()],
            compiler_params=params,
            interpret=interpret,
            cost_estimate=cost,
        )(attL, attR, seedR, seedL, lengths)
        return out[0], (Cr, Cl, Ir, Il)
    kernel = functools.partial(_inside_kernel, n1, n1r, is_max)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[att_spec, att_spec, seed_spec, seed_spec, row_spec],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((1, B), jnp.float32),
        scratch_shapes=[chart(), chart(), chart(), chart(), pad(), pad()],
        compiler_params=params,
        interpret=interpret,
        cost_estimate=cost,
    )(attL, attR, seedR, seedL, lengths)
    return out[0], None


def _outside_cp(n1: int) -> int:
    """Padded position width for the outside layout: max shift is
    ``1 + t <= n1 - 1``, so reads/writes span ``n1 - 1 + n1r`` columns.

    NOTE a tighter bound exists under banding (every access spans
    <= n1 + 6 columns, so ``round8(n1 + 7)`` would be enough and at
    n1 = 65 even removes the column-pad staging copy entirely) — but
    the tight layout, while interpret-correct and passing single-launch
    hardware runs, reproducibly CRASHED the v5e worker inside the
    chunked b1024 stretch benchmark. Reverted to the generous padding
    that is verified stable on hardware; revisit with a local device."""
    return _round8(n1 - 1 + _round8(n1))


def _outside_max_launch(n1: int) -> int:
    """Largest per-launch batch for the outside kernel (0 if over VMEM):
    4 column-padded saved charts + attL/attR + grads as blocks, 4
    column-padded adjoints as scratch."""
    n1r = _round8(n1)
    cp = _outside_cp(n1)
    chart = n1 * 2 * n1r * BT * 4
    pchart = n1 * 2 * cp * BT * 4
    blocks = 2 * chart + 4 * pchart + 2 * chart + 3 * BT * 4 \
        + 2 * (2 * n1r * BT * 4)
    scratch = 4 * pchart
    if 2 * blocks + scratch <= _V2_BUDGET:
        return _MAX_LAUNCH_B
    if blocks + scratch <= 96 * 1024 * 1024:
        return BT
    return 0


def _pallas_outside_call(attL, attR, lengths, gout, logz, charts, *,
                         is_max, interpret):
    B_total = attL.shape[-1]
    n1 = attL.shape[0]
    charts = charts[:4]
    launch_b = _outside_max_launch(n1) or _MAX_LAUNCH_B
    if B_total > launch_b:
        return _chunked(
            lambda aL, aR, le, go, lz, *cs: _pallas_outside_call(
                aL, aR, le, go, lz, cs,
                is_max=is_max, interpret=interpret,
            ),
            4, attL, attR, lengths, gout, logz, *charts,
            chunk_b=launch_b,
        )
    n1, _, n1r, B = attL.shape
    cp = _outside_cp(n1)
    # column-pad the saved charts so shifted reads are direct slices
    # (charts from the v3 inside carry TCH extra rows — the row trim
    # fuses into this same pad copy)
    charts = tuple(
        jnp.pad(c[:n1], [(0, 0), (0, 0), (0, cp - n1r), (0, 0)],
                constant_values=NEGINF)
        for c in charts
    )
    grid = (B // BT,)
    pchart = lambda: pltpu.VMEM((n1, 2, cp, BT), jnp.float32)
    att_spec, seed_spec, row_spec = _specs(n1, n1r)
    pchart_spec = pl.BlockSpec((n1, 2, cp, BT), lambda g: (0, 0, 0, g),
                               memory_space=pltpu.VMEM)
    kernel = functools.partial(_outside_kernel, n1, n1r, cp, is_max)
    gattL, gattR, gseedR, gseedL = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[att_spec, att_spec, row_spec, row_spec, row_spec,
                  pchart_spec, pchart_spec, pchart_spec, pchart_spec],
        out_specs=(att_spec, att_spec, seed_spec, seed_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n1, 2, n1r, B), jnp.float32),
            jax.ShapeDtypeStruct((n1, 2, n1r, B), jnp.float32),
            jax.ShapeDtypeStruct((2, n1r, B), jnp.float32),
            jax.ShapeDtypeStruct((2, n1r, B), jnp.float32),
        ),
        scratch_shapes=[pchart() for _ in range(4)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=24 * n1 ** 3 * B,
            bytes_accessed=(8 * n1 * n1 * 2 + 8 * n1 * 2 + 4) * B * 4,
            transcendentals=0 if is_max else 12 * n1 ** 3 * B,
        ),
    )(attL, attR, lengths, gout, logz, *charts)
    return gattL, gattR, gseedR, gseedL


# Fused fwd+bwd kernel (see _fused_kernel). Flip to False to fall back to
# the save-charts inside + standalone outside pair.
USE_FUSED = True


def _fused_cp(n1: int) -> int:
    """Tight column capacity for the fused kernel's chart/adjoint
    buffers: under width-banding every shifted access spans at most
    ``n1 + 6`` columns (writes at ``1 + t + C - 1 <= n1 + 6``) — the
    same ``round8(n1 + 7)`` bound as the flip buffers, so delegate to
    ``_flip_cols`` to keep the two capacities from drifting apart."""
    return _flip_cols(n1)


def _fused_vmem_bytes(n1: int, grid: int, ms_tables: int = 0) -> int:
    """Per-launch VMEM for the fused kernel: 4 charts (row-padded to
    ``nx``, tight-column ``cp``) + 4 adjoints + 3 flip buffers +
    ``ms_tables`` scaled-sum buffers as scratch; att/seed/len in-blocks
    and value/grad out-blocks."""
    n1r = _round8(n1)
    cp = _fused_cp(n1)
    ip = _flip_cols(n1)
    nx = n1 + TCH
    fr = n1 + TCH
    chart = nx * 2 * cp * BT * 4
    adj = n1 * 2 * cp * BT * 4
    flips = 5 * fr * ip * BT * 4
    att = 2 * (n1 * 2 * n1r * BT * 4)
    seeds = 2 * (2 * n1r * BT * 4)
    rows = 2 * BT * 4  # lengths in, value out
    buf = 2 if grid > 1 else 1
    blocks = att + seeds + att + seeds + rows  # + gatt, gseed out-blocks
    scratch = 4 * chart + (4 + ms_tables) * adj + flips
    return buf * blocks + scratch


def _fused_ms_tables(n1: int, grid: int) -> int:
    """Most (m,s) adjoint tables that fit the launch budget: 4 (both
    O_C and O_I pairs), 2 (O_C only — 5 of the 7 pushes), 0 (plain
    logaddexp), or -1 (the fused kernel does not fit at all). At
    n1 = 65 / BT = 128 the O_C pair fits (≈91 MB) but all four do not."""
    budget = _V2_BUDGET if grid > 1 else 96 * 1024 * 1024
    for ms in (4, 2, 0):
        if _fused_vmem_bytes(n1, grid, ms) <= budget:
            return ms
    return -1


def _fused_max_launch(n1: int) -> int:
    if n1 < 2 + TCH:  # v3 fill gate: tiny charts fall back
        return 0
    if _fused_ms_tables(n1, grid=2) >= 0:
        return _MAX_LAUNCH_B
    if _fused_ms_tables(n1, grid=1) >= 0:
        return BT
    return 0


def _pallas_fused_call(attL, attR, seedR, seedL, lengths, *, is_max,
                       interpret):
    """One launch computing the partition value AND the unscaled
    gradients (cotangent 1). Returns (value[B], gattL, gattR, gseedR,
    gseedL) in the diagonal layout."""
    B_total = attL.shape[-1]
    n1 = attL.shape[0]
    launch_b = _fused_max_launch(n1)
    if B_total > launch_b:
        outs = _chunked(
            lambda *a: _pallas_fused_call(*a, is_max=is_max,
                                          interpret=interpret),
            5, attL, attR, seedR, seedL, lengths, chunk_b=launch_b,
        )
        return outs
    n1, _, n1r, B = attL.shape
    cp = _fused_cp(n1)
    ip = _flip_cols(n1)
    fr = n1 + TCH
    nx = n1 + TCH
    grid = (B // BT,)
    if is_max:
        ms_tables = 0
    else:
        ms_tables = _fused_ms_tables(n1, B // BT)
        # a -1 ("does not fit") verdict must never reach a live launch:
        # near-ceiling VMEM launches have faulted the v5e worker, and
        # callers gate on _fused_max_launch(n1) > 0 before getting here
        assert ms_tables >= 0, (n1, B)
    att_spec, seed_spec, row_spec = _specs(n1, n1r)
    chart = lambda: pltpu.VMEM((nx, 2, cp, BT), jnp.float32)
    adj = lambda: pltpu.VMEM((n1, 2, cp, BT), jnp.float32)
    flip = lambda v: pltpu.VMEM((fr, v, ip, BT), jnp.float32)
    kernel = functools.partial(_fused_kernel, n1, n1r, ip, fr, is_max,
                               ms_tables)
    out, gattL, gattR, gseedR, gseedL = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[att_spec, att_spec, seed_spec, seed_spec, row_spec],
        out_specs=(row_spec, att_spec, att_spec, seed_spec, seed_spec),
        out_shape=(
            jax.ShapeDtypeStruct((1, B), jnp.float32),
            jax.ShapeDtypeStruct((n1, 2, n1r, B), jnp.float32),
            jax.ShapeDtypeStruct((n1, 2, n1r, B), jnp.float32),
            jax.ShapeDtypeStruct((2, n1r, B), jnp.float32),
            jax.ShapeDtypeStruct((2, n1r, B), jnp.float32),
        ),
        scratch_shapes=[chart(), chart(), chart(), chart(),
                        flip(2), flip(1), flip(2),
                        adj(), adj(), adj(), adj()]
        + [adj() for _ in range(ms_tables)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=36 * n1 ** 3 * B,
            bytes_accessed=(4 * n1 * n1 * 2 + 8 * n1 * 2 + 4) * B * 4,
            # (m,s) pushes drop the log1p: ~1 transcendental instead of
            # 2 on the converted tables' pushes
            transcendentals=0 if is_max
            else (14 - ms_tables) * n1 ** 3 * B,
        ),
    )(attL, attR, seedR, seedL, lengths)
    return out[0], gattL, gattR, gseedR, gseedL


def _pad_batch(x, fill):
    B = x.shape[-1]
    pad = (-B) % BT
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths, constant_values=fill)


def _make_dmv_total(is_max: bool, interpret: bool):
    @jax.custom_vjp
    def total(dec, attach, lengths):
        B = attach.shape[0]
        value, _, _, _ = _call_inside(dec, attach, lengths, False)
        return value[:B]

    def _call_inside(dec, attach, lengths, save):
        n1 = attach.shape[1]
        n1r = _round8(n1)
        attL, attR, seedR, seedL = _prep_inputs(
            dec.astype(jnp.float32), attach.astype(jnp.float32), n1r
        )
        lrow = lengths.astype(jnp.int32)[None, :]
        attL = _pad_batch(attL, NEGINF)
        attR = _pad_batch(attR, NEGINF)
        value, charts = _pallas_inside_call(
            attL, attR,
            _pad_batch(seedR, NEGINF),
            _pad_batch(seedL, NEGINF),
            _pad_batch(lrow, 1),
            is_max=is_max,
            interpret=interpret,
            save_charts=save,
        )
        return value, charts, attL, attR

    def _fwd(dec, attach, lengths):
        B, n1 = attach.shape[:2]
        if USE_FUSED and _fused_max_launch(n1) > 0:
            n1r = _round8(n1)
            attL, attR, seedR, seedL = _prep_inputs(
                dec.astype(jnp.float32), attach.astype(jnp.float32), n1r
            )
            lrow = lengths.astype(jnp.int32)[None, :]
            value, gattL, gattR, gseedR, gseedL = _pallas_fused_call(
                _pad_batch(attL, NEGINF), _pad_batch(attR, NEGINF),
                _pad_batch(seedR, NEGINF), _pad_batch(seedL, NEGINF),
                _pad_batch(lrow, 1),
                is_max=is_max, interpret=interpret,
            )
            # 6-tuple residual = fused path (unscaled grads; see _bwd)
            return value[:B], (dec, attach, gattL[..., :B], gattR[..., :B],
                               gseedR[..., :B], gseedL[..., :B])
        value, charts, attL, attR = _call_inside(dec, attach, lengths, True)
        return value[:B], (dec, attach, lengths, value, charts, attL, attR)

    def _bwd(res, g):
        if len(res) == 6:
            # fused path: grads were computed in the forward launch with
            # cotangent 1; they are linear in the cotangent, so apply it
            # as an elementwise scale (indicator grads in the max
            # semiring scale identically).
            dec, attach, gattL, gattR, gseedR, gseedL = res
            n1 = attach.shape[1]
            gf = g.astype(jnp.float32)
            g_dec, g_attach = _unprep_grads(
                gattL * gf, gattR * gf, gseedR * gf, gseedL * gf, n1,
            )
            return (g_dec.astype(dec.dtype), g_attach.astype(attach.dtype),
                    None)
        dec, attach, lengths, value, charts, attL, attR = res
        dec_dtype, attach_dtype = dec.dtype, attach.dtype
        B, n1 = attach.shape[:2]
        lrow = lengths.astype(jnp.int32)[None, :]
        gattL, gattR, gseedR, gseedL = _pallas_outside_call(
            attL, attR,
            _pad_batch(lrow, 1),
            _pad_batch(g.astype(jnp.float32)[None, :], 0.0),
            _pad_batch(value.astype(jnp.float32)[None, :], 0.0),
            charts,
            is_max=is_max,
            interpret=interpret,
        )
        g_dec, g_attach = _unprep_grads(
            gattL[..., :B], gattR[..., :B], gseedR[..., :B],
            gseedL[..., :B], n1,
        )
        return g_dec.astype(dec_dtype), g_attach.astype(attach_dtype), None

    total.defvjp(_fwd, _bwd)
    return total


# Data-parallel dispatch ----------------------------------------------------
#
# Under a plain jit with batch-sharded operands, XLA cannot partition a
# pallas_call (an opaque custom call): it all-gathers the inputs and
# runs the FULL batch on every chip — correct, but N_chips x redundant
# work on the dominant O(n^3) compute (measured: 15 all-gathers around
# one forward on an 8-device mesh). The chart fill is embarrassingly
# batch-parallel, so when the training harness registers its mesh the
# entry points shard_map themselves over 'data' and each chip fills only
# its local shard (no collectives inside; the grads are per-sentence).

_DATA_MESH = None


def set_data_parallel_mesh(mesh) -> None:
    """Register the active device mesh (or None to clear). Called by the
    training Pipeline; kernels then dispatch per-shard via shard_map over
    the 'data' axis whenever it is >1-way."""
    global _DATA_MESH
    _DATA_MESH = mesh


def data_parallel_degree() -> int:
    """Size of the registered mesh's 'data' axis (1 when unregistered).
    Kernel-selection gates consult this: paths GSPMD cannot partition
    (opaque pallas_calls without a shard_map wrap, e.g. the cross-batch
    matching kernel) should prefer a partitionable XLA formulation on a
    >1-way data mesh rather than run the full batch replicated on every
    chip."""
    mesh = _DATA_MESH
    return mesh.shape.get("data", 1) if mesh is not None else 1


def _shard_over_data(fn):
    from jax.sharding import PartitionSpec

    @functools.wraps(fn)
    def wrapper(dec, attach, lengths):
        mesh = _DATA_MESH
        dp = data_parallel_degree()
        # the harness pads batches to device multiples; anything else
        # (single-chip bench, unit tests) takes the unwrapped path
        if dp <= 1 or attach.shape[0] % dp != 0:
            return fn(dec, attach, lengths)
        spec = PartitionSpec("data")
        return jax.shard_map(
            fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
            check_vma=False,
        )(dec, attach, lengths)

    return wrapper


# Public entry points -------------------------------------------------------

dmv_partition_pallas = _shard_over_data(
    _make_dmv_total(is_max=False, interpret=False))
dmv_max_pallas = _shard_over_data(
    _make_dmv_total(is_max=True, interpret=False))
dmv_partition_pallas_interpret = _shard_over_data(
    _make_dmv_total(is_max=False, interpret=True))
dmv_max_pallas_interpret = _shard_over_data(
    _make_dmv_total(is_max=True, interpret=True))
