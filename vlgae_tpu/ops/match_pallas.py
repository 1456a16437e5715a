"""Fused Pallas TPU kernel for the joint model's pairwise matching maxes.

The training-path grounding loss needs only the two max-reductions of
the pairwise matching product (ref: src/model/joint.py:406-499)

    att[b, a, q, v] = txt_b[b, q, :] . vis_b[a, v, :] + vbias[a, v]
                      + tbias[b, q]
    logit[b, a, q]   = max_v att      (text -> vision CE)
    logit_v[b, a, v] = max_q att      (vision -> text CE)

but XLA materializes the full [B, A, Q, V] product to HBM once in each
direction (~0.5GB at reference scale), and its autodiff re-materializes
it again backward — the round-2 profile put this stack at 71% of the
joint train step. Here every (image, q-block) slab ``att = vis_a @
txt_blk^T`` ([V, blkQ*B], a few MB) lives only in VMEM: one MXU GEMM
per grid step, both maxes reduced in-register, only the [.., Q] /
[.., V] maxima (plus int32 argmax indices) reach HBM.

The -1e9 visibility masks enter as ADDITIVE BIAS OPERANDS ([A, V] and
[B, Q] f32, broadcast-added to the product slab in VMEM) rather than
as extra feature columns: folding them into the contraction (the
round-3 design) pushed the feature dim from 128 to 130, which the MXU
pads to 256 lanes — twice the necessary FLOPs in the forward and both
backward GEMMs. The bias layout also absorbs the padding masks: bias
rows/lanes beyond the real V/Q are -inf, so padded slots can never win
a max and the kernel needs no separate iota masking passes.

The grid is (A, n_qblocks): queries are processed in static power-of-
two blocks of at most ``_MAX_BLK_Q`` q's, so the kernel admits
arbitrary Q — in particular the paper recipe's len-50 joint shapes
(Q = 1 + L + L ~ 101) that the round-3 kernel's whole-Q unroll
excluded. The per-block (max, argmax)-over-q runs as a halving TREE
over the lane axis (log2 full-width VPU selects, ties broken on the
carried q index) instead of a blkQ-long sequential carry of half-lane
updates. The tree stops at the last level whose half-slices stay
lane-tile (128) aligned — Mosaic's extract_strided_slice SIGABRTs on
sub-128-lane slices of shrunken values (v5e, "Check failed:
limits[i] <= dim(i)") — so the kernel carries a [V, stopW*B] candidate
block (strict-greater folds across revisited q-blocks keep the first
winner) and the final fold across the stopW surviving lane groups runs
caller-side in XLA (max value, ties to the smallest global q: each
candidate already holds the first winner of its subtree x blocks, so
the composition is exactly the sequential first-winner semantics).

The backward is argmax-routed from the saved indices (the one-winner
subgradient of torch's ``.max()``, which the reference relies on — XLA's
max-autodiff splits ties instead): the winner masks are assembled as a
sparse [V, blkQ*B] matrix W and both gradients are two more MXU GEMMs
per step (``dvis_a += W @ txt_blk``, accumulated over q-blocks;
``dtxt[qblock] += W^T @ vis_a``, accumulated over images into a
VMEM-resident full [Qpad*B, D] block) — no [B,A,Q,V] tensor exists in
either pass. The biases DO affect routing (``vis_bias`` can move the
argmax-over-v winner; ``txt_bias`` shifts whole rows), but routing is
captured once in the saved winner indices, so the backward takes no
bias operands. Bias gradients are defined as zero: masks are data,
not parameters — ``match_maxes_pallas`` enforces that contract by
stopping gradients through both biases, so a caller passing a learned
bias fails loudly (no grad) instead of silently getting zeros.

Compute dtype is bf16 with f32 accumulation (matching the XLA path's
``bf16_matmul``).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x, m):
    return (x + m - 1) // m * m


# largest per-grid-step VMEM footprint the kernels may take (the v5e
# has 128MB; leave room for double-buffering and the compiler's stack).
# v5e-derived; re-derive on other parts with scripts/derive_kernel_gates.py
_VMEM_BUDGET = 56 * 1024 * 1024
# the scoped-vmem ceiling handed to the Mosaic compiler: XLA's default
# is 16MB, under which the recipe-scale launch (whose whole outputs XLA
# stack-allocates in VMEM, ~16.04MB at Q=101/V=703/B=64) fails to
# compile even though the per-step blocks fit — measured on v5e
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
def _pow2_env(name, default):
    """Read a tuning override; it must be a power of two >= 1, because
    _plan's doubling walk assumes the cap is on its lattice (a stray
    value would let blkQ overshoot the configured maximum)."""
    raw = os.environ.get(name)
    if raw is None:
        return default
    val = int(raw)
    if val < 1 or val & (val - 1):
        raise ValueError(
            f"{name}={raw!r}: must be a power of two >= 1 "
            f"(see scripts/derive_kernel_gates.py)"
        )
    return val


# cap on the q-block size (the tree reduction and the bwd tiling cost
# log2(blkQ) full-width passes; 64 keeps blocks inside VMEM at scale).
# v5e-derived; override with VLGAE_MATCH_MAX_BLK_Q (power of two) when
# re-deriving on other parts — see scripts/derive_kernel_gates.py
_MAX_BLK_Q = _pow2_env("VLGAE_MATCH_MAX_BLK_Q", 64)
# preferred q-block width in lanes: the recipe-shape cap sweep on v5e
# (A=B=64/Q=101/V=703/D=130; NOTES_ROUND4.md) measured fwd+bwd 5.36 ms
# at 4096-lane blocks, 4.78 at 1024, 4.76 at 512, 5.33 at 256 — small
# blocks cut tail padding and tree depth, but below ~4 lane-tiles the
# extra grid steps win. Override for re-derivation on other parts.
_TARGET_BLK_LANES = _pow2_env("VLGAE_MATCH_BLK_LANES", 512)

_NEG = float("-inf")


def _stop_width(blkQ, B):
    """Number of q-groups still alive when the in-kernel halving tree
    stops: the tree only runs levels whose half-slices are lane-tile
    (128) aligned, because Mosaic miscompiles sub-128-lane strided
    slices of shrunken values (v5e SIGABRT in ApplyVectorLayout). The
    surviving ``stopW`` groups are folded caller-side in XLA."""
    w = blkQ
    while w > 1 and (w // 2) * B % 128 == 0:
        w //= 2
    return w


def _plan(V, D, B, Q):
    """Pick the q-block size, or None when no legal block fits.

    A q-block of ``blkQ`` queries spans ``blkQ * B`` lanes; BlockSpec
    needs that to be 128-divisible, so blkQ must be a multiple of
    ``s = 128 / gcd(B, 128)`` — and a power-of-two multiple (s is a
    power of two, so blkQ is a power of two), because the in-kernel
    max/argmax-over-q runs as a halving tree over the lane axis.
    Within that constraint we take the smallest block spanning at
    least ``_TARGET_BLK_LANES`` lanes (the measured v5e sweet spot:
    small blocks cut tail padding and tree depth, but sub-512-lane
    blocks pay more in grid steps), shrinking only if the bigger
    (backward) step exceeds the VMEM budget.

    Returns (blkQ, nQB, Vp, Dp) or None.
    """
    if min(V, D, B, Q) < 1:
        return None
    s = 128 // math.gcd(B, 128)
    if s > _MAX_BLK_Q:
        return None  # tiny odd batches: the einsum path is fine there
    Vp = _rup(V, 8)
    Dp = _rup(D, 128)
    blkQ = s
    while (blkQ < min(_MAX_BLK_Q, _rup(Q, s))
           and blkQ * B < _TARGET_BLK_LANES):
        blkQ *= 2
    while blkQ >= s:
        nQB = -(-Q // blkQ)
        Lpad = nQB * blkQ * B
        blkL = blkQ * B
        cw = _stop_width(blkQ, B) * B    # carried candidate-block lanes
        # double-buffered blocks + single-buffered temporaries/full
        # blocks. Bias blocks: visb [Vp, 1] tiles to Vp*128 lanes f32,
        # txtb [1, blkL] tiles to 8 sublanes.
        fwd = (
            2 * (Dp * blkL * 2 + Vp * Dp * 2 + 2 * blkL * 4 + 2 * Vp * cw * 4
                 + Vp * 128 * 4 + 8 * blkL * 4)
            + Vp * blkL * 4
        )
        bwd = (
            2 * (Dp * blkL * 2 + Vp * Dp * 2 + 2 * blkL * 4
                 + 2 * Vp * B * 4 + Vp * Dp * 4)
            + Lpad * Dp * 4          # dtxt accumulator (constant-index block)
            + Vp * blkL * (4 + 2)    # f32 W assembly + bf16 cast
            + blkL * Dp * 4          # per-step dtxt contribution
        )
        if max(fwd, bwd) <= _VMEM_BUDGET:
            return blkQ, nQB, Vp, Dp
        blkQ //= 2  # keep the power-of-two tree invariant
    return None


def match_maxes_fits(A, V, D, B, Q) -> bool:
    """Whether the fused kernel is applicable at this shape (callers
    fall back to the XLA einsum path otherwise). ``D`` is the
    CONTRACTION dim: the raw match-feature width when biases ride the
    bias operands (the production path), or features+2 when masks are
    folded into the features (the legacy/einsum layout)."""
    return _plan(V, D, B, Q) is not None


def _fwd_kernel(blkQ, B, Vp, txtT_ref, vis_ref, visb_ref, txtb_ref,
                m_ref, im_ref, mv_ref, iv_ref):
    """Grid step = (image a, q-block j): att = vis_a @ txt_blk^T + vb
    + tb, max/argmax over v per lane, running max/argmax over global q.

    Padded v rows carry vb = -inf and padded tail-q lanes carry
    tb = -inf, so neither can win a max — no iota masking passes."""
    j = pl.program_id(1)
    vis_a = vis_ref[0]                      # [Vp, Dp] bf16
    att = lax.dot_general(
        vis_a, txtT_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [Vp, blkQ*B] f32
    att = att + visb_ref[0] + txtb_ref[0, :][None, :]

    # max/first-argmax over v (sublane axis); -inf at padded-q lanes
    # in the tail block — the caller slices them away
    iota_v = lax.broadcasted_iota(jnp.int32, att.shape, 0)
    m = jnp.max(att, axis=0)                 # [blkQ*B]
    im = jnp.min(jnp.where(att == m[None, :], iota_v, Vp), axis=0)
    m_ref[0, 0, :] = m
    im_ref[0, 0, :] = im.astype(jnp.int32)

    # running max/first-argmax over GLOBAL q, accumulated across blocks
    # (the [Vp, stopW*B] candidate block is revisited consecutively
    # along the q-block grid axis). Padded tail q's never update.
    sw = _stop_width(blkQ, B)
    @pl.when(j == 0)
    def _():
        mv_ref[0] = jnp.full((Vp, sw * B), -jnp.inf, jnp.float32)
        iv_ref[0] = jnp.zeros((Vp, sw * B), jnp.int32)

    # halving tree over the q groups instead of a blkQ-long sequential
    # carry of half-lane [Vp, B] updates: each level is ONE full-width
    # VPU select. Ties break on the carried q index (values migrate
    # across lane positions through the tree, so positional lo-wins is
    # NOT enough to reproduce the sequential first-winner semantics).
    # The tree stops while its half-slices stay 128-lane aligned (see
    # _stop_width); the final fold over the sw surviving lane groups
    # happens caller-side in XLA.
    lane_q = lax.broadcasted_iota(jnp.int32, att.shape, 1) // B
    cur = att
    idx = lane_q
    width = blkQ
    first = True
    while width > sw:
        half = width // 2
        lo, hi = cur[:, : half * B], cur[:, half * B:]
        if first:
            # never SLICE the raw iota: it is sublane-replicated in
            # Mosaic's layout and extract_strided_slice SIGABRTs on it
            # ("Check failed: limits[i] <= dim(i)", v5e). Level-1 index
            # halves are statically g and g + half, and ihi > ilo
            # always, so ties keep lo.
            upd = hi > lo
            sub_q = lax.broadcasted_iota(jnp.int32, lo.shape, 1) // B
            idx = jnp.where(upd, sub_q + half, sub_q)
            first = False
        else:
            ilo, ihi = idx[:, : half * B], idx[:, half * B:]
            upd = (hi > lo) | ((hi == lo) & (ihi < ilo))
            idx = jnp.where(upd, ihi, ilo)
        cur = jnp.where(upd, hi, lo)
        width = half
    # full-width fold of the per-group winners into the global carry
    # (strict greater: earlier blocks hold smaller q, so cross-block
    # ties keep the first winner)
    upd = cur > mv_ref[0]
    iv_ref[0] = jnp.where(upd, j * blkQ + idx, iv_ref[0])
    mv_ref[0] = jnp.where(upd, cur, mv_ref[0])


def _bwd_kernel(blkQ, B, Vp, Q, txtT_ref, vis_ref, im_ref, iv_ref,
                dm_ref, dmv_ref, dvis_ref, dtxt_ref):
    """Grid step = (image a, q-block j): winner-mask W, two GEMMs.

    ``dvis`` sums over q-blocks (its [Vp, Dp] block is revisited along
    the minor grid axis: zeroed at j = 0, accumulated after); ``dtxt``
    sums over images into a constant-index full block (zeroed at the
    first grid step), with each step accumulating its q-block's rows —
    the TPU grid is sequential.
    """
    a = pl.program_id(0)
    j = pl.program_id(1)
    blkL = blkQ * B
    vis_a = vis_ref[0]                       # [Vp, Dp] bf16
    dm = dm_ref[0, 0, :]                     # [blkL] f32 (0 at padded q)
    im = im_ref[0, 0, :]                     # [blkL] i32
    dmv = dmv_ref[0]                         # [Vp, B] f32
    iv = iv_ref[0]                           # [Vp, B] i32 (global q)

    # v-direction winners: W1[v, l] = [v == im[l]] * dm[l]
    iota_v = lax.broadcasted_iota(jnp.int32, (Vp, blkL), 0)
    w = jnp.where(iota_v == im[None, :], dm[None, :], 0.0)
    # q-direction winners: tile (iv, dmv) across the q groups by
    # log2(blkQ) concat-doublings (lane l = q*B + b carries column b's
    # values), then ONE full-width compare against the lane's global q;
    # each global q lives in exactly one q-block, so no double counting
    t_iv, t_dmv = iv, dmv
    width = 1
    while width < blkQ:
        t_iv = jnp.concatenate([t_iv, t_iv], axis=1)
        t_dmv = jnp.concatenate([t_dmv, t_dmv], axis=1)
        width *= 2
    lane_q = lax.broadcasted_iota(jnp.int32, (Vp, blkL), 1) // B
    wq = jnp.where(t_iv == j * blkQ + lane_q, t_dmv, 0.0)
    w = (w + wq).astype(jnp.bfloat16)

    @pl.when(j == 0)
    def _():
        dvis_ref[0] = jnp.zeros_like(dvis_ref[0])

    dvis_ref[0] += lax.dot_general(
        w, txtT_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [Vp, Dp]

    contrib = lax.dot_general(
        w, vis_a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [blkL, Dp]

    @pl.when(jnp.logical_and(a == 0, j == 0))
    def _():
        dtxt_ref[...] = jnp.zeros_like(dtxt_ref)

    rows = pl.ds(j * blkL, blkL)
    dtxt_ref[rows, :] += contrib


def _pad_inputs(vis_b, txt_b, plan):
    A, V, D = vis_b.shape
    B, Q, _ = txt_b.shape
    blkQ, nQB, Vp, Dp = plan
    Lpad = nQB * blkQ * B
    vis = jnp.pad(vis_b.astype(jnp.bfloat16),
                  [(0, 0), (0, Vp - V), (0, Dp - D)])
    # q-major flatten: lane l = q*B + b
    txt2d = jnp.pad(
        txt_b.astype(jnp.bfloat16).transpose(1, 0, 2).reshape(Q * B, D),
        [(0, Lpad - Q * B), (0, Dp - D)],
    )
    txtT = txt2d.T                            # [Dp, Lpad]
    return vis, txtT, Lpad


def _pad_biases(vis_bias, txt_bias, plan, Lpad):
    """[A, V] / [B, Q] biases -> [A, Vp, 1] / [1, Lpad] kernel layouts.
    Padded v rows and padded tail-q lanes are -inf: they carry the
    kernel's internal padding masks (padded slots can never win)."""
    A, V = vis_bias.shape
    B, Q = txt_bias.shape
    _, _, Vp, _ = plan
    vb = jnp.pad(vis_bias.astype(jnp.float32), [(0, 0), (0, Vp - V)],
                 constant_values=_NEG)[:, :, None]
    tb = jnp.pad(
        txt_bias.astype(jnp.float32).transpose(1, 0).reshape(1, Q * B),
        [(0, 0), (0, Lpad - Q * B)], constant_values=_NEG,
    )
    return vb, tb


def _fwd_impl(vis_b, txt_b, vis_bias, txt_bias, interpret):
    A, V, D = vis_b.shape
    B, Q, _ = txt_b.shape
    plan = _plan(V, D, B, Q)
    if plan is None:
        raise ValueError(
            f"match_maxes_pallas: no legal q-block at shape "
            f"A={A} V={V} D={D} B={B} Q={Q}; gate with match_maxes_fits"
        )
    blkQ, nQB, Vp, Dp = plan
    vis, txtT, Lpad = _pad_inputs(vis_b, txt_b, plan)
    vb, tb = _pad_biases(vis_bias, txt_bias, plan, Lpad)
    blkL = blkQ * B
    cw = _stop_width(blkQ, B) * B           # candidate-block lanes
    kernel = functools.partial(_fwd_kernel, blkQ, B, Vp)
    m, im, mv, iv = pl.pallas_call(
        kernel,
        grid=(A, nQB),
        in_specs=[
            pl.BlockSpec((Dp, blkL), lambda a, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, Dp), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, 1), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blkL), lambda a, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # (1, 1, blkL): TPU blocks need their last-two dims to be
            # 8/128-divisible or equal to the array dims
            pl.BlockSpec((1, 1, blkL), lambda a, j: (a, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blkL), lambda a, j: (a, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, cw), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, cw), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, 1, Lpad), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, Lpad), jnp.int32),
            jax.ShapeDtypeStruct((A, Vp, cw), jnp.float32),
            jax.ShapeDtypeStruct((A, Vp, cw), jnp.int32),
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * Vp * Lpad * Dp,
            bytes_accessed=A * (Vp * Dp + Dp * Lpad) * 2
            + A * (2 * Lpad + 2 * Vp * cw) * 4,
            transcendentals=0,
        ),
    )(txtT, vis, vb, tb)
    # final fold over the stopW surviving lane groups (lane = g*B + b;
    # each candidate is the first winner of its subtree x blocks, so
    # max value + smallest-q tie-break composes to the exact global
    # first-winner). Runs in XLA: in-kernel sub-128-lane slices of
    # shrunken values SIGABRT Mosaic on v5e.
    sw = cw // B
    if sw > 1:
        vals = mv.reshape(A, Vp, sw, B)
        qs = iv.reshape(A, Vp, sw, B)
        mv = jnp.max(vals, axis=2)
        iv = jnp.min(
            jnp.where(vals == mv[:, :, None, :], qs, jnp.int32(1 << 30)),
            axis=2,
        )
    # m: [A, 1, Lpad] q-major -> logit [B, A, Q]
    logit = m[:, 0, :Q * B].reshape(A, Q, B).transpose(2, 0, 1)
    logit_v = mv[:, :V, :].transpose(2, 0, 1)  # [B, A, V]
    return logit, logit_v, (im, iv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _match_maxes_core(vis_b, txt_b, vis_bias, txt_bias, interpret):
    logit, logit_v, _ = _fwd_impl(vis_b, txt_b, vis_bias, txt_bias,
                                  interpret)
    return logit, logit_v


def _match_fwd(vis_b, txt_b, vis_bias, txt_bias, interpret):
    logit, logit_v, (im, iv) = _fwd_impl(vis_b, txt_b, vis_bias,
                                         txt_bias, interpret)
    return (logit, logit_v), (vis_b, txt_b, im, iv)


def _match_bwd(interpret, res, g):
    vis_b, txt_b, im, iv = res
    dlogit, dlogit_v = g                     # [B, A, Q], [B, A, V]
    A, V, D = vis_b.shape
    B, Q, _ = txt_b.shape
    plan = _plan(V, D, B, Q)
    blkQ, nQB, Vp, Dp = plan
    vis, txtT, Lpad = _pad_inputs(vis_b, txt_b, plan)
    blkL = blkQ * B
    # dm: [A, 1, Lpad] q-major (0 at padded-q lanes); dmv: [A, Vp, B]
    dm = jnp.pad(
        dlogit.astype(jnp.float32).transpose(1, 2, 0).reshape(A, 1, Q * B),
        [(0, 0), (0, 0), (0, Lpad - Q * B)],
    )
    dmv = jnp.pad(dlogit_v.astype(jnp.float32).transpose(1, 2, 0),
                  [(0, 0), (0, Vp - V), (0, 0)])
    kernel = functools.partial(_bwd_kernel, blkQ, B, Vp, Q)
    dvis, dtxt2d = pl.pallas_call(
        kernel,
        grid=(A, nQB),
        in_specs=[
            pl.BlockSpec((Dp, blkL), lambda a, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, Dp), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blkL), lambda a, j: (a, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, B), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blkL), lambda a, j: (a, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, B), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Vp, Dp), lambda a, j: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Lpad, Dp), lambda a, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, Vp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((Lpad, Dp), jnp.float32),
        ),
        interpret=interpret,
        compiler_params=_VMEM_LIMIT,
        cost_estimate=pl.CostEstimate(
            flops=4 * A * Vp * Lpad * Dp,
            bytes_accessed=A * (Vp * Dp + Dp * Lpad) * 2
            + (A * Vp * Dp + Lpad * Dp) * 4,
            transcendentals=0,
        ),
    )(txtT, vis, im, iv, dm, dmv)
    dvis_out = dvis[:, :V, :D].astype(vis_b.dtype)
    dtxt_out = (
        dtxt2d[:Q * B, :D].reshape(Q, B, D).transpose(1, 0, 2)
        .astype(txt_b.dtype)
    )
    # masks are data, not parameters: bias grads are zero by contract
    # (match_maxes_pallas stop_gradients both biases so the contract
    # is unescapable; routing through the biased winners is already
    # captured in the saved indices)
    return (dvis_out, dtxt_out, jnp.zeros((A, V), jnp.float32),
            jnp.zeros((B, Q), jnp.float32))


_match_maxes_core.defvjp(_match_fwd, _match_bwd)


def match_maxes_pallas(vis_b, txt_b, interpret=False, vis_bias=None,
                       txt_bias=None):
    """(logit [B,A,Q], logit_v [B,A,V]) of the pairwise matching product
    plus optional [A,V] / [B,Q] additive biases (the -1e9 visibility
    masks), fused in VMEM with a one-winner argmax-routed backward."""
    A, V, _ = vis_b.shape
    B, Q, _ = txt_b.shape
    if vis_bias is None:
        vis_bias = jnp.zeros((A, V), jnp.float32)
    if txt_bias is None:
        txt_bias = jnp.zeros((B, Q), jnp.float32)
    # biases are visibility masks (data, not parameters); the custom
    # VJP returns zero for them, so make the no-grad contract explicit
    # and unescapable for callers passing learned tensors
    vis_bias = lax.stop_gradient(vis_bias)
    txt_bias = lax.stop_gradient(txt_bias)
    return _match_maxes_core(vis_b, txt_b, vis_bias, txt_bias, interpret)


def match_maxes_sharded_fits(A, V, D, B, Q) -> bool:
    """Whether the shard_map'd kernel is applicable: both batches must
    split evenly over the registered data mesh and the per-shard launch
    (full A x local B) must plan a legal q-block."""
    from . import dmv_pallas as _dp

    dpd = _dp.data_parallel_degree()
    if dpd <= 1:
        return match_maxes_fits(A, V, D, B, Q)
    return (A % dpd == 0 and B % dpd == 0
            and _plan(V, D, B // dpd, Q) is not None)


def match_maxes_pallas_sharded(vis_b, txt_b, interpret=False,
                               vis_bias=None, txt_bias=None):
    """Data-sharded fused matching (``match_kernel='pallas_sharded'``).

    The contrastive grounding loss is cross-batch global — every text
    row scores against every image (ref: src/model/joint.py:439-499) —
    so a plain pallas_call is opaque to GSPMD and would be replicated
    on every chip of a data mesh. Here each shard keeps its LOCAL text
    block and all-gathers only the visual factor tensor ([A, V, D] and
    its [A, V] bias, the far smaller side at recipe scale: V*D floats
    per image vs B*Q*D text lanes per shard), runs the fused kernel at
    (full A, local B), and emits [B_local, A, *] blocks — the
    cross-batch product is partitioned over the text batch with ONE
    gather per step instead of full replication. The backward
    transposes the gather into a reduce-scatter of ``dvis``
    automatically.

    Single-chip (or no registered mesh) this reduces to
    :func:`match_maxes_pallas` exactly. Expected multi-chip crossover:
    the all-gathered vis bytes must amortize against the B^2 product —
    at the recipe shape (A=B=64, V=703, D=128) the gather is ~180KB/chip
    vs a ~47ms single-chip einsum step, so ICI cost is negligible; the
    single-chip A/B (scripts/match_kernel_ab.py) carries the kernel-vs-
    einsum baseline, and the perf verdict on real multi-chip hardware is
    deferred (correctness + no-replication are pinned by tests).
    """
    from jax.sharding import PartitionSpec

    from . import dmv_pallas as _dp

    mesh = _dp._DATA_MESH
    dpd = _dp.data_parallel_degree()
    if dpd <= 1:
        return match_maxes_pallas(vis_b, txt_b, interpret, vis_bias,
                                  txt_bias)
    A = vis_b.shape[0]
    B = txt_b.shape[0]
    if A % dpd or B % dpd:
        raise ValueError(
            f"match_maxes_pallas_sharded: batches A={A} B={B} do not "
            f"split over the {dpd}-way data mesh; gate with "
            f"match_maxes_sharded_fits"
        )
    if vis_bias is None:
        vis_bias = jnp.zeros((A, vis_b.shape[1]), jnp.float32)
    if txt_bias is None:
        txt_bias = jnp.zeros((B, txt_b.shape[1]), jnp.float32)

    def local(vis_l, visb_l, txt_l, txtb_l):
        vis_full = lax.all_gather(vis_l, "data", axis=0, tiled=True)
        visb_full = lax.all_gather(visb_l, "data", axis=0, tiled=True)
        return match_maxes_pallas(vis_full, txt_l, interpret, visb_full,
                                  txtb_l)

    spec = PartitionSpec("data")
    return jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec, spec),
        out_specs=(spec, spec), check_vma=False,
    )(vis_b, vis_bias, txt_b, txt_bias)
