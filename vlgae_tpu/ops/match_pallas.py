"""Fused Pallas TPU kernel for the joint model's pairwise matching maxes.

The training-path grounding loss needs only the two max-reductions of
the pairwise matching product (ref: src/model/joint.py:406-499)

    att[b, a, q, v] = txt_b[b, q, :] . vis_b[a, v, :]
    logit[b, a, q]   = max_v att      (text -> vision CE)
    logit_v[b, a, v] = max_q att      (vision -> text CE)

but XLA materializes the full [B, A, Q, V] product to HBM once in each
direction (~0.5GB at reference scale), and its autodiff re-materializes
it again backward — the round-2 profile put this stack at 71% of the
joint train step. Here every per-image slab ``att_a = vis_a @ txt^T``
([V, B*Q], ~4MB) lives only in VMEM: one MXU GEMM per image, both maxes
reduced in-register, only the [.., Q] / [.., V] maxima (plus int32
argmax indices) reach HBM.

The backward is argmax-routed from the saved indices (the one-winner
subgradient of torch's ``.max()``, which the reference relies on — XLA's
max-autodiff splits ties instead): the winner masks are assembled as a
sparse [V, B*Q] matrix W and both gradients are two more MXU GEMMs per
image (``dvis_a = W @ txt``, ``dtxt += W^T @ vis_a``) — no [B,A,Q,V]
tensor exists in either pass.

Compute dtype is bf16 with f32 accumulation (matching the XLA path's
``bf16_matmul``); masks are folded into the feature dimension by the
caller exactly as in the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x, m):
    return (x + m - 1) // m * m


# largest per-grid-step VMEM footprint the kernels may take (the v5e
# has 128MB; leave room for double-buffering and the compiler's stack)
_VMEM_BUDGET = 56 * 1024 * 1024
# the q-loops are Python-unrolled: cap the unroll size
_MAX_Q = 64


def match_maxes_fits(A, V, D, B, Q) -> bool:
    """Whether the fused kernel is applicable at this shape (callers
    fall back to the XLA einsum path otherwise). Checks the Python
    q-unroll size and the per-grid-step VMEM footprint of the larger
    (backward) kernel: txtT + vis/dvis blocks + dm/dmv/im/iv + the
    dtxt accumulator block + the in-kernel att/W temporaries."""
    if Q > _MAX_Q:
        return False
    Vp = _rup(V, 8)
    Dp = _rup(D, 128)
    QBp = _rup(Q * B, 128)
    per_img = Vp * Dp * (2 + 4) + (2 * QBp + 2 * Vp * B) * 4
    shared = Dp * QBp * 2 + QBp * Dp * 4
    temps = Vp * QBp * (4 + 2)  # f32 att (fwd) / bf16 W + slack (bwd)
    # blocks are double-buffered by the grid pipeline; temporaries not
    return 2 * (shared + per_img) + temps <= _VMEM_BUDGET


def _fwd_kernel(Q, B, V, Vp, txtT_ref, vis_ref,
                m_ref, im_ref, mv_ref, iv_ref):
    """Grid step = one image a: att = vis_a @ txt^T, both maxes."""
    vis_a = vis_ref[0]                      # [Vp, Dp] bf16
    att = lax.dot_general(
        vis_a, txtT_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [Vp, QBp] f32
    # zero-padded factor rows must never win a max (real scores can be
    # negative, and masked columns sit near the caller's -INF bias)
    iota_v = lax.broadcasted_iota(jnp.int32, att.shape, 0)
    att = jnp.where(iota_v < V, att, -jnp.inf)

    # max/first-argmax over v (sublane axis)
    m = jnp.max(att, axis=0)                 # [QBp]
    im = jnp.min(jnp.where(att == m[None, :], iota_v, Vp), axis=0)
    m_ref[0, 0, :] = m
    im_ref[0, 0, :] = im.astype(jnp.int32)

    # running max/first-argmax over q (static lane-block loop)
    mv = jnp.full((Vp, B), -jnp.inf, jnp.float32)
    iv = jnp.zeros((Vp, B), jnp.int32)
    for q in range(Q):
        blk = att[:, q * B:(q + 1) * B]
        upd = blk > mv
        mv = jnp.where(upd, blk, mv)
        iv = jnp.where(upd, q, iv)
    mv_ref[0, :, :] = mv
    iv_ref[0, :, :] = iv


def _bwd_kernel(Q, B, Vp, QBp, txtT_ref, vis_ref, im_ref, iv_ref,
                dm_ref, dmv_ref, dvis_ref, dtxt_ref):
    """Grid step = one image a: winner-mask W, two GEMMs.

    ``dtxt`` sums over images: its block is revisited every grid step
    (zeroed at a = 0, accumulated after) — the TPU grid is sequential.
    """
    vis_a = vis_ref[0]                       # [Vp, Dp] bf16
    dm = dm_ref[0, 0, :]                     # [QBp] f32
    im = im_ref[0, 0, :]                     # [QBp] i32
    dmv = dmv_ref[0]                         # [Vp, B] f32
    iv = iv_ref[0]                           # [Vp, B] i32

    # v-direction winners: W1[v, j] = [v == im[j]] * dm[j]
    iota_v = lax.broadcasted_iota(jnp.int32, (Vp, QBp), 0)
    w = jnp.where(iota_v == im[None, :], dm[None, :], 0.0)
    # q-direction winners, assembled q-block by q-block on the lane axis
    blocks = [jnp.where(iv == q, dmv, 0.0) for q in range(Q)]
    pad = QBp - Q * B
    if pad:
        blocks.append(jnp.zeros((Vp, pad), jnp.float32))
    w = (w + jnp.concatenate(blocks, axis=1)).astype(jnp.bfloat16)

    dvis_ref[0, :, :] = lax.dot_general(
        w, txtT_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [Vp, Dp]

    contrib = lax.dot_general(
        w, vis_a, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # [QBp, Dp]

    @pl.when(pl.program_id(0) == 0)
    def _():
        dtxt_ref[...] = jnp.zeros_like(dtxt_ref)

    dtxt_ref[...] += contrib


def _pad_inputs(vis_b, txt_b):
    A, V, D = vis_b.shape
    B, Q, _ = txt_b.shape
    Vp = _rup(V, 8)
    Dp = _rup(D, 128)
    QBp = _rup(Q * B, 128)
    vis = jnp.pad(vis_b.astype(jnp.bfloat16),
                  [(0, 0), (0, Vp - V), (0, Dp - D)])
    # q-major flatten: lane j = q*B + b
    txt2d = jnp.pad(
        txt_b.astype(jnp.bfloat16).transpose(1, 0, 2).reshape(Q * B, D),
        [(0, QBp - Q * B), (0, Dp - D)],
    )
    txtT = txt2d.T                            # [Dp, QBp]
    return vis, txtT, Vp, Dp, QBp


def _fwd_impl(vis_b, txt_b, interpret):
    A, V, D = vis_b.shape
    B, Q, _ = txt_b.shape
    vis, txtT, Vp, Dp, QBp = _pad_inputs(vis_b, txt_b)
    kernel = functools.partial(_fwd_kernel, Q, B, V, Vp)
    m, im, mv, iv = pl.pallas_call(
        kernel,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((Dp, QBp), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, Dp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # (1, 1, QBp): TPU blocks need their last-two dims to be
            # 8/128-divisible or equal to the array dims
            pl.BlockSpec((1, 1, QBp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, QBp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, B), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, B), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, 1, QBp), jnp.float32),
            jax.ShapeDtypeStruct((A, 1, QBp), jnp.int32),
            jax.ShapeDtypeStruct((A, Vp, B), jnp.float32),
            jax.ShapeDtypeStruct((A, Vp, B), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * A * Vp * QBp * Dp,
            bytes_accessed=(A * Vp * Dp + Dp * QBp) * 2
            + A * (2 * QBp + 2 * Vp * B) * 4,
            transcendentals=0,
        ),
    )(txtT, vis)
    # m: [A, 1, QBp] q-major -> logit [B, A, Q]
    logit = m[:, 0, :Q * B].reshape(A, Q, B).transpose(2, 0, 1)
    logit_v = mv[:, :V, :].transpose(2, 0, 1)  # [B, A, V]
    return logit, logit_v, (im, iv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def match_maxes_pallas(vis_b, txt_b, interpret=False):
    """(logit [B,A,Q], logit_v [B,A,V]) of the pairwise matching product,
    fused in VMEM with a one-winner argmax-routed backward."""
    logit, logit_v, _ = _fwd_impl(vis_b, txt_b, interpret)
    return logit, logit_v


def _match_fwd(vis_b, txt_b, interpret):
    logit, logit_v, (im, iv) = _fwd_impl(vis_b, txt_b, interpret)
    return (logit, logit_v), (vis_b, txt_b, im, iv)


def _match_bwd(interpret, res, g):
    vis_b, txt_b, im, iv = res
    dlogit, dlogit_v = g                     # [B, A, Q], [B, A, V]
    A, V, D = vis_b.shape
    B, Q, _ = txt_b.shape
    vis, txtT, Vp, Dp, QBp = _pad_inputs(vis_b, txt_b)
    # dm: [A, QBp] q-major; dmv: [A, Vp, B]
    dm = jnp.pad(
        dlogit.astype(jnp.float32).transpose(1, 2, 0).reshape(A, 1, Q * B),
        [(0, 0), (0, 0), (0, QBp - Q * B)],
    )
    dmv = jnp.pad(dlogit_v.astype(jnp.float32).transpose(1, 2, 0),
                  [(0, 0), (0, Vp - V), (0, 0)])
    kernel = functools.partial(_bwd_kernel, Q, B, Vp, QBp)
    dvis, dtxt2d = pl.pallas_call(
        kernel,
        grid=(A,),
        in_specs=[
            pl.BlockSpec((Dp, QBp), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, Dp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, QBp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, B), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, QBp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Vp, B), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, Vp, Dp), lambda a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((QBp, Dp), lambda a: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((A, Vp, Dp), jnp.float32),
            jax.ShapeDtypeStruct((QBp, Dp), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * A * Vp * QBp * Dp,
            bytes_accessed=(A * Vp * Dp + Dp * QBp) * 2
            + (A * Vp * Dp + QBp * Dp) * 4,
            transcendentals=0,
        ),
    )(txtT, vis, im, iv, dm, dmv)
    dvis_out = dvis[:, :V, :D].astype(vis_b.dtype)
    dtxt_out = (
        dtxt2d[:Q * B, :D].reshape(Q, B, D).transpose(1, 0, 2)
        .astype(txt_b.dtype)
    )
    return dvis_out, dtxt_out


match_maxes_pallas.defvjp(_match_fwd, _match_bwd)
