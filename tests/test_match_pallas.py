"""Fused matching-maxes Pallas kernel (interpret mode) vs numpy.

Inputs are bf16-exact (quarter-integers) so the kernel's bf16 GEMM with
f32 accumulation reproduces the f32 reference bit-for-bit and the
argmax routing is deterministic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oracles import route_one_winner as _route_one_winner
from vlgae_tpu.ops.match_pallas import match_maxes_pallas

A, V, B, Q, D = 3, 10, 4, 5, 7


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    vis = rng.integers(-8, 9, (A, V, D)).astype(np.float32) * 0.25
    txt = rng.integers(-8, 9, (B, Q, D)).astype(np.float32) * 0.25
    return jnp.asarray(vis), jnp.asarray(txt)


def _np_reference(vis, txt):
    att = np.einsum("avd,bqd->baqv", np.asarray(vis, np.float32),
                    np.asarray(txt, np.float32))
    return att, att.max(-1), att.max(-2)


def test_forward_matches_numpy():
    vis, txt = _inputs()
    logit, logit_v = match_maxes_pallas(vis, txt, True)
    att, want_m, want_mv = _np_reference(vis, txt)
    assert logit.shape == (B, A, Q)
    assert logit_v.shape == (B, A, V)
    np.testing.assert_allclose(np.asarray(logit), want_m, rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(logit_v), want_mv, rtol=0,
                               atol=0)


def test_backward_routes_one_winner():
    vis, txt = _inputs(1)
    rng = np.random.default_rng(9)
    # bf16-exact cotangent weights: the backward GEMMs run in bf16 with
    # f32 accumulation (same dtype discipline as the XLA bf16_matmul
    # path), so exactness needs bf16-representable cotangents
    wm = jnp.asarray(rng.integers(-8, 9, (B, A, Q)) * 0.25, jnp.float32)
    wmv = jnp.asarray(rng.integers(-8, 9, (B, A, V)) * 0.25, jnp.float32)

    def loss(v, t):
        m, mv = match_maxes_pallas(v, t, True)
        return jnp.sum(m * wm) + jnp.sum(mv * wmv)

    val, (dvis, dtxt) = jax.value_and_grad(loss, argnums=(0, 1))(vis, txt)

    att, m, mv = _np_reference(vis, txt)
    np.testing.assert_allclose(
        float(val), (m * np.asarray(wm)).sum() + (mv * np.asarray(wmv)).sum(),
        rtol=1e-6)

    # route cotangents to the FIRST argmax winner (torch .max semantics)
    dm = np.asarray(wm)                # [B, A, Q]
    dmv = np.asarray(wmv)              # [B, A, V]
    datt = np.zeros_like(att)
    im = att.argmax(-1)
    for b in range(B):
        for a in range(A):
            for q in range(Q):
                datt[b, a, q, im[b, a, q]] += dm[b, a, q]
    iq = att.argmax(-2)
    for b in range(B):
        for a in range(A):
            for v in range(V):
                datt[b, a, iq[b, a, v], v] += dmv[b, a, v]
    want_dvis = np.einsum("baqv,bqd->avd", datt, np.asarray(txt))
    want_dtxt = np.einsum("baqv,avd->bqd", datt, np.asarray(vis))
    np.testing.assert_allclose(np.asarray(dvis), want_dvis, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dtxt), want_dtxt, rtol=1e-5,
                               atol=1e-6)


def test_masked_columns_stay_below_real_scores():
    """Masked rows/columns (the caller folds -1e9 biases into the
    features) must not be beaten by the kernel's internal padding."""
    vis, txt = _inputs(2)
    INF = 1e9
    # make every real factor score negative, and mask factor 0 + query 0
    vis = vis - 0.0
    vis_b = jnp.concatenate(
        [vis * 0.25 - 2.0,
         jnp.where(jnp.arange(V)[None, :, None] == 0, -INF, 0.0)
         * jnp.ones((A, V, 1)),
         jnp.ones((A, V, 1))], -1)
    txt_b = jnp.concatenate(
        [txt * 0.25 - 2.0, jnp.ones((B, Q, 1)),
         jnp.where(jnp.arange(Q)[None, :, None] == 0, -INF, 0.0)
         * jnp.ones((B, Q, 1))], -1)
    logit, logit_v = match_maxes_pallas(vis_b, txt_b, True)
    # reference in the kernel's own dtype: bf16 inputs, f32 accumulation
    att = np.einsum(
        "avd,bqd->baqv",
        np.asarray(jnp.asarray(vis_b, jnp.bfloat16), np.float32),
        np.asarray(jnp.asarray(txt_b, jnp.bfloat16), np.float32),
    )
    np.testing.assert_allclose(np.asarray(logit), att.max(-1))
    np.testing.assert_allclose(np.asarray(logit_v), att.max(-2))
    # masked query rows carry the -INF bias, not padding zeros
    assert float(np.asarray(logit)[0, 0, 0]) < -1e8
    assert float(np.asarray(logit_v)[0, 0, 0]) < -1e8


@pytest.mark.parametrize(
    "An,Vn,Bn,Qn,Dn",
    [
        (2, 16, 4, 64, 7),    # one full 64-q block
        (2, 37, 8, 101, 10),  # the paper-recipe Q (len-50: 1+L+L), ragged
        (3, 10, 12, 33, 7),   # awkward gcd(B,128) + masked tail block
        (2, 9, 4, 130, 5),    # 3+ q-blocks with a masked tail
        (2, 9, 128, 17, 5),   # B % 128 == 0: tree runs to width 1
    ],
)
def test_blocked_q_grid_matches_numpy(An, Vn, Bn, Qn, Dn):
    """Fwd values + one-winner bwd routing at shapes past the old
    whole-Q unroll gate (VERDICT r3 #1: Q in {64, 101, ragged})."""
    from vlgae_tpu.ops.match_pallas import _plan, match_maxes_fits

    assert match_maxes_fits(An, Vn, Dn, Bn, Qn)
    blkQ, nQB, _, _ = _plan(Vn, Dn, Bn, Qn)
    if Qn >= 101:
        assert nQB >= 2, "recipe shapes must exercise multiple q-blocks"
    rng = np.random.default_rng(Qn * 31 + Bn)
    vis = jnp.asarray(
        rng.integers(-8, 9, (An, Vn, Dn)).astype(np.float32) * 0.25)
    txt = jnp.asarray(
        rng.integers(-8, 9, (Bn, Qn, Dn)).astype(np.float32) * 0.25)
    wm = jnp.asarray(rng.integers(-8, 9, (Bn, An, Qn)) * 0.25, jnp.float32)
    wmv = jnp.asarray(rng.integers(-8, 9, (Bn, An, Vn)) * 0.25, jnp.float32)

    def loss(v, t):
        m, mv = match_maxes_pallas(v, t, True)
        return jnp.sum(m * wm) + jnp.sum(mv * wmv), (m, mv)

    (_, (m, mv)), (dvis, dtxt) = jax.value_and_grad(
        loss, argnums=(0, 1), has_aux=True)(vis, txt)
    att, want_m, want_mv = _np_reference(vis, txt)
    np.testing.assert_array_equal(np.asarray(m), want_m)
    np.testing.assert_array_equal(np.asarray(mv), want_mv)
    want_dvis, want_dtxt = _route_one_winner(
        att, np.asarray(wm), np.asarray(wmv), vis, txt)
    np.testing.assert_allclose(np.asarray(dvis), want_dvis, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dtxt), want_dtxt, rtol=1e-5,
                               atol=1e-6)


def test_fits_gate_recipe_and_fallback_shapes():
    """The paper recipe's joint shape (len-50: Q~101, 36 boxes -> 703
    compact factors, B=64) must take the kernel; degenerate shapes must
    be rejected rather than crash."""
    from vlgae_tpu.ops.match_pallas import match_maxes_fits

    assert match_maxes_fits(64, 703, 128, 64, 101)   # exp=vlgae scale
    assert match_maxes_fits(64, 739, 128, 64, 129)   # len-64 stretch
    assert match_maxes_fits(64, 703, 128, 64, 91)    # len-45 soak (Q~91)
    assert match_maxes_fits(64, 703, 130, 64, 101)   # legacy folded dim
    assert not match_maxes_fits(2, 8, 4, 0, 5)       # empty batch
    assert not match_maxes_fits(2, 8, 4, 101, 5)     # B=101: s=128 > cap


@pytest.mark.parametrize("An,Vn,Bn,Qn,Dn", [
    (3, 10, 4, 5, 7),      # single block
    (2, 37, 8, 101, 10),   # recipe Q: multiple q-blocks, masked tail
])
def test_bias_operands_match_numpy(An, Vn, Bn, Qn, Dn):
    """The production layout: raw features + [A,V]/[B,Q] additive -1e9
    mask biases as kernel operands (instead of folded feature columns).
    Values must equal the post-product bias add exactly; the backward
    routes to the biased argmax winner and returns zero bias grads."""
    rng = np.random.default_rng(Qn * 7 + Vn)
    vis = jnp.asarray(
        rng.integers(-8, 9, (An, Vn, Dn)).astype(np.float32) * 0.25)
    txt = jnp.asarray(
        rng.integers(-8, 9, (Bn, Qn, Dn)).astype(np.float32) * 0.25)
    INF = 1e9
    vmask = rng.random((An, Vn)) < 0.8
    vmask[:, 0] = True                       # at least one live factor
    tmask = rng.random((Bn, Qn)) < 0.8
    tmask[:, 0] = True
    vb = jnp.asarray(-INF * (1.0 - vmask), jnp.float32)
    tb = jnp.asarray(-INF * (1.0 - tmask), jnp.float32)
    wm = jnp.asarray(rng.integers(-8, 9, (Bn, An, Qn)) * 0.25, jnp.float32)
    wmv = jnp.asarray(rng.integers(-8, 9, (Bn, An, Vn)) * 0.25, jnp.float32)

    def loss(v, t, vbias, tbias):
        m, mv = match_maxes_pallas(v, t, True, vbias, tbias)
        return jnp.sum(m * wm) + jnp.sum(mv * wmv), (m, mv)

    (_, (m, mv)), (dvis, dtxt, dvb, dtb) = jax.value_and_grad(
        loss, argnums=(0, 1, 2, 3), has_aux=True)(vis, txt, vb, tb)

    att = (np.einsum("avd,bqd->baqv", np.asarray(vis), np.asarray(txt))
           + np.asarray(vb)[None, :, None, :]
           + np.asarray(tb)[:, None, :, None]).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(m), att.max(-1))
    np.testing.assert_array_equal(np.asarray(mv), att.max(-2))
    want_dvis, want_dtxt = _route_one_winner(
        att, np.asarray(wm), np.asarray(wmv), vis, txt)
    np.testing.assert_allclose(np.asarray(dvis), want_dvis, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(dtxt), want_dtxt, rtol=1e-5,
                               atol=1e-6)
    assert not np.any(np.asarray(dvb)) and not np.any(np.asarray(dtb))


@pytest.mark.slow
def test_model_level_kernel_path_matches_xla():
    """gather_logit_train with match_kernel='pallas' (interpret on CPU)
    vs 'xla': same grounding loss to bf16 tolerance, finite grads."""
    import dataclasses

    from test_models import build_ldndmv, make_inputs
    from vlgae_tpu.models import DependencyBoxRel, DependencyBoxRelConfig
    from vlgae_tpu.models.vis_encoder import VisBoxRelSimpleEncoder

    rng = np.random.default_rng(5)
    Bm, L, P = 4, 5, 4
    inputs = make_inputs(rng, B=Bm, L=L)
    inputs["vis_box_feat"] = jnp.asarray(
        rng.standard_normal((Bm, P, 10)), jnp.float32)
    inputs["vis_box_mask"] = jnp.asarray(np.tile(np.arange(P) < 3, (Bm, 1)))
    inputs["vis_available"] = jnp.ones(Bm, bool)

    def build(kernel):
        dep = build_ldndmv()
        cfg = DependencyBoxRelConfig(
            match_hidden=16, fuse_num_heads=2, fuse_dropout=0.0,
            word_encoder_dropout=0.0, bf16_matmul=True,
            match_kernel=kernel,
        )
        return DependencyBoxRel(
            cfg=cfg, dep_cfg=dep.cfg, dependency=dep,
            vis_encoder=VisBoxRelSimpleEncoder(
                n_hidden=24, img_feat=True, use_attr=True, use_img=False),
            pos_for_obj=(2,), pos_for_rel=(3,), pos_for_attr=(4,),
        )

    m_pallas = build("pallas")
    m_xla = build("xla")
    params = m_pallas.init(jax.random.key(0), inputs)

    def loss(model, p):
        o = model.apply(p, inputs, deterministic=False,
                        rngs={"dropout": jax.random.key(1),
                              "sample": jax.random.key(2)})
        assert o.get("match_reduced") is not None
        t, _ = model.apply(p, o, None, inputs, jnp.zeros(()), {}, 1.0,
                           method=model.loss)
        return t

    lp, gp = jax.value_and_grad(lambda p: loss(m_pallas, p))(params)
    lx, gx = jax.value_and_grad(lambda p: loss(m_xla, p))(params)
    # the xla path rounds its maxes to bf16, the kernel keeps the f32
    # accumulation — agreement is to bf16 resolution
    assert float(lp) == pytest.approx(float(lx), rel=2e-2)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gx)):
        assert np.all(np.isfinite(np.asarray(a)))
        na, nb = float(jnp.linalg.norm(a)), float(jnp.linalg.norm(b))
        assert na == pytest.approx(nb, rel=0.15, abs=1e-4), (na, nb)


def test_sharded_kernel_parity_and_no_txt_replication():
    """match_kernel='pallas_sharded' (VERDICT r3 #6): on a data mesh the
    sharded matching kernel must be bit-equal to the unsharded fused
    kernel (values AND one-winner grads), and the compiled HLO must
    gather only the vis operand — never the text shard (full
    replication is what this path exists to avoid)."""
    import vlgae_tpu.ops.dmv_pallas as dp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from vlgae_tpu.ops.match_pallas import (
        match_maxes_pallas_sharded,
        match_maxes_sharded_fits,
    )

    devs = np.array(jax.devices())
    if devs.size < 8:
        pytest.skip("needs the 8-device CPU mesh")
    mesh = Mesh(devs.reshape(8), ("data",))

    An, Vn, Bn, Qn, Dn = 16, 24, 16, 9, 12
    rng = np.random.default_rng(5)
    vis = jnp.asarray(
        rng.integers(-8, 9, (An, Vn, Dn)).astype(np.float32) * 0.25)
    txt = jnp.asarray(
        rng.integers(-8, 9, (Bn, Qn, Dn)).astype(np.float32) * 0.25)
    wm = jnp.asarray(rng.integers(-8, 9, (Bn, An, Qn)) * 0.25, jnp.float32)
    wmv = jnp.asarray(rng.integers(-8, 9, (Bn, An, Vn)) * 0.25, jnp.float32)

    @jax.jit
    def run(v_, t_):
        def loss(v, t):
            m, mv = match_maxes_pallas_sharded(v, t, True)
            return jnp.sum(m * wm) + jnp.sum(mv * wmv), (m, mv)

        (val, (m, mv)), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True)(v_, t_)
        return val, m, mv, g

    # unsharded baseline (no mesh registered -> plain fused kernel)
    v0, m0, mv0, (dv0, dt0) = run(vis, txt)

    shard = NamedSharding(mesh, P("data"))
    try:
        dp.set_data_parallel_mesh(mesh)
        assert match_maxes_sharded_fits(An, Vn, Dn, Bn, Qn)
        args = (jax.device_put(vis, shard), jax.device_put(txt, shard))
        v1, m1, mv1, (dv1, dt1) = run(*args)
        hlo = jax.jit(run).lower(*args).compile().as_text()
    finally:
        dp.set_data_parallel_mesh(None)

    np.testing.assert_array_equal(np.asarray(m0), np.asarray(m1))
    np.testing.assert_array_equal(np.asarray(mv0), np.asarray(mv1))
    np.testing.assert_allclose(np.asarray(dv0), np.asarray(dv1),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dt0), np.asarray(dt1),
                               rtol=1e-6, atol=1e-6)

    # exactly the vis gather rides the ICI: every all-gather in the
    # compiled module moves vis-sized blocks ([A/8, V, D] bf16 operands
    # of the kernel or their f32 adjoints), never a txt-lane tensor
    import re

    gathers = re.findall(r"all-gather[^\n]*", hlo)
    assert gathers, "expected the vis all-gather in the compiled HLO"
    for g in gathers:
        assert f"{Qn * Bn}" not in g, f"text shard was gathered: {g}"

    # odd (non-divisible) batches are rejected by the gate (only
    # meaningful while a >1-way mesh is registered)
    dp.set_data_parallel_mesh(mesh)
    try:
        assert not match_maxes_sharded_fits(An - 1, Vn, Dn, Bn, Qn)
        with pytest.raises(ValueError, match="do not split"):
            match_maxes_pallas_sharded(vis[: An - 2], txt, True)
    finally:
        dp.set_data_parallel_mesh(None)
