"""Pallas DMV kernels (interpret mode) vs the pure-JAX scan fill."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlgae_tpu.ops import (
    dmv_max_pallas_interpret,
    dmv_partition_pallas_interpret,
)
from vlgae_tpu.struct import LogSemiring, MaxSemiring, dmv_marginals, dmv_partition

from test_struct_dmv import merged_batch, random_potentials


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    params = [random_potentials(rng, n) for n in (3, 5, 2, 6, 4, 1, 6, 5)]
    return merged_batch(params)


def test_pallas_partition_matches_scan(batch):
    mdec, mattach, lengths = batch
    want = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
    got = np.asarray(dmv_partition_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_max_matches_scan(batch):
    mdec, mattach, lengths = batch
    want = np.asarray(dmv_partition(mdec, mattach, lengths, MaxSemiring))
    got = np.asarray(dmv_max_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pallas_marginals_match_scan(batch):
    mdec, mattach, lengths = batch

    def total_pallas(d, a):
        return jnp.sum(dmv_partition_pallas_interpret(d, a, lengths))

    gd, ga = jax.grad(total_pallas, argnums=(0, 1))(mdec, mattach)
    wd, wa = dmv_marginals(mdec, mattach, lengths, LogSemiring)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), rtol=1e-3, atol=1e-5)


def test_pallas_argmax_matches_scan(batch):
    mdec, mattach, lengths = batch

    def total_pallas(d, a):
        return jnp.sum(dmv_max_pallas_interpret(d, a, lengths))

    gd, ga = jax.grad(total_pallas, argnums=(0, 1))(mdec, mattach)
    wd, wa = dmv_marginals(mdec, mattach, lengths, MaxSemiring)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), rtol=1e-3, atol=1e-5)


def test_pallas_cotangent_scaling(batch):
    mdec, mattach, lengths = batch
    B = mattach.shape[0]
    weights = jnp.asarray(np.linspace(0.5, 2.0, B))

    def total_pallas(a):
        return jnp.sum(weights * dmv_partition_pallas_interpret(mdec, a, lengths))

    def total_scan(a):
        return jnp.sum(weights * dmv_partition(mdec, a, lengths, LogSemiring))

    ga = jax.grad(total_pallas)(mattach)
    wa = jax.grad(total_scan)(mattach)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa), rtol=1e-3, atol=1e-5)


@pytest.fixture(scope="module")
def big_batch():
    """Lengths large enough for the v3 chunked inside gate (n1 >= 10)."""
    rng = np.random.default_rng(7)
    params = [random_potentials(rng, n) for n in (12, 9, 14, 11, 13, 10, 12, 14)]
    return merged_batch(params)


def test_pallas_v3_inside_fast_parity():
    """Default-selection coverage of the PRODUCTION kernel: the v3
    chunked-streaming inside is USE_V3_INSIDE=True by default, so the
    default (-m "not slow") run must exercise it — value + log-VJP
    parity on a small 2-sentence batch above the v3 gate."""
    from vlgae_tpu.ops import dmv_pallas as dp

    rng = np.random.default_rng(3)
    params = [random_potentials(rng, n) for n in (12, 10)]
    mdec, mattach, lengths = merged_batch(params)
    n1 = mattach.shape[1]
    assert dp.USE_V3_INSIDE and dp._v3_max_launch(n1, True) > 0

    want = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
    got = np.asarray(dmv_partition_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def total_pallas(d, a):
        return jnp.sum(dmv_partition_pallas_interpret(d, a, lengths))

    gd, ga = jax.grad(total_pallas, argnums=(0, 1))(mdec, mattach)
    wd, wa = dmv_marginals(mdec, mattach, lengths, LogSemiring)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                               rtol=1e-3, atol=1e-5)


def test_pallas_fused_bwd_parity(big_batch, monkeypatch):
    """The fused fwd+bwd kernel (USE_FUSED=True default): at lengths
    where its gate engages, grads must match BOTH the scan reference and
    the save-charts + standalone-outside fallback, including a
    non-trivial cotangent (fused computes unscaled grads and the VJP
    wrapper applies the cotangent as a scale)."""
    from vlgae_tpu.ops import dmv_pallas as dp

    mdec, mattach, lengths = big_batch
    n1 = mattach.shape[1]
    assert dp.USE_FUSED and dp._fused_max_launch(n1) > 0
    B = mattach.shape[0]
    weights = jnp.asarray(np.linspace(0.5, 2.0, B))

    def total_pallas(d, a):
        return jnp.sum(weights * dmv_partition_pallas_interpret(d, a, lengths))

    gd, ga = jax.grad(total_pallas, argnums=(0, 1))(mdec, mattach)

    def total_scan(d, a):
        return jnp.sum(weights * dmv_partition(d, a, lengths, LogSemiring))

    wd, wa = jax.grad(total_scan, argnums=(0, 1))(mdec, mattach)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                               rtol=1e-3, atol=1e-5)

    # fallback path (save-charts + standalone outside) must agree too
    monkeypatch.setattr(dp, "USE_FUSED", False)
    fb = dp._make_dmv_total(is_max=False, interpret=True)

    def total_fb(d, a):
        return jnp.sum(weights * fb(d, a, lengths))

    fd, fa = jax.grad(total_fb, argnums=(0, 1))(mdec, mattach)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(fa),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(fd),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("ms_tables,ms_comb", [(0, False), (2, False),
                                               (2, True), (4, True)])
def test_pallas_fused_ms_configs(big_batch, monkeypatch, ms_tables, ms_comb):
    """The fused kernel's (max, scaled-sum) adjoint configs: VMEM
    pressure at large n1 can force 2 (O_C pair only) or 0 (m,s) tables
    instead of the 4 chosen at small n1 — pin grad parity for those
    mixed configs by forcing the selector. ``ms_comb`` forces both sides
    of the size-gated (m,s) channel-combine form (production: plain
    combines below MS_COMBINE_MIN_N1, (m,s) pairs above — the fixture's
    n1 sits below the gate, so the True cases emulate the len64 path)."""
    from vlgae_tpu.ops import dmv_pallas as dp

    mdec, mattach, lengths = big_batch
    monkeypatch.setattr(dp, "_fused_ms_tables", lambda n1, grid: ms_tables)
    monkeypatch.setattr(dp, "MS_COMBINE_MIN_N1", 0 if ms_comb else 10**9)
    fused = dp._make_dmv_total(is_max=False, interpret=True)
    B = mattach.shape[0]
    weights = jnp.asarray(np.linspace(0.5, 2.0, B))

    def total_pallas(d, a):
        return jnp.sum(weights * fused(d, a, lengths))

    got = np.asarray(fused(mdec, mattach, lengths))
    want = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    gd, ga = jax.grad(total_pallas, argnums=(0, 1))(mdec, mattach)

    def total_scan(d, a):
        return jnp.sum(weights * dmv_partition(d, a, lengths, LogSemiring))

    wd, wa = jax.grad(total_scan, argnums=(0, 1))(mdec, mattach)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd),
                               rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_pallas_v3_inside_matches_scan(big_batch):
    """The chunked streaming (v3) inside fill: values and VJP parity at
    lengths where its gate engages (the small-`batch` fixture falls back
    to v2)."""
    from vlgae_tpu.ops import dmv_pallas as dp

    mdec, mattach, lengths = big_batch
    n1 = mattach.shape[1]
    assert dp._v3_max_launch(n1, True) > 0 and dp._v3_max_launch(n1, False) > 0

    want = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
    got = np.asarray(dmv_partition_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    want = np.asarray(dmv_partition(mdec, mattach, lengths, MaxSemiring))
    got = np.asarray(dmv_max_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def total_pallas(d, a):
        return jnp.sum(dmv_partition_pallas_interpret(d, a, lengths))

    gd, ga = jax.grad(total_pallas, argnums=(0, 1))(mdec, mattach)
    wd, wa = dmv_marginals(mdec, mattach, lengths, LogSemiring)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), rtol=1e-3, atol=1e-5)

    def total_max(d, a):
        return jnp.sum(dmv_max_pallas_interpret(d, a, lengths))

    gd, ga = jax.grad(total_max, argnums=(0, 1))(mdec, mattach)
    wd, wa = dmv_marginals(mdec, mattach, lengths, MaxSemiring)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gd), np.asarray(wd), rtol=1e-3, atol=1e-5)




@pytest.mark.parametrize("model_par", [1, 2])
def test_kernel_shard_map_dispatch_over_data_mesh(model_par):
    """With a registered mesh, the kernel entry points shard_map over
    'data': each device fills only its local batch shard — the compiled
    HLO contains NO all-gather (GSPMD would otherwise replicate the
    opaque pallas_call on every chip) — and values AND grads are
    bit-identical to the unsharded path. ``model_par=2`` composes the
    tensor-parallel axis (kernel inputs replicated over 'model')."""
    import vlgae_tpu.ops.dmv_pallas as dp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    B, N = 16, 11
    rng = np.random.default_rng(3)
    dec = jnp.asarray(rng.standard_normal((B, N + 1, 2, 2, 2)), jnp.float32)
    attach = jnp.asarray(
        rng.standard_normal((B, N + 1, N + 1, 2)), jnp.float32
    )
    lengths = jnp.full((B,), N, jnp.int32)

    devs = np.array(jax.devices())
    if devs.size < 2 * model_par:
        pytest.skip("needs a multi-device mesh")
    mesh = Mesh(devs.reshape(devs.size // model_par, model_par),
                ("data", "model"))
    shard = NamedSharding(mesh, P("data"))

    @jax.jit
    def run(d, a, l):
        vals = dp.dmv_partition_pallas_interpret(d, a, l)
        # cotangent 1 per sentence: grads are per-sentence and must be
        # bit-equal; only the cross-shard scalar sum may re-associate
        g = jax.grad(
            lambda a_: jnp.sum(dp.dmv_partition_pallas_interpret(d, a_, l))
        )(a)
        return vals, g

    v0, g0 = run(dec, attach, lengths)
    try:
        dp.set_data_parallel_mesh(mesh)
        args = tuple(jax.device_put(x, shard) for x in (dec, attach, lengths))
        v1, g1 = run(*args)
        hlo = jax.jit(run).lower(*args).compile().as_text()
    finally:
        dp.set_data_parallel_mesh(None)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
    assert hlo.count("all-gather") == 0, "kernel inputs were replicated"

    # odd batches (not device-divisible) fall back to the unwrapped
    # path; compare against the independent scan fill so the fallback
    # is actually checked, not compared against itself
    from vlgae_tpu.struct import LogSemiring, dmv_partition

    dp.set_data_parallel_mesh(mesh)
    try:
        v2 = dp.dmv_partition_pallas_interpret(
            dec[:9], attach[:9], lengths[:9]
        )
    finally:
        dp.set_data_parallel_mesh(None)
    np.testing.assert_allclose(
        np.asarray(v2),
        np.asarray(dmv_partition(dec[:9], attach[:9], lengths[:9],
                                 LogSemiring)),
        rtol=1e-4, atol=1e-4,
    )


@pytest.mark.parametrize("n_max", [10, 17, 25, 33])
def test_fused_kernel_band_edge_lengths(n_max):
    """Width-band edge sweep: chart sizes on and around multiples of 8
    (the band granularity) with ragged in-batch lengths must match the
    scan fill for values AND marginal grads — band-capacity bugs show
    up exactly at these shapes."""
    rng = np.random.default_rng(n_max)
    lens = [n_max, max(2, n_max - 1), max(2, n_max // 2), 2]
    mdec, mattach, lengths = merged_batch(
        [random_potentials(rng, n) for n in lens]
    )
    n1 = mattach.shape[1]
    import vlgae_tpu.ops.dmv_pallas as dp

    assert dp._fused_max_launch(n1) > 0

    want = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
    got = np.asarray(dmv_partition_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    ga = jax.grad(
        lambda a: jnp.sum(dmv_partition_pallas_interpret(mdec, a, lengths))
    )(mattach)
    _, wa = dmv_marginals(mdec, mattach, lengths, LogSemiring)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                               rtol=1e-3, atol=1e-5)

    # max semiring (Viterbi value + indicator grads) at the same shapes
    want = np.asarray(dmv_partition(mdec, mattach, lengths, MaxSemiring))
    got = np.asarray(dmv_max_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    ga = jax.grad(
        lambda a: jnp.sum(dmv_max_pallas_interpret(mdec, a, lengths))
    )(mattach)
    _, wa = dmv_marginals(mdec, mattach, lengths, MaxSemiring)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(wa),
                               rtol=1e-3, atol=1e-5)


def test_bf16_chart_storage_flag(big_batch):
    """CHART_STORE_DTYPE=bf16 (VERDICT r3 #10 lever): the no-save v3
    fill with bf16 VMEM-resident charts must stay within bf16 rounding
    of the f32 partition — loose absolute tolerance scaling with |logZ|
    — and the flag must actually change the result (liveness)."""
    import vlgae_tpu.ops.dmv_pallas as dp

    mdec, mattach, lengths = big_batch
    want = np.asarray(
        dmv_partition(mdec, mattach, lengths, LogSemiring))
    f32 = np.asarray(
        dmv_partition_pallas_interpret(mdec, mattach, lengths))
    dp.CHART_STORE_DTYPE = jnp.bfloat16
    try:
        bf16 = np.asarray(jax.jit(dmv_partition_pallas_interpret)(
            mdec, mattach, lengths))
    finally:
        dp.CHART_STORE_DTYPE = jnp.float32
    np.testing.assert_allclose(f32, want, rtol=1e-4, atol=1e-4)
    # bf16 has ~8 mantissa bits: rounding a chart cell of magnitude m
    # costs up to m * 2^-9 per write; allow a small accumulation factor
    tol = np.maximum(np.abs(want), 1.0) * 2.0 ** -9 * 8
    assert np.all(np.abs(bf16 - want) <= tol), (
        np.abs(bf16 - want).max(), tol.min())
    assert np.abs(bf16 - f32).max() > 0.0, "flag had no effect"
