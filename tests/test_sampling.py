"""Sampling semirings: validity + distributional correctness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlgae_tpu.struct import DMV1o, DependencyCRF
from vlgae_tpu.struct.alg import istree
from vlgae_tpu.struct.sample import SparseMaxSemiring, project_simplex

import oracles
from test_struct_dmv import merged_batch, random_potentials


@pytest.mark.slow
def test_deptree_samples_are_valid_trees():
    rng = np.random.default_rng(0)
    n = 4
    arc = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)))
    lengths = jnp.asarray(np.array([n, 3]))
    dist = DependencyCRF(arc, lengths)
    samples = np.asarray(dist.sample(jax.random.key(0), num_samples=20))
    assert samples.shape == (20, 2, n + 1, n + 1)
    for k in range(20):
        for b, ln in enumerate([n, 3]):
            ind = samples[k, b]
            heads = np.argmax(ind[:, 1: ln + 1], axis=0)
            # each word has exactly one head
            assert np.allclose(ind[:, 1: ln + 1].sum(0), 1)
            assert istree(list(heads), proj=True)


@pytest.mark.slow
def test_deptree_sample_distribution_matches_marginals():
    rng = np.random.default_rng(1)
    n = 3
    arc = jnp.asarray(rng.standard_normal((1, n + 1, n + 1)))
    lengths = jnp.asarray(np.array([n]))
    dist = DependencyCRF(arc, lengths)
    K = 800
    samples = np.asarray(dist.sample(jax.random.key(1), num_samples=K))
    freq = samples.mean(0)[0]
    want = np.asarray(dist.marginals)[0]
    np.testing.assert_allclose(
        freq[: n + 1, 1: n + 1], want[: n + 1, 1: n + 1], atol=0.07
    )


def test_dmv_samples_valid():
    rng = np.random.default_rng(2)
    params = [random_potentials(rng, 4)]
    mdec, mattach, lengths = merged_batch(params)
    dist = DMV1o((mdec, mattach), lengths)
    samples = np.asarray(dist.sample(jax.random.key(2), num_samples=10))
    for k in range(10):
        ind = samples[k, 0].sum(-1)
        heads = np.argmax(ind[:, 1:5], axis=0)
        assert np.allclose(ind[:, 1:5].sum(0), 1)
        assert istree(list(heads), proj=True)


def test_gumbel_crf_relaxed_sample():
    rng = np.random.default_rng(3)
    n = 3
    arc = jnp.asarray(rng.standard_normal((1, n + 1, n + 1)))
    lengths = jnp.asarray(np.array([n]))
    dist = DependencyCRF(arc, lengths)
    g = np.asarray(dist.gumbel_crf(jax.random.key(3), temperature=1.0))
    # straight-through forward values behave like hard indicators
    assert np.allclose(g[0][:, 1: n + 1].sum(0), 1, atol=1e-4)


def test_project_simplex():
    rng = np.random.default_rng(4)
    v = jnp.asarray(rng.standard_normal((5, 7)))
    w = np.asarray(project_simplex(v, axis=-1))
    assert np.all(w >= 0)
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


def test_sparsemax_dp_runs():
    rng = np.random.default_rng(5)
    n = 3
    arc = jnp.asarray(rng.standard_normal((1, n + 1, n + 1)))
    lengths = jnp.asarray(np.array([n]))
    from vlgae_tpu.struct.deptree import deptree_inside

    v, _ = deptree_inside(arc, lengths, SparseMaxSemiring)
    assert np.isfinite(float(SparseMaxSemiring.unconvert(v)[0]))


@pytest.mark.slow
def test_multi_sample_costs_one_inside_pass():
    """16 packed samples must cost ~one inside pass, not 16
    (ref: sample.py:102-160 bit packing)."""
    rng = np.random.default_rng(3)
    n = 30
    arc = jnp.asarray(rng.standard_normal((2, n + 1, n + 1)))
    lengths = jnp.asarray(np.array([n, n]))
    dist = DependencyCRF(arc, lengths)

    def flops(k):
        fn = jax.jit(lambda key: dist.sample(key, num_samples=k))
        compiled = fn.lower(jax.random.key(0)).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    f1, f16 = flops(1), flops(16)
    if f1 > 0:  # cost model available on this backend
        # shared inside pass: far below 16 separate passes; the
        # remaining k-term is the O(k*n) per-cell mass routing
        assert f16 < 6.0 * f1, (f1, f16)
        assert f16 < 0.4 * 16 * f1, (f1, f16)


def test_multi_sample_chunks_are_independent():
    """Samples beyond 16 come from fresh packed passes with fresh keys."""
    rng = np.random.default_rng(4)
    n = 4
    arc = jnp.asarray(rng.standard_normal((1, n + 1, n + 1)))
    lengths = jnp.asarray(np.array([n]))
    dist = DependencyCRF(arc, lengths)
    s = np.asarray(dist.sample(jax.random.key(5), num_samples=24))
    assert s.shape[0] == 24
    # not all identical across the chunk boundary
    assert not np.allclose(s[:16].mean(0), s[16:].mean(0), atol=1e-12) \
        or not np.allclose(s[0], s[16])
