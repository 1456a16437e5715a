"""Property tests: Eisner CRF inside vs brute force + matrix-tree oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from vlgae_tpu.struct import (
    DependencyCRF,
    LogSemiring,
    MaxSemiring,
    deptree_nonproj_partition,
    deptree_partition,
)

import oracles


def batch_arcs(rng, ns):
    n_max = max(ns)
    B = len(ns)
    arc = rng.standard_normal((B, n_max + 1, n_max + 1))
    return jnp.asarray(arc), jnp.asarray(np.array(ns))


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_partition_matches_bruteforce(n):
    rng = np.random.default_rng(n)
    arc, lengths = batch_arcs(rng, [n])
    got = np.asarray(deptree_partition(arc, lengths, LogSemiring))[0]
    want = oracles.brute_deptree(np.asarray(arc)[0], n)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_batched_variable_lengths():
    rng = np.random.default_rng(11)
    ns = [3, 1, 5, 2, 4]
    arc, lengths = batch_arcs(rng, ns)
    got = np.asarray(deptree_partition(arc, lengths, LogSemiring))
    for b, n in enumerate(ns):
        want = oracles.brute_deptree(np.asarray(arc)[b, : n + 1, : n + 1], n)
        np.testing.assert_allclose(got[b], want, rtol=1e-4)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_viterbi_and_argmax(n):
    rng = np.random.default_rng(50 + n)
    arc, lengths = batch_arcs(rng, [n])
    got_max = np.asarray(deptree_partition(arc, lengths, MaxSemiring))[0]
    arc_np = np.asarray(arc)[0]
    trees = list(oracles.all_trees(n))
    scores = [oracles.score_deptree(arc_np, h) for h in trees]
    np.testing.assert_allclose(got_max, max(scores), rtol=1e-4)
    dist = DependencyCRF(arc, lengths)
    heads = np.asarray(dist.argmax_heads)[0]
    best = trees[int(np.argmax(scores))]
    np.testing.assert_array_equal(heads[:n], best)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_marginals(n):
    rng = np.random.default_rng(70 + n)
    arc, lengths = batch_arcs(rng, [n])
    dist = DependencyCRF(arc, lengths)
    got = np.asarray(dist.marginals)[0]
    want, _ = oracles.brute_deptree_marginals(np.asarray(arc)[0], n)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_entropy():
    n = 3
    rng = np.random.default_rng(99)
    arc, lengths = batch_arcs(rng, [n])
    dist = DependencyCRF(arc, lengths)
    got = np.asarray(dist.entropy)[0]
    arc_np = np.asarray(arc)[0]
    scores = [oracles.score_deptree(arc_np, h) for h in oracles.all_trees(n)]
    want = oracles.brute_entropy(scores)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_log_prob():
    n = 4
    rng = np.random.default_rng(123)
    arc, lengths = batch_arcs(rng, [n])
    dist = DependencyCRF(arc, lengths)
    arc_np = np.asarray(arc)[0]
    trees = list(oracles.all_trees(n))
    heads = jnp.asarray(np.array([trees[0]]))
    got = np.asarray(dist.log_prob(heads))[0]
    scores = [oracles.score_deptree(arc_np, h) for h in trees]
    want = scores[0] - oracles.logsumexp(scores)
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nonproj_partition_mtt():
    """MTT with diagonal root scores counts all (possibly non-projective)
    multi-root... single-root spanning arborescences; check small case
    against explicit enumeration (ref: deptree.py:315-322)."""
    n = 3
    rng = np.random.default_rng(8)
    # layout: [n, n], diagonal = root scores, off-diag [h, c] arcs
    x = rng.standard_normal((1, n, n))
    got = float(np.asarray(deptree_nonproj_partition(jnp.asarray(x)))[0])
    xn = x[0]
    import itertools

    totals = []
    for heads in itertools.product(range(n + 1), repeat=n):
        full = [0] + list(heads)
        if not oracles.is_spanning(full):
            continue
        if sum(1 for h in heads if h == 0) != 1:
            continue
        s = 0.0
        for c, h in enumerate(heads):
            s += xn[c, c] if h == 0 else xn[h - 1, c]
        totals.append(s)
    want = oracles.logsumexp(totals)
    # eps regularisation in the laplacian makes this approximate
    np.testing.assert_allclose(got, want, rtol=1e-2)


def test_eisner_as_dmv_emulation():
    """The Pallas dispatch maps Eisner -> DMV with free decisions; verify
    the mapping itself on the scan backend."""
    from vlgae_tpu.struct import dmv_partition, NEGINF
    from vlgae_tpu.struct.dmv import HASCHILD

    rng = np.random.default_rng(123)
    ns = [3, 5, 4]
    arc, lengths = batch_arcs(rng, ns)
    B, N1 = arc.shape[:2]
    dec = jnp.zeros((B, N1, 2, 2, 2), jnp.float32)
    attach = jnp.stack([arc, arc], axis=-1)
    attach = attach.at[:, 0, :, HASCHILD].set(NEGINF)
    for sr in (LogSemiring, MaxSemiring):
        want = np.asarray(deptree_partition(arc, lengths, sr))
        got = np.asarray(dmv_partition(dec, attach, lengths, sr))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_topk_structures():
    n = 3
    rng = np.random.default_rng(77)
    arc, lengths = batch_arcs(rng, [n])
    dist = DependencyCRF(arc, lengths)
    k = 3
    inds = np.asarray(dist.topk(k))
    arc_np = np.asarray(arc)[0]
    trees = list(oracles.all_trees(n))
    scores = [oracles.score_deptree(arc_np, h) for h in trees]
    order = np.argsort(scores)[::-1]
    for i in range(k):
        heads = np.argmax(inds[i, 0][:, 1:n + 1], axis=0)
        np.testing.assert_array_equal(heads, trees[order[i]])


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_multiroot_partition_matches_bruteforce(n):
    """multiroot=True counts every projective forest rooted at 0
    (ref: deptree.py:80-135 legacy multiroot chart)."""
    rng = np.random.default_rng(300 + n)
    arc, lengths = batch_arcs(rng, [n])
    got = float(np.asarray(DependencyCRF(arc, lengths, multiroot=True).partition)[0])
    arc_np = np.asarray(arc)[0]
    scores = [
        oracles.score_deptree(arc_np, h)
        for h in oracles.all_trees(n, single_root=False)
    ]
    np.testing.assert_allclose(got, oracles.logsumexp(scores), rtol=1e-4)
    # single-root is a strict subset: partition must be <= multiroot's
    single = float(np.asarray(DependencyCRF(arc, lengths).partition)[0])
    assert single <= got + 1e-6


@pytest.mark.parametrize("n", [2, 3, 4])
def test_multiroot_viterbi_and_argmax(n):
    rng = np.random.default_rng(330 + n)
    arc, lengths = batch_arcs(rng, [n])
    dist = DependencyCRF(arc, lengths, multiroot=True)
    got_max = float(np.asarray(dist.max)[0])
    arc_np = np.asarray(arc)[0]
    trees = list(oracles.all_trees(n, single_root=False))
    scores = [oracles.score_deptree(arc_np, h) for h in trees]
    np.testing.assert_allclose(got_max, max(scores), rtol=1e-4)
    heads = np.asarray(dist.argmax_heads)[0]
    np.testing.assert_array_equal(heads[:n], trees[int(np.argmax(scores))])


@pytest.mark.parametrize("n", [2, 3, 4])
def test_multiroot_marginals(n):
    rng = np.random.default_rng(360 + n)
    arc, lengths = batch_arcs(rng, [n])
    got = np.asarray(DependencyCRF(arc, lengths, multiroot=True).marginals)[0]
    arc_np = np.asarray(arc)[0]
    trees = list(oracles.all_trees(n, single_root=False))
    scores = np.array([oracles.score_deptree(arc_np, h) for h in trees])
    probs = np.exp(scores - oracles.logsumexp(list(scores)))
    want = np.zeros_like(arc_np)
    for p, heads in zip(probs, trees):
        for c, h in enumerate(heads):
            want[h, c + 1] += p
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


def test_multiroot_batched_variable_lengths():
    rng = np.random.default_rng(390)
    ns = [3, 1, 4, 2]
    arc, lengths = batch_arcs(rng, ns)
    got = np.asarray(DependencyCRF(arc, lengths, multiroot=True).partition)
    for b, n in enumerate(ns):
        scores = [
            oracles.score_deptree(np.asarray(arc)[b, : n + 1, : n + 1], h)
            for h in oracles.all_trees(n, single_root=False)
        ]
        np.testing.assert_allclose(got[b], oracles.logsumexp(scores), rtol=1e-4)


def test_dmv_mapping_matches_eisner():
    """The DMV-table construction used by the TPU fast path
    (distributions.deptree_total_fast) must agree with the pure Eisner
    chart; here the mapping is checked through the pure-JAX DMV fill, so
    CPU CI pins the math the kernel dispatches to. (multiroot never maps
    onto the DMV chart -- its single-root zeroing is structural -- so
    deptree_total_fast routes multiroot to the pure Eisner fill.)"""
    from vlgae_tpu.struct import dmv as _dmv
    from vlgae_tpu.struct.dmv import HASCHILD
    from vlgae_tpu.struct.semirings import NEGINF

    rng = np.random.default_rng(76)
    ns = [3, 5, 2, 4]
    arc, lengths = batch_arcs(rng, ns)
    B, N1 = arc.shape[:2]
    dec = jnp.zeros((B, N1, 2, 2, 2), jnp.float32)
    attach = jnp.stack([arc, arc], axis=-1)
    attach = attach.at[:, 0, :, HASCHILD].set(NEGINF)
    for sr in (LogSemiring, MaxSemiring):
        via_dmv = np.asarray(_dmv.dmv_partition(dec, attach, lengths, sr))
        via_eisner = np.asarray(deptree_partition(arc, lengths, sr))
        np.testing.assert_allclose(via_dmv, via_eisner, rtol=1e-4, atol=1e-5)
