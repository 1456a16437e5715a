"""Property tests: DMV inside algorithm vs brute-force enumeration."""

import numpy as np
import pytest

import jax.numpy as jnp

from vlgae_tpu.struct import (
    DMV1o,
    EntropySemiring,
    KMaxSemiring,
    LogSemiring,
    MaxSemiring,
    StdSemiring,
    dmv_inside,
    dmv_merge,
    dmv_partition,
)

import oracles


def random_potentials(rng, n):
    dec = rng.standard_normal((n, 2, 2, 2))
    attach = rng.standard_normal((n, n, 2))
    root = rng.standard_normal((n,))
    return dec, attach, root


def merged_batch(params):
    """Pad a list of (dec, attach, root) to one batch and merge roots."""
    n_max = max(p[0].shape[0] for p in params)
    B = len(params)
    dec = np.zeros((B, n_max, 2, 2, 2))
    attach = np.full((B, n_max, n_max, 2), -1e12)
    root = np.full((B, n_max), -1e12)
    lengths = np.array([p[0].shape[0] for p in params])
    for b, (d, a, r) in enumerate(params):
        n = d.shape[0]
        dec[b, :n] = d
        attach[b, :n, :n] = a
        root[b, :n] = r
    mdec, mattach = dmv_merge(
        jnp.asarray(dec), jnp.asarray(attach), jnp.asarray(root)
    )
    return mdec, mattach, jnp.asarray(lengths)


@pytest.mark.parametrize("n", [1, 2, 3, 4, 5])
def test_partition_matches_bruteforce(n):
    rng = np.random.default_rng(n)
    dec, attach, root = random_potentials(rng, n)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    got = dmv_partition(mdec, mattach, lengths, LogSemiring)
    want = oracles.brute_dmv(dec, attach, root, n)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4)


@pytest.mark.parametrize("n", [1, 2, 3, 4])
def test_viterbi_matches_bruteforce(n):
    rng = np.random.default_rng(100 + n)
    dec, attach, root = random_potentials(rng, n)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    got = dmv_partition(mdec, mattach, lengths, MaxSemiring)
    want = oracles.brute_dmv(dec, attach, root, n, op=max)
    np.testing.assert_allclose(np.asarray(got)[0], want, rtol=1e-4)


def test_batched_variable_lengths():
    rng = np.random.default_rng(7)
    params = [random_potentials(rng, n) for n in (2, 4, 3, 1, 5)]
    mdec, mattach, lengths = merged_batch(params)
    got = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
    for b, (d, a, r) in enumerate(params):
        want = oracles.brute_dmv(d, a, r, d.shape[0])
        np.testing.assert_allclose(got[b], want, rtol=1e-4)


def test_count_semiring_counts_trees():
    # number of single-root projective trees must match enumeration
    rng = np.random.default_rng(3)
    for n in (1, 2, 3, 4):
        dec, attach, root = random_potentials(rng, n)
        mdec, mattach, lengths = merged_batch([(dec, attach, root)])
        dist = DMV1o((mdec, mattach), lengths)
        got = np.asarray(dist.count)[0]
        want = len(list(oracles.all_trees(n)))
        np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_marginals_match_bruteforce(n):
    rng = np.random.default_rng(200 + n)
    dec, attach, root = random_potentials(rng, n)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    dist = DMV1o((mdec, mattach), lengths)
    got = np.asarray(dist.marginals)[0]
    want, _ = oracles.brute_dmv_marginals(dec, attach, root, n)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_argmax_is_best_tree(n):
    rng = np.random.default_rng(300 + n)
    dec, attach, root = random_potentials(rng, n)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    dist = DMV1o((mdec, mattach), lengths)
    ind = np.asarray(dist.argmax)[0]
    # indicators are 0/1 and reproduce the viterbi score via dot product
    assert np.all((ind > -1e-5) & (ind < 1 + 1e-5))
    heads = np.asarray(dist.argmax_heads)[0]
    trees = list(oracles.all_trees(n))
    scores = [oracles.score_dmv(dec, attach, root, h) for h in trees]
    best = trees[int(np.argmax(scores))]
    np.testing.assert_array_equal(heads[:n], best)


@pytest.mark.parametrize("n", [2, 3, 4])
def test_entropy_matches_bruteforce(n):
    rng = np.random.default_rng(400 + n)
    dec, attach, root = random_potentials(rng, n)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    dist = DMV1o((mdec, mattach), lengths)
    got = np.asarray(dist.entropy)[0]
    scores = [
        oracles.score_dmv(dec, attach, root, h) for h in oracles.all_trees(n)
    ]
    want = oracles.brute_entropy(scores)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_cross_entropy_and_kl():
    n = 3
    rng = np.random.default_rng(42)
    p = random_potentials(rng, n)
    q = random_potentials(rng, n)
    mp = merged_batch([p])
    mq = merged_batch([q])
    dist_p = DMV1o((mp[0], mp[1]), mp[2])
    dist_q = DMV1o((mq[0], mq[1]), mq[2])
    ce = np.asarray(dist_p.cross_entropy(dist_q))[0]
    kl = np.asarray(dist_p.kl(dist_q))[0]
    trees = list(oracles.all_trees(n))
    sp = np.array([oracles.score_dmv(*p, h) for h in trees])
    sq = np.array([oracles.score_dmv(*q, h) for h in trees])
    lp = sp - oracles.logsumexp(sp)
    lq = sq - oracles.logsumexp(sq)
    want_ce = -(np.exp(lp) * lq).sum()
    want_kl = (np.exp(lp) * (lp - lq)).sum()
    np.testing.assert_allclose(ce, want_ce, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(kl, want_kl, rtol=1e-3, atol=1e-4)


def test_kmax_top_scores():
    n = 3
    rng = np.random.default_rng(5)
    dec, attach, root = random_potentials(rng, n)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    dist = DMV1o((mdec, mattach), lengths)
    k = 4
    got = np.asarray(dist.kmax(k))[:, 0]
    scores = sorted(
        (oracles.score_dmv(dec, attach, root, h) for h in oracles.all_trees(n)),
        reverse=True,
    )
    np.testing.assert_allclose(got, scores[:k], rtol=1e-4)


@pytest.mark.slow
def test_topk_structures():
    n = 3
    rng = np.random.default_rng(6)
    dec, attach, root = random_potentials(rng, n)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    dist = DMV1o((mdec, mattach), lengths)
    k = 3
    inds = np.asarray(dist.topk(k))  # [k, 1, n+1, n+1, 2]
    trees = list(oracles.all_trees(n))
    scores = [oracles.score_dmv(dec, attach, root, h) for h in trees]
    order = np.argsort(scores)[::-1]
    for i in range(k):
        heads = np.argmax(inds[i, 0].sum(-1)[:, 1:n + 1], axis=0)
        np.testing.assert_array_equal(heads, trees[order[i]])


@pytest.mark.slow
def test_remat_matches():
    rng = np.random.default_rng(9)
    dec, attach, root = random_potentials(rng, 4)
    mdec, mattach, lengths = merged_batch([(dec, attach, root)])
    import jax

    def total(a, remat):
        v, _ = dmv_inside(mdec, a, lengths, LogSemiring, remat=remat)
        return jnp.sum(LogSemiring.unconvert(v))

    g0 = jax.grad(lambda a: total(a, False))(mattach)
    g1 = jax.grad(lambda a: total(a, True))(mattach)
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g1), rtol=1e-5)
