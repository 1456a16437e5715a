"""Decode algorithm tests: eisner/eisner2o/mst/predicates."""

import numpy as np

import jax.numpy as jnp

from vlgae_tpu.struct import DependencyCRF
from vlgae_tpu.struct.alg import (
    chuliu_edmonds,
    eisner,
    eisner2o,
    isprojective,
    istree,
    mst,
)

import oracles


def test_eisner_matches_crf_argmax():
    rng = np.random.default_rng(1)
    ns = [3, 5, 2, 4]
    n_max = max(ns)
    arc = rng.standard_normal((len(ns), n_max + 1, n_max + 1))
    lengths = np.array(ns)
    got = eisner(arc, lengths)
    crf = DependencyCRF(jnp.asarray(arc), jnp.asarray(lengths))
    want = np.asarray(crf.argmax_heads)
    for b, n in enumerate(ns):
        np.testing.assert_array_equal(got[b, 1 : n + 1], want[b, :n])


def test_eisner2o_zero_sibling_equals_first_order():
    rng = np.random.default_rng(2)
    ns = [4, 3, 5]
    n_max = max(ns)
    B = len(ns)
    arc_hc = rng.standard_normal((B, n_max + 1, n_max + 1))  # [h, c]
    sib = np.zeros((B, n_max + 1, n_max + 1, n_max + 1))
    lengths = np.array(ns)
    # eisner2o takes arc[d, h]
    got = eisner2o((arc_hc.transpose(0, 2, 1), sib), lengths)
    want = eisner(arc_hc, lengths)
    for b, n in enumerate(ns):
        np.testing.assert_array_equal(got[b, 1 : n + 1], want[b, 1 : n + 1])


def test_eisner2o_sibling_scores_bruteforce():
    rng = np.random.default_rng(3)
    n = 4
    arc = rng.standard_normal((1, n + 1, n + 1))  # [d, h]
    sib = rng.standard_normal((1, n + 1, n + 1, n + 1))

    def score(heads):
        # heads: 1-based
        s = sum(arc[0, d, h] for d, h in enumerate(heads, 1))
        # sibling factors: consecutive outward children share a factor
        for h in range(n + 1):
            kids = [d for d, hh in enumerate(heads, 1) if hh == h]
            left = sorted([d for d in kids if d < h], reverse=True)
            right = sorted([d for d in kids if d > h])
            for seq in (left, right):
                for a, b in zip(seq, seq[1:]):
                    s += sib[0, b, h, a]
        return s

    best, best_score = None, -np.inf
    for heads in oracles.all_trees(n):
        sc = score(heads)
        if sc > best_score:
            best, best_score = heads, sc
    got = eisner2o((arc, sib), np.array([n]))[0]
    got_score = score(list(got[1:]))
    np.testing.assert_allclose(got_score, best_score, rtol=1e-9)


def test_mst_bruteforce():
    rng = np.random.default_rng(4)
    n = 4
    s = rng.standard_normal((n + 1, n + 1))
    got = chuliu_edmonds(s)
    import itertools

    best, best_score = None, -np.inf
    for heads in itertools.product(range(n + 1), repeat=n):
        full = [0] + list(heads)
        if not oracles.is_spanning(full):
            continue
        sc = sum(s[h, d] for d, h in enumerate(heads, 1))
        if sc > best_score:
            best, best_score = list(heads), sc
    got_score = sum(s[h, d] for d, h in enumerate(got, 1))
    np.testing.assert_allclose(got_score, best_score, rtol=1e-9)


def test_predicates():
    assert isprojective([2, 0, 2])
    assert not isprojective([2, -1, 1])
    assert not isprojective([3, -1, 2])
    assert istree([2, 0, 2], proj=True)
    assert not istree([2, 3, 1])  # cycle
    assert not istree([0, 0, 1], multiroot=False)
    assert istree([0, 0, 1], multiroot=True)
