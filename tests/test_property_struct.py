"""Randomized property tests for the structured-inference core.

The fixed-seed unit tests pin specific shapes; these hypothesis sweeps
draw random sentence lengths, potentials, and length mixes, checking
the scan fills (and through `dmv_merge` the root conventions) against
the brute-force enumeration oracles the reference's torch-struct fork
kept for the same purpose (ref: deptree.py:213-228 enumerate).
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

import oracles

from vlgae_tpu.struct import (
    DependencyCRF,
    LogSemiring,
    MaxSemiring,
    dmv_merge,
    dmv_partition,
)

# bounded potentials: logsumexp over <=6!-ish trees stays well
# conditioned, so fp32-vs-f64-oracle tolerances can be tight
pot = st.floats(min_value=-3.0, max_value=3.0)


def _dmv_instance(draw, n):
    dec = np.array(
        draw(st.lists(pot, min_size=n * 8, max_size=n * 8))
    ).reshape(n, 2, 2, 2).astype(np.float32)
    attach = np.array(
        draw(st.lists(pot, min_size=n * n * 2, max_size=n * n * 2))
    ).reshape(n, n, 2).astype(np.float32)
    root = np.array(
        draw(st.lists(pot, min_size=n, max_size=n))
    ).astype(np.float32)
    return dec, attach, root


@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.data(), st.integers(min_value=1, max_value=5))
def test_dmv_partition_matches_bruteforce(data, n):
    dec, attach, root = _dmv_instance(data.draw, n)
    mdec, mattach = dmv_merge(
        jnp.asarray(dec)[None], jnp.asarray(attach)[None],
        jnp.asarray(root)[None],
    )
    lengths = jnp.asarray([n])
    got_log = float(dmv_partition(mdec, mattach, lengths, LogSemiring)[0])
    got_max = float(dmv_partition(mdec, mattach, lengths, MaxSemiring)[0])
    want_log = oracles.brute_dmv(dec, attach, root, n)
    want_max = oracles.brute_dmv(dec, attach, root, n, op=max)
    assert abs(got_log - want_log) < 1e-3
    assert abs(got_max - want_max) < 1e-3


@settings(max_examples=25, deadline=None, derandomize=True)
@given(st.data(), st.integers(min_value=1, max_value=5))
def test_deptree_partition_and_argmax_match_bruteforce(data, n):
    arc = np.array(
        data.draw(st.lists(pot, min_size=(n + 1) * (n + 1),
                           max_size=(n + 1) * (n + 1)))
    ).reshape(n + 1, n + 1).astype(np.float32)
    crf = DependencyCRF(jnp.asarray(arc)[None], jnp.asarray([n]))
    got_log = float(crf.partition[0])
    want_log = oracles.brute_deptree(arc, n)
    assert abs(got_log - want_log) < 1e-3

    got_max = float(crf.max[0])
    want_max = oracles.brute_deptree(arc, n, op=max)
    assert abs(got_max - want_max) < 1e-3

    # the argmax heads must score exactly the Viterbi value
    heads = np.asarray(crf.argmax_heads)[0][:n]
    scored = oracles.score_deptree(arc, list(heads))
    assert abs(scored - want_max) < 1e-3


@settings(max_examples=10, deadline=None, derandomize=True)
@given(st.data(),
       st.lists(st.integers(min_value=1, max_value=5), min_size=2,
                max_size=4))
def test_dmv_ragged_batch_matches_per_sentence(data, ns):
    """A padded ragged batch gives each sentence exactly its standalone
    partition (padding never leaks across rows)."""
    insts = [_dmv_instance(data.draw, n) for n in ns]
    n_max = max(ns)
    B = len(ns)
    dec = np.zeros((B, n_max, 2, 2, 2), np.float32)
    attach = np.full((B, n_max, n_max, 2), -1e12, np.float32)
    root = np.full((B, n_max), -1e12, np.float32)
    for b, (d, a, r) in enumerate(insts):
        n = ns[b]
        dec[b, :n] = d
        attach[b, :n, :n] = a
        root[b, :n] = r
    mdec, mattach = dmv_merge(
        jnp.asarray(dec), jnp.asarray(attach), jnp.asarray(root)
    )
    got = np.asarray(
        dmv_partition(mdec, mattach, jnp.asarray(ns), LogSemiring)
    )
    for b, (d, a, r) in enumerate(insts):
        want = oracles.brute_dmv(d, a, r, ns[b])
        assert abs(float(got[b]) - want) < 1e-3


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.data(), st.integers(min_value=2, max_value=5))
def test_eisner_viterbi_matches_crf_randomized(data, n):
    """Host Eisner backtracker == kernel-free CRF Viterbi on random
    potentials (two independent implementations of the same decode,
    ref: alg.py:9-69 vs deptree.py:25-76)."""
    from vlgae_tpu.struct.alg import eisner

    arc = np.array(
        data.draw(st.lists(pot, min_size=(n + 1) * (n + 1),
                           max_size=(n + 1) * (n + 1)))
    ).reshape(n + 1, n + 1).astype(np.float32)
    crf = DependencyCRF(jnp.asarray(arc)[None], jnp.asarray([n]))
    want = float(crf.max[0])
    heads = eisner(arc[None], np.asarray([n]))[0, 1:n + 1]
    scored = oracles.score_deptree(arc, list(heads))
    assert abs(scored - want) < 1e-3


@settings(max_examples=15, deadline=None, derandomize=True)
@given(st.data(), st.integers(min_value=2, max_value=4))
def test_mst_beats_or_ties_projective_viterbi(data, n):
    """Chu-Liu/Edmonds maximizes over ALL spanning arborescences, a
    superset of projective trees: its score must dominate the
    projective Viterbi (ref: alg.py:473-612)."""
    from vlgae_tpu.struct.alg import mst

    arc = np.array(
        data.draw(st.lists(pot, min_size=(n + 1) * (n + 1),
                           max_size=(n + 1) * (n + 1)))
    ).reshape(n + 1, n + 1).astype(np.float32)
    crf = DependencyCRF(jnp.asarray(arc)[None], jnp.asarray([n]))
    proj_best = float(crf.max[0])
    heads = mst(arc[None], np.asarray([n]))[0, 1:n + 1]
    scored = oracles.score_deptree(arc, list(heads))
    assert scored >= proj_best - 1e-3
