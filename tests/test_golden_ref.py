"""Golden-tensor parity against the ACTUAL reference implementation.

Fixtures in tests/golden/*.npz were produced by running the reference
torch-struct fork directly (scripts/make_golden_fixtures.py) on fixed
random potentials:
  - dmv_ref.npz:     DMV1o merge/partition/marginals/max/argmax
                     (ref: dmv.py:19-66, distributions.py:245-265)
  - deptree_ref.npz: DependencyCRF partition/marginals/max/argmax +
                     matrix-tree partition/marginals
                     (ref: deptree.py:25-76, 277-322)

These tests pin the JAX chart fills AND the Pallas interpret kernels to
the reference outputs bit-for-bit (fp32 tolerance).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vlgae_tpu.ops import (
    dmv_max_pallas_interpret,
    dmv_partition_pallas_interpret,
)
from vlgae_tpu.struct import LogSemiring, MaxSemiring
from vlgae_tpu.struct.deptree import (
    deptree_marginals,
    deptree_nonproj_marginals,
    deptree_nonproj_partition,
    deptree_partition,
)
from vlgae_tpu.struct.distributions import dmv_merge
from vlgae_tpu.struct.dmv import dmv_marginals, dmv_partition

GOLDEN = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


@pytest.fixture(scope="module")
def dmv_ref():
    return np.load(os.path.join(GOLDEN, "dmv_ref.npz"))


@pytest.fixture(scope="module")
def deptree_ref():
    return np.load(os.path.join(GOLDEN, "deptree_ref.npz"))


def test_dmv_merge_matches_reference(dmv_ref):
    d = dmv_ref
    mdec, mattach = dmv_merge(
        jnp.asarray(d["dec"]), jnp.asarray(d["attach"]),
        jnp.asarray(d["root"])
    )
    np.testing.assert_allclose(np.asarray(mdec), d["merged_dec"], rtol=0)
    np.testing.assert_allclose(
        np.asarray(mattach), d["merged_attach"], rtol=0
    )


def test_dmv_partition_matches_reference(dmv_ref):
    d = dmv_ref
    lengths = jnp.asarray(d["lengths"].astype(np.int32))
    got = np.asarray(dmv_partition(
        jnp.asarray(d["merged_dec"]), jnp.asarray(d["merged_attach"]),
        lengths, LogSemiring,
    ))
    np.testing.assert_allclose(got, d["partition"].reshape(-1), rtol=2e-5)
    got_max = np.asarray(dmv_partition(
        jnp.asarray(d["merged_dec"]), jnp.asarray(d["merged_attach"]),
        lengths, MaxSemiring,
    ))
    np.testing.assert_allclose(got_max, d["max"].reshape(-1), rtol=2e-5)


def test_dmv_marginals_argmax_match_reference(dmv_ref):
    d = dmv_ref
    lengths = jnp.asarray(d["lengths"].astype(np.int32))
    mdec = jnp.asarray(d["merged_dec"])
    mattach = jnp.asarray(d["merged_attach"])
    _, marg = dmv_marginals(mdec, mattach, lengths, LogSemiring)
    np.testing.assert_allclose(
        np.asarray(marg), d["marginals"], rtol=1e-4, atol=1e-5
    )
    _, amax = dmv_marginals(mdec, mattach, lengths, MaxSemiring)
    np.testing.assert_allclose(
        np.asarray(amax), d["argmax"], rtol=1e-4, atol=1e-5
    )


def test_dmv_pallas_matches_reference(dmv_ref):
    d = dmv_ref
    lengths = jnp.asarray(d["lengths"].astype(np.int32))
    mdec = jnp.asarray(d["merged_dec"])
    mattach = jnp.asarray(d["merged_attach"])
    got = np.asarray(dmv_partition_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(
        got, d["partition"].reshape(-1), rtol=2e-4, atol=2e-4
    )
    got_max = np.asarray(dmv_max_pallas_interpret(mdec, mattach, lengths))
    np.testing.assert_allclose(
        got_max, d["max"].reshape(-1), rtol=2e-4, atol=2e-4
    )

    def total(a):
        return jnp.sum(dmv_partition_pallas_interpret(mdec, a, lengths))

    marg = np.asarray(jax.grad(total)(mattach))
    np.testing.assert_allclose(marg, d["marginals"], rtol=1e-3, atol=1e-4)


def test_deptree_matches_reference(deptree_ref):
    d = deptree_ref
    lengths = jnp.asarray(d["lengths"].astype(np.int32))
    arc = jnp.asarray(d["arc"])
    got = np.asarray(deptree_partition(arc, lengths, LogSemiring))
    np.testing.assert_allclose(got, d["partition"].reshape(-1), rtol=2e-5)
    got_max = np.asarray(deptree_partition(arc, lengths, MaxSemiring))
    np.testing.assert_allclose(got_max, d["max"].reshape(-1), rtol=2e-5)
    marg = np.asarray(deptree_marginals(arc, lengths, LogSemiring))
    np.testing.assert_allclose(marg, d["marginals"], rtol=1e-4, atol=1e-5)
    amax = np.asarray(deptree_marginals(arc, lengths, MaxSemiring))
    np.testing.assert_allclose(amax, d["argmax"], rtol=1e-4, atol=1e-5)


def test_matrix_tree_matches_reference(deptree_ref):
    d = deptree_ref
    arc = jnp.asarray(d["mtt_arc"])
    got = np.asarray(deptree_nonproj_partition(arc))
    np.testing.assert_allclose(got, d["mtt_partition"], rtol=1e-4)
    marg = np.asarray(deptree_nonproj_marginals(arc))
    np.testing.assert_allclose(
        marg, d["mtt_marginals"], rtol=1e-4, atol=1e-5
    )
