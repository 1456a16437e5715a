"""exact_top_k == jax.lax.top_k, values AND indices (incl. tie order).

The grounding decode's top-5 (ref: /root/reference/src/model/joint.py:
506-629) runs through ops.topk.exact_top_k on every path; these tests
pin it to lax.top_k bit-for-bit so the swap is behavior-free. XLA's
TopK is stable (ties ordered by ascending index) and iterated argmax
picks tie-plateau members lowest-index-first — the same order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vlgae_tpu.ops import exact_top_k


def _check(x, k):
    v_ref, i_ref = jax.lax.top_k(x, k)
    v_got, i_got = exact_top_k(x, k)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))


@pytest.mark.parametrize("shape,k", [
    ((7, 11, 703), 5),   # the decode shape family (wide odd lanes)
    ((64,), 1),
    ((3, 5), 5),         # k == lane width
    ((2, 3, 17), 3),
])
def test_matches_lax_top_k_random(shape, k):
    rng = np.random.default_rng(0)
    _check(jnp.asarray(rng.standard_normal(shape), jnp.float32), k)


def test_tie_plateaus_match_lax_order():
    # large exact tie plateaus, incl. the decode's -1e20 masked fill and
    # its -1e10/-100 post-edit levels (tie order within a plateau is
    # what a blind index comparison would get wrong)
    rng = np.random.default_rng(1)
    x = rng.choice(
        np.asarray([-1e20, -1e10, -100.0, 0.0, 1.0, 2.0], np.float32),
        size=(5, 9, 64),
    )
    _check(jnp.asarray(x), 5)


def test_all_equal_rows():
    _check(jnp.full((4, 6, 33), -1e20, jnp.float32), 5)
    _check(jnp.zeros((2, 8), jnp.float32), 3)


def test_bf16_dtype():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((3, 4, 40)), jnp.bfloat16)
    _check(x, 4)


def test_neg_inf_rows_match():
    # -inf entries must not be re-picked (the working copy clamps at
    # finfo.min so -inf stays available as the mask value)
    x = np.full((3, 8), -np.inf, np.float32)
    x[0, 5] = 1.0
    x[1, :] = [-np.inf, 2.0, -np.inf, 2.0, 0.0, -np.inf, -1.0, 3.0]
    _check(jnp.asarray(x), 5)


def test_int_dtype_rejected():
    with pytest.raises(TypeError):
        exact_top_k(jnp.zeros((2, 4), jnp.int32), 2)


def test_under_jit_and_grad_free_path():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((6, 129)), jnp.float32)
    v_ref, i_ref = jax.lax.top_k(x, 5)
    v_got, i_got = jax.jit(lambda a: exact_top_k(a, 5))(x)
    np.testing.assert_array_equal(np.asarray(v_got), np.asarray(v_ref))
    np.testing.assert_array_equal(np.asarray(i_got), np.asarray(i_ref))


def test_k_validation():
    x = jnp.zeros((2, 4))
    with pytest.raises(ValueError):
        exact_top_k(x, 0)
    with pytest.raises(ValueError):
        exact_top_k(x, 5)
