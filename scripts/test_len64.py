import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vlgae_tpu.ops.dmv_pallas import _make_dmv_total
from vlgae_tpu.struct import LogSemiring, dmv_marginals, dmv_partition

total_fn = _make_dmv_total(is_max=False, interpret=False)

for N, B in ((50, 128), (64, 128)):
    rng = np.random.default_rng(0)
    dec = jnp.asarray(rng.standard_normal((B, N + 1, 2, 2, 2)), jnp.float32)
    attach = jnp.asarray(
        rng.standard_normal((B, N + 1, N + 1, 2)), jnp.float32)
    lengths = jnp.full((B,), N, jnp.int32)
    try:
        got = np.asarray(total_fn(dec, attach, lengths))
        want = np.asarray(dmv_partition(dec, attach, lengths, LogSemiring))
        print(f"N={N} fwd err: {np.abs(got - want).max():.2e}")
        gd, ga = jax.grad(
            lambda d, a: jnp.sum(total_fn(d, a, lengths)), argnums=(0, 1)
        )(dec, attach)
        wd, wa = dmv_marginals(dec, attach, lengths, LogSemiring)
        print(f"N={N} bwd err: attach "
              f"{np.abs(np.asarray(ga)-np.asarray(wa)).max():.2e} dec "
              f"{np.abs(np.asarray(gd)-np.asarray(wd)).max():.2e}")
    except Exception as e:
        print(f"N={N} FAILED: {type(e).__name__}: {str(e)[:300]}")
