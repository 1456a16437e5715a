import numpy as np
import jax
import jax.numpy as jnp
import sys
sys.path.insert(0, "/root/repo")

from vlgae_tpu.ops import dmv_partition_pallas
from vlgae_tpu.struct import LogSemiring, dmv_marginals, dmv_partition


def check(B, N, lens):
    rng = np.random.default_rng(0)
    dec = jnp.asarray(rng.standard_normal((B, N + 1, 2, 2, 2)), jnp.float32)
    attach = jnp.asarray(rng.standard_normal((B, N + 1, N + 1, 2)), jnp.float32)
    lengths = jnp.asarray(lens, jnp.int32)
    gd, ga = jax.grad(
        lambda d, a: jnp.sum(dmv_partition_pallas(d, a, lengths)),
        argnums=(0, 1),
    )(dec, attach)
    wd, wa = dmv_marginals(dec, attach, lengths, LogSemiring)
    ea = np.abs(np.asarray(ga) - np.asarray(wa)).max()
    ed = np.abs(np.asarray(gd) - np.asarray(wd)).max()
    print(f"B={B} N={N} lens={lens[:3]}...: attach_err={ea:.2e} dec_err={ed:.2e}")
    return max(ea, ed)


rng = np.random.default_rng(1)
check(4, 6, [5, 5, 5, 5])
check(4, 8, [8, 8, 8, 8])
check(4, 12, [12, 11, 10, 12])
check(4, 16, [16, 16, 16, 16])
check(4, 24, [24, 20, 24, 24])
check(4, 30, [30, 30, 30, 30])
check(128, 30, rng.integers(20, 31, 128).tolist())
check(256, 30, rng.integers(20, 31, 256).tolist())
