import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vlgae_tpu.ops import dmv_partition_pallas
from vlgae_tpu.ops.dmv_pallas import (
    _pallas_inside_call, _prep_inputs, _round8, NEGINF,
)

B, N = 256, 30
N1 = N + 1
ITERS = 256
rng = np.random.default_rng(0)
dec = jnp.asarray(rng.standard_normal((B, N1, 2, 2, 2)), jnp.float32)
attach = jnp.asarray(rng.standard_normal((B, N1, N1, 2)), jnp.float32)
lengths = jnp.full((B,), N, jnp.int32)
n1r = _round8(N1)

attL, attR, seedR, seedL = jax.jit(
    lambda d, a: _prep_inputs(d, a, n1r)
)(dec, attach)
lrow = lengths[None, :]
deltas = jnp.asarray(rng.standard_normal((8,)).astype(np.float32) * 0.01)


def timed(name, fn, first_arg, *rest):
    @jax.jit
    def many(x0, *a):
        def body(acc, i):
            x = x0 + deltas[i % 8]
            out = fn(x, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + jnp.sum(leaf) * 1e-9, None
        acc, _ = lax.scan(body, jnp.zeros(()), jnp.arange(ITERS))
        return acc
    float(many(first_arg, *rest))
    t0 = time.perf_counter()
    float(many(first_arg, *rest))
    dt = (time.perf_counter() - t0 - 0.030) / ITERS  # ~30ms tunnel RTT
    print(f"{name:28s} {dt*1e3:8.3f} ms/iter  {B/dt:10.0f} sent/s")
    return dt


timed("prep only", lambda a, d: _prep_inputs(d, a, n1r), attach, dec)
timed("inside (value only)",
      lambda aL, *a: _pallas_inside_call(aL, *a, is_max=False,
                                         interpret=False)[0],
      attL, attR, seedR, seedL, lrow)
timed("inside (save charts)",
      lambda aL, *a: _pallas_inside_call(aL, *a, is_max=False,
                                         interpret=False,
                                         save_charts=True)[0],
      attL, attR, seedR, seedL, lrow)
timed("full fwd",
      lambda a, d, l: dmv_partition_pallas(d, a, l), attach, dec, lengths)
timed("full fwd+bwd",
      lambda a, d, l: jax.value_and_grad(
          lambda a_: jnp.sum(dmv_partition_pallas(d, a_, l)))(a)[1],
      attach, dec, lengths)
