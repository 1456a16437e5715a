"""Smoke test + microbench of the Pallas DMV kernel on real TPU hardware."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from vlgae_tpu.ops import dmv_max_pallas, dmv_partition_pallas
from vlgae_tpu.struct import LogSemiring, MaxSemiring, dmv_marginals, dmv_partition

print("backend:", jax.default_backend(), jax.devices())

B, N = 256, 30
rng = np.random.default_rng(0)
dec = jnp.asarray(rng.standard_normal((B, N + 1, 2, 2, 2)), jnp.float32)
attach = jnp.asarray(rng.standard_normal((B, N + 1, N + 1, 2)), jnp.float32)
lengths = jnp.asarray(rng.integers(20, N + 1, B), jnp.int32)

# correctness vs pure-JAX scan
want = np.asarray(dmv_partition(dec, attach, lengths, LogSemiring))
got = np.asarray(dmv_partition_pallas(dec, attach, lengths))
err = np.abs(got - want).max()
print("fwd max abs err:", err)

wmax = np.asarray(dmv_partition(dec, attach, lengths, MaxSemiring))
gmax = np.asarray(dmv_max_pallas(dec, attach, lengths))
print("max fwd err:", np.abs(gmax - wmax).max())


def grad_pallas(d, a):
    return jax.grad(lambda a_: jnp.sum(dmv_partition_pallas(d, a_, lengths)))(a)


ga = np.asarray(grad_pallas(dec, attach))
_, wa = dmv_marginals(dec, attach, lengths, LogSemiring)
print("bwd max abs err:", np.abs(ga - np.asarray(wa)).max())


def bench(fn, *args, iters=20):
    fn(*args).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    r.block_until_ready()
    return (time.perf_counter() - t0) / iters


fwd_pallas = jax.jit(dmv_partition_pallas)
fwd_scan = jax.jit(lambda d, a, l: dmv_partition(d, a, l, LogSemiring))
vg_pallas = jax.jit(
    lambda d, a, l: jax.value_and_grad(
        lambda a_: jnp.sum(dmv_partition_pallas(d, a_, l))
    )(a)
)
vg_scan = jax.jit(
    lambda d, a, l: jax.value_and_grad(
        lambda a_: jnp.sum(dmv_partition(d, a_, l, LogSemiring))
    )(a)
)

t = bench(fwd_pallas, dec, attach, lengths)
print(f"pallas fwd:    {t*1e3:8.3f} ms  {B/t:12.0f} sent/s")
t = bench(fwd_scan, dec, attach, lengths)
print(f"scan fwd:      {t*1e3:8.3f} ms  {B/t:12.0f} sent/s")
t = bench(lambda d, a, l: vg_pallas(d, a, l)[1], dec, attach, lengths)
print(f"pallas fwd+bwd:{t*1e3:8.3f} ms  {B/t:12.0f} sent/s")
t = bench(lambda d, a, l: vg_scan(d, a, l)[1], dec, attach, lengths)
print(f"scan fwd+bwd:  {t*1e3:8.3f} ms  {B/t:12.0f} sent/s")
