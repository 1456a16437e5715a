import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from vlgae_tpu.ops import dmv_partition_pallas

B, N = 256, 30
rng = np.random.default_rng(0)
dec = jnp.asarray(rng.standard_normal((B, N + 1, 2, 2, 2)), jnp.float32)
lengths = jnp.full((B,), N, jnp.int32)
attaches = [
    jnp.asarray(rng.standard_normal((B, N + 1, N + 1, 2)), jnp.float32)
    for _ in range(16)
]

@jax.jit
def io(d, a, l):
    return jax.value_and_grad(lambda a_: jnp.sum(dmv_partition_pallas(d, a_, l)))(a)

v, g = io(dec, attaches[0], lengths)
jax.block_until_ready(g)

# throughput with varying inputs
t0 = time.perf_counter()
outs = []
for i in range(32):
    v, g = io(dec, attaches[i % 16], lengths)
    outs.append(g)
jax.block_until_ready(outs)
dt = (time.perf_counter() - t0) / 32
print(f"varying inputs: {dt*1e3:.3f} ms/iter -> {B/dt:.0f} sent/s")

# per-call latency (block each time)
t0 = time.perf_counter()
for i in range(8):
    v, g = io(dec, attaches[i % 16], lengths)
    jax.block_until_ready(g)
dt = (time.perf_counter() - t0) / 8
print(f"latency (sync): {dt*1e3:.3f} ms/iter -> {B/dt:.0f} sent/s")

# force completion via host transfer each iter
t0 = time.perf_counter()
acc = 0.0
for i in range(16):
    v, g = io(dec, attaches[i % 16], lengths)
    acc += float(jnp.sum(v))  # device->host sync
dt = (time.perf_counter() - t0) / 16
print(f"host-sync: {dt*1e3:.3f} ms/iter -> {B/dt:.0f} sent/s  (acc={acc:.1f})")

# pipelined: issue all, fetch only the last value
t0 = time.perf_counter()
last = None
for i in range(32):
    v, g = io(dec, attaches[i % 16], lengths)
    last = v
_ = float(jnp.sum(last))
dt = (time.perf_counter() - t0) / 32
print(f"pipelined+final-fetch: {dt*1e3:.3f} ms/iter -> {B/dt:.0f} sent/s")
