import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from vlgae_tpu.ops import dmv_pallas as dp
from vlgae_tpu.struct import LogSemiring, dmv_partition

rng = np.random.default_rng(0)
B, N = 4, 6
n1 = N + 1
dec = jnp.asarray(rng.standard_normal((B, n1, 2, 2, 2)), jnp.float32)
attach = jnp.asarray(rng.standard_normal((B, n1, n1, 2)), jnp.float32)
lengths = jnp.full((B,), N, jnp.int32)

n1r = dp._round8(n1)
attL, attR, seedR, seedL = jax.jit(
    lambda d, a: dp._prep_inputs(d, a, n1r)
)(dec, attach)
attL = dp._pad_batch(attL, dp.NEGINF)
attR = dp._pad_batch(attR, dp.NEGINF)
seedR = dp._pad_batch(seedR, dp.NEGINF)
seedL = dp._pad_batch(seedL, dp.NEGINF)
lrow = dp._pad_batch(lengths[None, :], 1)

want = np.asarray(dmv_partition(dec, attach, lengths, LogSemiring))

# v1 path (force flag off)
dp.USE_V2_INSIDE = False
out1, charts1 = dp._pallas_inside_call(
    attL, attR, seedR, seedL, lrow, is_max=False, interpret=False,
    save_charts=True,
)
dp.USE_V2_INSIDE = True
out2, charts2 = dp._pallas_inside_call(
    attL, attR, seedR, seedL, lrow, is_max=False, interpret=False,
    save_charts=True,
)
out1, out2 = np.asarray(out1)[:B], np.asarray(out2)[:B]
print("v1 fwd err vs scan:", np.abs(out1 - want).max())
print("v2 fwd err vs scan:", np.abs(out2 - want).max())
names = ["Cr", "Cl", "Ir", "Il"]
for name, c1, c2 in zip(names, charts1, charts2):
    c1, c2 = np.asarray(c1), np.asarray(c2)
    d = np.abs(np.clip(c1, -1e11, None) - np.clip(c2, -1e11, None))
    print(f"{name}: maxdiff={d.max():.3e} at {np.unravel_index(d.argmax(), d.shape)}")
