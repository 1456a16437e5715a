import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, C, BT = 14, 16, 128
N1, N1R = 7, 8


def kernel(x_ref, out_ref, scratch):
    scratch[:, :, :, :] = x_ref[:, :, :, :]

    def body(w, _):
        # double dynamic slice: row start (N1 - w), col start w
        slab = scratch[pl.ds(N1 - w, N1), :, pl.ds(w, N1R), :]
        out_ref[w, :, :, :] = jnp.max(slab, axis=0)
        return 0

    lax.fori_loop(1, N1, body, 0)
    out_ref[0, :, :, :] = jnp.zeros((2, N1R, BT), jnp.float32)


x = (
    np.arange(R * C, dtype=np.float32).reshape(R, 1, C, 1)
    * np.ones((1, 2, 1, BT), np.float32)
)
x[:, 1] += 0.5
xj = jnp.asarray(x)

out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((N1, 2, N1R, BT), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((R, 2, C, BT), jnp.float32)],
)(xj)
out = np.asarray(out)

# expected
exp = np.zeros((N1, 2, N1R, BT), np.float32)
for w in range(1, N1):
    slab = x[N1 - w: N1 - w + N1, :, w: w + N1R, :]
    exp[w] = slab.max(0)
err = np.abs(out[1:] - exp[1:]).max()
print("double-dynamic-slice read err:", err)
for w in range(1, N1):
    e = np.abs(out[w] - exp[w]).max()
    if e > 0:
        print(f"  w={w}: err={e}")
