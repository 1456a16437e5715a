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
    scratch[:, :, :, :] = jnp.full((R, 2, C, BT), -1.0, jnp.float32)

    def body(w, _):
        row = x_ref[w, :, :, :]  # [2, N1R, BT]
        scratch[N1 - 1 - w, :, pl.ds(w, N1R), :] = row
        return 0

    lax.fori_loop(0, N1, body, 0)
    out_ref[:, :, :, :] = scratch[:, :, :, :]


x = (
    np.arange(N1 * N1R, dtype=np.float32).reshape(N1, 1, N1R, 1)
    * np.ones((1, 2, 1, BT), np.float32)
)
x[:, 1] += 0.5
out = pl.pallas_call(
    kernel,
    out_shape=jax.ShapeDtypeStruct((R, 2, C, BT), jnp.float32),
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    scratch_shapes=[pltpu.VMEM((R, 2, C, BT), jnp.float32)],
)(jnp.asarray(x))
out = np.asarray(out)

exp = np.full((R, 2, C, BT), -1.0, np.float32)
for w in range(N1):
    exp[N1 - 1 - w, :, w: w + N1R, :] = x[w]
err = np.abs(out - exp).max()
print("dynamic row+colshift write err:", err)
if err > 0:
    bad = np.argwhere(np.abs(out - exp) > 0)
    print("first bad:", bad[0], "got", out[tuple(bad[0])],
          "want", exp[tuple(bad[0])])
