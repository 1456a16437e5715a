import numpy as np
import jax
import jax.numpy as jnp

import os, sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
os.environ["JAX_PLATFORMS"] = "cpu"

from vlgae_tpu.ops import dmv_partition_pallas_interpret
from vlgae_tpu.struct import LogSemiring, dmv_marginals, dmv_partition
from test_struct_dmv import merged_batch, random_potentials

rng = np.random.default_rng(0)
params = [random_potentials(rng, n) for n in (3, 2)]
mdec, mattach, lengths = merged_batch(params)

f = np.asarray(dmv_partition_pallas_interpret(mdec, mattach, lengths))
fs = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
print("fwd diff:", np.abs(f - fs).max())

gd, ga = jax.grad(
    lambda d, a: jnp.sum(dmv_partition_pallas_interpret(d, a, lengths)),
    argnums=(0, 1),
)(mdec, mattach)
wd, wa = dmv_marginals(mdec, mattach, lengths, LogSemiring)
gd, ga, wd, wa = map(np.asarray, (gd, ga, wd, wa))
print("attach diff:", np.abs(ga - wa).max())
print("dec diff:", np.abs(gd - wd).max())
d = np.abs(gd - wd)
idx = np.unravel_index(d.argmax(), d.shape)
print("worst at", idx, "pallas", gd[idx], "scan", wd[idx])
# breakdown by decision component
for dir_ in (0, 1):
    for dec_ in (0, 1):
        print(
            f"dir={dir_} dec={dec_} maxdiff",
            np.abs(gd[:, :, dir_, :, dec_] - wd[:, :, dir_, :, dec_]).max(),
        )
