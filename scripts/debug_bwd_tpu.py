import numpy as np
import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from vlgae_tpu.ops import dmv_partition_pallas
from vlgae_tpu.struct import LogSemiring, dmv_marginals, dmv_partition
from test_struct_dmv import merged_batch, random_potentials

rng = np.random.default_rng(0)
params = [random_potentials(rng, n) for n in (3, 2, 4, 5)]
mdec, mattach, lengths = merged_batch(params)

f = np.asarray(dmv_partition_pallas(mdec, mattach, lengths))
fs = np.asarray(dmv_partition(mdec, mattach, lengths, LogSemiring))
print("fwd diff:", np.abs(f - fs).max())

gd, ga = jax.grad(
    lambda d, a: jnp.sum(dmv_partition_pallas(d, a, lengths)),
    argnums=(0, 1),
)(mdec, mattach)
wd, wa = dmv_marginals(mdec, mattach, lengths, LogSemiring)
gd, ga, wd, wa = map(np.asarray, (gd, ga, wd, wa))
print("attach diff:", np.abs(ga - wa).max())
print("dec diff:", np.abs(gd - wd).max())
d = np.abs(ga - wa)
idx = np.unravel_index(d.argmax(), d.shape)
print("attach worst at", idx, "pallas", ga[idx], "scan", wa[idx])
d = np.abs(gd - wd)
idx = np.unravel_index(d.argmax(), d.shape)
print("dec worst at", idx, "pallas", gd[idx], "scan", wd[idx])
b = idx[0]
print("len of worst b:", np.asarray(lengths)[b])
print("dec grads pallas b:\n", np.round(gd[b, :, :, :, :], 3))
print("dec grads scan b:\n", np.round(wd[b, :, :, :, :], 3))
