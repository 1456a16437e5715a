"""1-D data-parallel mesh: batch sharded, params replicated, psum via XLA."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device_put a host batch with the leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        return jax.device_put(jnp.asarray(x), sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )


def pad_batch_to_devices(batch: dict, n_devices: int,
                         pow2: bool = False, min_b: int = 8):
    """Pad the batch axis to a multiple of the mesh size.

    With ``pow2``, rounds the batch up to the next power of two (at
    least ``min_b``) so variable token-budget batch sizes collapse into
    a bounded set of compile shapes. Filler rows replicate row 0 with
    ``seq_len`` zeroed; losses mask zero-length rows.
    Returns (batch, real_size).
    """
    some = next(iter(batch.values()))
    B = some.shape[0]
    target = B
    if pow2:
        target = max(min_b, 1 << (B - 1).bit_length())
    target = target + ((-target) % n_devices)
    pad = target - B
    if pad == 0:
        return batch, B
    out = {}
    for k, v in batch.items():
        filler = np.repeat(np.asarray(v[:1]), pad, axis=0)
        if k == "seq_len":
            filler = np.zeros_like(filler)
        out[k] = np.concatenate([np.asarray(v), filler], axis=0)
    return out, B


def make_parallel_step(step_fn, mesh: Mesh, donate_state: bool = True):
    """Jit a (state, batch, ...) step with DP shardings over ``mesh``.

    Parameters/optimizer state replicated; batch sharded on axis 0; XLA
    derives the gradient psum over ICI from the output sharding.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data),
        donate_argnums=(0,) if donate_state else (),
    )
