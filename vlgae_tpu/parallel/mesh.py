"""Device mesh + sharding utilities.

Default is 1-D data parallelism (batch sharded over 'data', params
replicated, gradient psum inserted by XLA from the sharding
annotations). An optional 'model' axis shards the wide visual/matching
projections tensor-parallel (column-parallel first projections,
row-parallel consumer; XLA derives the activation all-reduce over ICI)
— the reference has no model parallelism (single-GPU DDP only), this is
TPU-native scaling headroom for larger visual stacks.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_parallel_mesh(devices=None, model: int = 1) -> Mesh:
    """('data', 'model') mesh; ``model=1`` is pure data parallelism."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, int(model))
    if n % model:
        raise ValueError(f"{n} devices not divisible by model={model}")
    return Mesh(np.asarray(devices).reshape(n // model, model),
                ("data", "model"))


# Flagship model-parallel layout: the 2048-d visual factor projections
# (the box/rel/attr/img factor heads — NOT e.g. a frozen ViT backbone
# living under vis_encoder, whose kernels must stay replicated) are
# column-parallel (output features sharded), their consumer
# (vis_mlp_pre_matching) row-parallel (input features sharded) — XLA
# inserts the single all-reduce after it.
DEFAULT_MODEL_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*vis_encoder.*/(box_fc|rel_fc|attr_fc|img_fc)(/[^/]+)?/kernel",
     P(None, "model")),
    (r".*vis_encoder.*/(box_fc|rel_fc|attr_fc|img_fc)(/[^/]+)?/bias",
     P("model")),
    (r".*vis_encoder.*/rel_fc_bias", P("model")),
    (r".*vis_mlp_pre_matching/kernel", P("model", None)),
)


def _path_name(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p)))
                    for p in path)


def param_spec(name: str, rules: Sequence[Tuple[str, P]]) -> P:
    for pat, spec in rules:
        if re.fullmatch(pat, name):
            return spec
    return P()


def fsdp_leaf_spec(x, dp: int, min_size: int = 1 << 16) -> P:
    """ZeRO-style fully-sharded spec for one leaf: shard the largest
    axis divisible by the 'data' mesh size, replicate small/indivisible
    leaves. Shape-based (not name-based): optimizer moments mirror the
    param shapes, so the same function shards `mu`/`nu` identically and
    XLA derives the all-gather-before-use / reduce-scatter-of-grads
    pattern from the annotations alone (scaling-book recipe; the
    reference is single-GPU DDP with no parameter sharding)."""
    shape = getattr(x, "shape", ())
    if dp <= 1 or len(shape) == 0 or int(np.prod(shape)) < min_size:
        return P()
    for a in sorted(range(len(shape)), key=lambda i: -shape[i]):
        if shape[a] % dp == 0:
            return P(*([None] * a + ["data"]))
    return P()


def shard_params(tree, mesh: Mesh,
                 rules: Sequence[Tuple[str, P]] = (),
                 fsdp: bool = False, fsdp_min_size: int = 1 << 16):
    """Device_put a param (or optimizer-state) tree with per-leaf
    shardings from regex rules; unmatched leaves replicate — or, with
    ``fsdp``, fully shard over 'data' (tensor-parallel rules win where
    both match). Optimizer states mirror the param tree inside their
    own structure, so the same rules match their `mu`/`nu` leaves too."""
    if "model" not in mesh.axis_names or mesh.shape.get("model", 1) == 1:
        rules = ()
    dp = mesh.shape.get("data", 1)

    def put(path, x):
        spec = param_spec(_path_name(path), rules)
        if fsdp and spec == P():
            spec = fsdp_leaf_spec(x, dp, fsdp_min_size)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, tree)


def tree_shardings(tree):
    """The per-leaf shardings of an already-placed tree (for jit
    in_shardings)."""
    return jax.tree_util.tree_map(lambda x: x.sharding, tree)


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Device_put a host batch with the leading axis sharded over 'data'."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        # device_put straight from the host buffer: going through
        # jnp.asarray first would commit the array to device 0 and turn
        # the sharded put into a device->device scatter
        return jax.device_put(
            x if isinstance(x, jax.Array) else np.asarray(x), sharding
        )

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


def sum_across_processes(vec: np.ndarray) -> np.ndarray:
    """Sum a metric state vector across hosts (the JAX counterpart of
    torchmetrics ``dist_reduce_fx='sum'``, ref: metric.py:21-26).

    Under the single-controller runtime every process sees the global
    outputs, so with one process this is the identity; in a multi-host
    launch each process accumulates its addressable shard and the states
    are summed over DCN here.
    """
    if jax.process_count() == 1:
        return np.asarray(vec)
    from jax.experimental import multihost_utils

    gathered = multihost_utils.process_allgather(np.asarray(vec))
    return np.asarray(gathered).sum(axis=0)


def gather_predictions(outputs: dict) -> dict:
    """All-gather per-process prediction dicts keyed by sample id and
    merge them (the ``all_gather_object`` + ``merge_outputs`` path of
    the reference, ref: pipeline.py:234-240, fn.py:166-175)."""
    if jax.process_count() == 1:
        return outputs
    import pickle

    from jax.experimental import multihost_utils

    from ..utils.fn import merge_outputs

    buf = np.frombuffer(pickle.dumps(outputs), np.uint8)
    sizes = multihost_utils.process_allgather(
        np.array([buf.size], np.int64)
    ).reshape(-1)
    padded = np.zeros(int(sizes.max()), np.uint8)
    padded[: buf.size] = buf
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    dicts = [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes())
        for i in range(gathered.shape[0])
    ]
    return merge_outputs([{"outputs": d} for d in dicts])["outputs"]


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
