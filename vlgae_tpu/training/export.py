"""Model export for serving: serialize the jitted forward to StableHLO.

Production counterpart absent from the reference (its serving story was
"load the Lightning checkpoint in Python"). Here the decode-path forward
is exported with ``jax.export`` to a portable StableHLO artifact that a
serving runtime (or a later framework version) can execute without the
model-building Python code.
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def export_forward(model, params, example_inputs: Dict, path: str,
                   platforms=("tpu", "cpu")):
    """Serialize ``model.apply`` (deterministic forward) to ``path``.

    The exported function is closed over the parameters, so the artifact
    is self-contained. Returns the serialized byte size.
    """
    from jax import export as jax_export

    def forward(inputs):
        out = model.apply(params, inputs, deterministic=True)
        # keep only the score tensors needed for decoding
        keys = ("merged_dec", "merged_attach")
        return {k: out[k] for k in keys if k in out}

    args = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.asarray(x).shape,
                                       jnp.asarray(x).dtype),
        dict(example_inputs),
    )
    exported = jax_export.export(
        jax.jit(forward), platforms=list(platforms)
    )(args)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return len(data)


def load_forward(path: str):
    """Deserialize an exported forward; returns a callable."""
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    return exported.call
