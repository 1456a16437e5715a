"""Test configuration: force CPU with 8 virtual devices.

Multi-device sharding tests run on a virtual CPU mesh, which the
reference (single-GPU PyTorch) never had an equivalent of.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may have pre-imported jax with a TPU
# plugin backend; force the CPU platform regardless (tests must not
# tunnel every eager op to a remote TPU).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
