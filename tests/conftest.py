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

# Persistent jit cache: most of the suite's wall-clock is XLA compiles,
# which are identical run to run. Second runs of the default selection
# drop from minutes to well under two.
import pathlib  # noqa: E402

_cache = pathlib.Path(__file__).resolve().parent.parent / ".cache" / "jax"
_cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
