"""Test configuration: force an 8-virtual-device CPU backend.

Tests run on CPU with 8 fake devices so the pjit/shard_map data-parallel
paths are exercised without real multi-chip hardware. Must run before jax
is imported anywhere.
"""
import os

# Force CPU: the ambient environment points JAX at the TPU tunnel
# (JAX_PLATFORMS=axon); tests must be hermetic, fast, and multi-"device".
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
jax.config.update("jax_default_matmul_precision", "highest")
