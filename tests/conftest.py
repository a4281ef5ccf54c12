"""Test harness configuration.

Tests run on CPU with 8 virtual devices so sharding paths (shard_map over a
jax.sharding.Mesh) are exercised without TPU hardware. Must be set before jax
initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The env var alone does not displace the axon TPU plugin in this image;
# jax.config does.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
