"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware.

The environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) and the plugin
ignores the env var, so we override through jax.config instead. XLA_FLAGS
must still be set before the backend initialises.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
