"""Test configuration: CPU-simulated 8-device mesh, x64 enabled.

Must configure JAX before any backend initialization.  The axon TPU plugin
ignores the JAX_PLATFORMS env var, so we use jax.config explicitly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
