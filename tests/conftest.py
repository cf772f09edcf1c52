"""Test configuration: CPU-simulated 8-device mesh, x64 enabled.

Must configure JAX before any backend initialization.  The axon TPU plugin
ignores the JAX_PLATFORMS env var, so we use jax.config explicitly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# PSGD_TEST_TPU=1 runs the suite on the real TPU backend (needed for the
# Pallas kernel tests, which skip on CPU).
if not os.environ.get("PSGD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
