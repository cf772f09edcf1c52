"""Test configuration: CPU-simulated 8-device mesh, x64 enabled.

Must configure JAX before any backend initialization.  The axon TPU plugin
ignores the JAX_PLATFORMS env var, so we use jax.config explicitly.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# persistent compilation cache: the suite is compile-bound (hundreds of
# distinct jitted programs); warm reruns skip XLA compilation entirely
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), "..", ".cache",
                                   "jax"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

# PSGD_TEST_TPU=1 runs the suite on the real TPU backend (needed for the
# Pallas kernel tests, which skip on CPU).
if not os.environ.get("PSGD_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
