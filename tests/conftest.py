"""Test configuration.

JAX tests run on a virtual 8-device CPU mesh so multi-chip sharding paths are
exercised without TPU hardware; set before jax is imported anywhere.
"""

import os

# Hard-set (the environment may point JAX_PLATFORMS at the tunneled TPU;
# tests must run on the virtual CPU mesh).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize registers the axon TPU backend and pins
# jax_platforms directly in the config, overriding the env var — force it
# back to CPU before any backend initialization.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
