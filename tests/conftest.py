"""Test config: force CPU with 8 virtual devices so multi-chip sharding is
exercised without TPU hardware (SURVEY §4's fake-cluster strategy)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's sitecustomize may pre-register an 'axon' TPU platform
# and set jax_platforms via config (which outranks the env var) — force CPU
# explicitly so tests run on the 8 virtual devices.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
