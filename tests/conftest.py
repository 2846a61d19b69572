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

# Persistent compilation cache for the CPU test programs (separate from the
# committed TPU cache in .jax_cache): the suite compiles dozens of model-
# sized programs; warm reruns skip those compiles entirely.  Content-hashed
# keys make staleness impossible; the dir is gitignored.
try:
    _cpu_cache = os.path.join(os.path.dirname(__file__), os.pardir,
                              ".jax_cache_cpu")
    os.makedirs(_cpu_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.abspath(_cpu_cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # cache is an optimization, never a requirement
