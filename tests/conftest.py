"""Test harness: force an 8-device virtual CPU platform before importing JAX.

This is the standard JAX substitute for multi-chip hardware (SURVEY.md §4):
sharding/collective code paths compile and run on 8 virtual CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize registers the axon TPU plugin and latches
# JAX_PLATFORMS before conftest runs; override via config so tests really run
# on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache so repeated test runs don't re-lower/re-compile
# identical HLO (first full run pays ~minutes on the CPU backend).
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
