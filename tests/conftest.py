"""Test config: force a virtual 8-device CPU mesh before JAX imports.

This gives multi-chip sharding tests without TPU hardware — the
multi-node simulation the reference never had (SURVEY.md §4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (after env setup)

# The environment's sitecustomize registers the TPU (axon) backend in every
# process and overrides JAX_PLATFORMS from the env — force CPU at the
# config level (must happen before the backend is initialized).
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA compiles of the scan-based models dominate
# test wall-time; cache them across runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
