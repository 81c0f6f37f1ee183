"""Test configuration: force an 8-device virtual CPU platform.

Tests run TPU-free (SURVEY.md §4: the CPU backend is the "fake backend" for
CI); multi-chip sharding tests use 8 virtual CPU devices via XLA's
host-platform device-count override. Must run before jax initializes.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
