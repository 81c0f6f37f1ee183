"""Test configuration: force an 8-device virtual CPU platform.

Tests run TPU-free (SURVEY.md §4: the CPU backend is the "fake backend" for
CI); multi-chip sharding tests use 8 virtual CPU devices. The environment's
sitecustomize pins JAX_PLATFORMS to the axon TPU plugin, so the env-var
route is overridden — use jax.config directly before any backend use.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_threefry_partitionable", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
