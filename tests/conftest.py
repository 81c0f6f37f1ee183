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
# NO persistent compilation cache for tests: serializing an XLA:CPU
# executable that embeds interpret-mode pallas host callbacks segfaults
# inside compilation_cache.put_executable_and_time (observed three times
# in round 4, always late in a fresh-cache suite run once compile times
# crossed the write threshold). The cache exists for the remote-compile
# TPU transport; CPU-test recompiles are cheap. Cross-host reuse of CPU
# AOT entries is ALSO unsafe on this fleet (machine-feature mismatch ->
# SIGILL), so hermetic is doubly right.


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process native state: four full-suite runs segfaulted
    inside XLA:CPU compile/serialize paths late in the run (round 4,
    single-core VM), while every sub-suite and fresh-process run of the
    same tests passed. Dropping compiled executables at module teardown
    keeps the accumulated compiler state small; modules share almost no
    compilations, so the recompile cost is minimal."""
    yield
    import jax

    jax.clear_caches()
