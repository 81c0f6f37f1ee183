"""Persistent compilation cache setup.

First XLA/Mosaic compiles take minutes on remote-compile TPU transports;
the persistent cache makes every subsequent process start instant for
already-seen (shape, kernel) signatures. Enabled by the Renderer, CLI,
viewer, and bench entry points; override the location with WRT_JAX_CACHE
or disable with WRT_JAX_CACHE=0.
"""
from __future__ import annotations

import os

_done = False


def _host_fingerprint() -> str:
    """Short hash of the host CPU's feature flags. XLA:CPU AOT cache
    entries embed machine features; loading one compiled on a host with
    a different ISA extension set can SIGILL mid-test (observed: entries
    from an avx512 prefer-no-scatter host segfaulting on a host without
    it). Salting the default cache dir per host keeps TPU-executable
    reuse on one machine while making cross-host CPU entries invisible."""
    import hashlib

    flags = b""
    try:
        with open("/proc/cpuinfo", "rb") as f:
            for line in f:
                if line.startswith(b"flags"):
                    flags = line
                    break
    except OSError:
        import platform

        flags = platform.processor().encode()
    return "host-" + hashlib.sha1(flags).hexdigest()[:10]


def enable_persistent_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    path = os.environ.get("WRT_JAX_CACHE")
    if path == "0":
        return
    if not path:
        path = os.path.join(
            os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache")),
            "weekend_raytracer_tpu", "jax", _host_fingerprint(),
        )
    try:
        import jax

        if jax.config.jax_platforms == "cpu":
            # Serializing XLA:CPU executables that embed interpret-mode
            # pallas host callbacks segfaults in the cache-write path
            # (round 4). The cache exists for the remote-compile TPU
            # transport; skip it when the process forced CPU.
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
