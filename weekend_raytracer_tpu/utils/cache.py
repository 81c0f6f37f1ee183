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
            "weekend_raytracer_tpu", "jax",
        )
    try:
        os.makedirs(path, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a requirement
