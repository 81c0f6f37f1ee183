"""Headline benchmark: rays/sec/chip on the RTiOW final scene at 1080p.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline (BASELINE.md): 1e9 rays/sec/chip on TPU v5e, 1080p, 100 spp,
RTiOW final scene (~480 spheres, defocus camera).

A ray here is one path segment traced (pixels x spp x bounces): the
wavefront tracer performs the full bounce budget of scene-intersection +
scatter work per sample (dead lanes are masked, matching how the reference
counts its implied ray budget, SURVEY.md §6).
"""
from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "")  # use the real chip if present


def _wait_for_backend() -> None:
    """Block until JAX backend init succeeds in a THROWAWAY subprocess.

    The axon TPU tunnel flaps (docs: round-3 saw an 11h outage; backend
    init then HANGS rather than erroring, which would turn the driver's
    bench capture into an rc!=0 with no number). Probing in a subprocess
    keeps this process's backend uninitialized so a later successful init
    is still possible; retry with backoff up to WRT_BENCH_WAIT_S seconds
    (default 900) before giving up and letting the real init report the
    error."""
    import subprocess

    budget = float(os.environ.get("WRT_BENCH_WAIT_S", "900"))
    deadline = time.time() + budget
    probe = ("import jax, jax.numpy as jnp;"
             "assert float(jnp.ones((8,128)).sum()) == 1024.0")
    first = True
    while True:
        try:
            subprocess.run((sys.executable, "-c", probe), timeout=120,
                           check=True, capture_output=True)
            return
        except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
            if time.time() >= deadline:
                return  # let the real init produce the visible failure
            if first:
                print("bench: backend probe failed; retrying up to "
                      f"{budget:.0f}s", file=sys.stderr, flush=True)
                first = False
            time.sleep(30)


def main() -> None:
    _wait_for_backend()
    import jax
    import jax.numpy as jnp

    from weekend_raytracer_tpu import RenderParams, Renderer, SamplingParams
    from weekend_raytracer_tpu.models import scenes

    width, height = 1920, 1080
    # 32 samples/frame folds 32 samples into each 128-lane row, so a
    # tile covers a 4-pixel-wide screen block: tighter per-tile ray
    # cones cull better (docs/PERF.md round 3: spp4 541 -> spp16 601 ->
    # spp32 629 Mrays/s; spp32 fits in HBM since the compact-radiance
    # combine). 96 total keeps divisibility; seconds_per_100spp_frame
    # below normalizes to the BASELINE.md 100-spp workload.
    spp_total = 96
    spp_frame = 32
    bounces = 8

    backend = os.environ.get("WRT_BENCH_BACKEND", "auto")

    params = RenderParams(
        camera=scenes.rtiow_final_camera(),
        viewport_size=(width, height),
        sampling=SamplingParams(
            max_samples_per_pixel=spp_total,
            num_samples_per_pixel=spp_frame,
            num_bounces=bounces,
        ),
    )
    desc = scenes.rtiow_final()
    renderer = Renderer(desc, params, backend=backend)
    backend = renderer.backend

    # Warmup: compile + one frame.
    renderer.render_frame()
    renderer.sync()

    from weekend_raytracer_tpu.utils.metrics import profiler_trace

    t0 = time.perf_counter()
    frames = 0
    with profiler_trace(os.environ.get("WRT_PROFILE_DIR")):
        while renderer.render_frame():
            frames += 1
        renderer.sync()
    dt = time.perf_counter() - t0

    spp_timed = frames * spp_frame
    rays = width * height * spp_timed * bounces
    rays_per_sec = rays / dt
    seconds_per_frame_100spp = dt * (100 / spp_timed)

    result = {
        "metric": "rays/sec/chip (RTiOW final scene, 1080p, 8 bounces)",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / 1.0e9, 4),
        "backend": backend,
        "sweep": "mxu" if renderer.resolved_mxu_sweep() else "vpu",
        "device": str(jax.devices()[0]),
        # which sky actually rendered (exact HW dataset vs built-in fit;
        # VERDICT r3 #7 — every recorded number states its sky)
        "sky": renderer.sky_model(),
        "seconds_per_100spp_frame": round(seconds_per_frame_100spp, 3),
        "spheres": desc.num_spheres,
        "spp_timed": spp_timed,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    sys.exit(main())
