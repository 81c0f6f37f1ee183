"""Megakernel variant sweep on the real chip (serial: one compile queue).

    python benchmarks/sweep_kernel.py "tsub=8,block_w=32" "tsub=16,block_w=64"

Times render_image_pallas directly on the RTiOW-1080p headline config and
prints one JSON line per variant. Results recorded in docs/PERF.md.
"""
from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from weekend_raytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
    from weekend_raytracer_tpu.ops.pallas.megakernel import render_image_pallas

    width, height = 1920, 1080
    spp, bounces = 4, 8
    scene_name = "rtiow"
    variants = []
    for arg in sys.argv[1:]:
        if arg.startswith("scene="):
            scene_name = arg.split("=", 1)[1]
            continue
        kv = dict(p.split("=") for p in arg.split(","))
        variants.append({k: int(v) for k, v in kv.items()})
    if not variants:
        variants = [{}]

    if scene_name == "rtiow":
        desc, cam = scenes.rtiow_final(), scenes.rtiow_final_camera()
    elif scene_name == "random10k":
        desc, cam = scenes.random_spheres(10000), scenes.random_spheres_camera()
        width, height = 3840, 2160
    else:
        raise SystemExit(f"unknown scene {scene_name}")

    scene = desc.build()
    basis = CameraBasis.create(cam, (width, height))
    sky = to_sky_state(SkyParams())

    for v in variants:
        fn = jax.jit(
            partial(render_image_pallas, width=width, height=height,
                    spp=spp, num_bounces=bounces, **v),
            donate_argnums=(0,),
        )
        accum = jnp.zeros((width * height, 3), dtype=jnp.float32)
        t0 = time.perf_counter()
        accum = fn(accum, jnp.uint32(0), jnp.bool_(True), scene, sky, basis)
        accum.block_until_ready()
        import numpy as np

        np.asarray(accum[:1])
        compile_s = time.perf_counter() - t0
        n_frames = 6
        t0 = time.perf_counter()
        for f in range(1, 1 + n_frames):
            accum = fn(accum, jnp.uint32(f), jnp.bool_(False), scene, sky, basis)
        accum.block_until_ready()
        np.asarray(accum[:1])
        dt = time.perf_counter() - t0
        rays = width * height * spp * bounces * n_frames
        print(json.dumps({
            "scene": scene_name,
            "variant": v,
            "rays_per_sec": round(rays / dt, 1),
            "mrays": round(rays / dt / 1e6, 1),
            "ms_per_frame": round(dt / n_frames * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "mean": float(jnp.mean(accum)),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
