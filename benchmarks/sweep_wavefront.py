"""Wavefront-vs-megakernel benchmark on the real chip.

    python benchmarks/sweep_wavefront.py [scene] [cuts ...]
    e.g. python benchmarks/sweep_wavefront.py rtiow 2 3 2,4 2,3,4,5,6,7

Cut specs prefixed with "r" run the lane-regrouped tracer
(ops/pallas/regroup.py), bare specs the row-compacted wavefront, "mk"
only the megakernel baseline:
    python benchmarks/sweep_wavefront.py rtiow r2 r3 r2,4
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
    import numpy as np

    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
    from weekend_raytracer_tpu.ops.pallas.megakernel import render_image_pallas
    from weekend_raytracer_tpu.ops.pallas.wavefront import render_image_wavefront

    from weekend_raytracer_tpu.ops.pallas.regroup import render_image_regrouped

    import re

    args = sys.argv[1:]

    def is_spec(a):
        return re.fullmatch(r"r?\d+(,\d+)*", a) is not None

    scene_name = (args[0] if args and not is_spec(args[0])
                  and args[0] != "nomk" else "rtiow")
    cut_specs = [a for a in args if is_spec(a)] or ["2"]
    skip_mk = "nomk" in args
    spp = int(os.environ.get("WRT_SPP", "4"))
    bounces = int(os.environ.get("WRT_BOUNCES", "8"))
    if scene_name == "rtiow":
        desc, cam, (w, h) = (scenes.rtiow_final(), scenes.rtiow_final_camera(),
                             (1920, 1080))
    elif scene_name in ("random10k", "10k"):
        desc, cam, (w, h) = (scenes.random_spheres(10000),
                             scenes.random_spheres_camera(), (3840, 2160))
    elif scene_name == "three":
        desc, cam, (w, h) = (scenes.three_spheres(),
                             scenes.three_spheres_camera(), (1280, 720))
    elif scene_name == "rtiow4":
        # Ceiling probe: RTiOW's ground + 3 big spheres only, same
        # camera — identical pipeline/fixed costs and similar ray
        # liveness with near-zero sweep work; its rays/s bounds what
        # any cull scheme could reach on the full scene.
        full = scenes.rtiow_final()
        desc = type(full)(materials=full.materials[:4],
                          spheres=full.spheres[:4])
        cam, (w, h) = scenes.rtiow_final_camera(), (1920, 1080)
    else:
        raise SystemExit(scene_name)

    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    sky = to_sky_state(SkyParams())

    def bench(tag, fn):
        accum = jnp.zeros((w * h, 3), dtype=jnp.float32)
        t0 = time.perf_counter()
        accum = fn(accum, jnp.uint32(0), jnp.bool_(True), scene, sky, basis)
        accum.block_until_ready()
        np.asarray(accum[:1])
        compile_s = time.perf_counter() - t0
        n_frames = 6
        t0 = time.perf_counter()
        for f in range(1, 1 + n_frames):
            accum = fn(accum, jnp.uint32(f), jnp.bool_(False),
                       scene, sky, basis)
        accum.block_until_ready()
        np.asarray(accum[:1])
        dt = time.perf_counter() - t0
        rays = w * h * spp * bounces * n_frames
        print(json.dumps({
            "scene": scene_name, "variant": tag,
            "mrays": round(rays / dt / 1e6, 1),
            "ms_per_frame": round(dt / n_frames * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "mean": float(jnp.mean(accum)),
        }), flush=True)

    if not skip_mk:
        bench("megakernel", jax.jit(partial(
            render_image_pallas, width=w, height=h, spp=spp,
            num_bounces=bounces), donate_argnums=(0,)))
    for spec in cut_specs:
        regroup = spec.startswith("r")
        cuts = tuple(int(c) for c in spec.lstrip("r").split(",") if c)
        if regroup:
            k1c = os.environ.get("WRT_K1_CHUNK")
            k1c = int(k1c) if k1c else None
            k0c = os.environ.get("WRT_CHUNK")
            k0c = int(k0c) if k0c else None
            k1t = int(os.environ.get("WRT_K1_TSUB", "32"))
            sf = int(os.environ.get("WRT_SUPER", "16"))
            k1s = int(os.environ.get("WRT_K1_SUB", "0"))
            bench(f"regroup{cuts}:c{k0c}:k1c{k1c}:t{k1t}:sf{sf}:sub{k1s}",
                  jax.jit(partial(
                      render_image_regrouped, width=w, height=h, spp=spp,
                      num_bounces=bounces, cuts=cuts, chunk_size=k0c,
                      k1_chunk_size=k1c, k1_tsub=k1t, super_factor=sf,
                      k1_subcull=k1s),
                      donate_argnums=(0,)))
        else:
            bench(f"wavefront{cuts}", jax.jit(partial(
                render_image_wavefront, width=w, height=h, spp=spp,
                num_bounces=bounces, phase_cuts=cuts), donate_argnums=(0,)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
