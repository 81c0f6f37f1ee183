"""Texture LUT budget: quality vs speed at representative resolution.

The fused kernels mip image textures into a <=budget_texels in-kernel
LUT; the XLA backend samples full resolution. This measures, at 1080p on
the textured ladder config, the tonemapped RMSE and linear mean-radiance
error of each budget against the full-resolution XLA render (identical
RNG streams, so the difference is texture resolution plus last-ulp
kernel arithmetic), and the warm throughput per budget (VERDICT r2 #3).

    python benchmarks/texture_quality.py [spp]
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from weekend_raytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import numpy as np

    from weekend_raytracer_tpu import RenderParams, Renderer, SamplingParams
    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.ops import tonemap

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    desc = scenes.textured_spheres()
    params = RenderParams(
        camera=scenes.textured_spheres_camera(),
        viewport_size=(1920, 1080),
        sampling=SamplingParams(max_samples_per_pixel=spp,
                                num_samples_per_pixel=4, num_bounces=8),
    )

    rx = Renderer(desc, params, backend="xla")
    rx.render()
    ref_lin = np.asarray(rx.mean_radiance())
    ref_tm = np.asarray(tonemap.to_srgb_u8(rx.mean_radiance())).astype(
        np.float64)

    for budget in (8192, 32768, 131072):
        r = Renderer(desc, params, backend="regroup", budget_texels=budget)
        stats = r.render()
        lin = np.asarray(r.mean_radiance())
        tm = np.asarray(tonemap.to_srgb_u8(r.mean_radiance())).astype(
            np.float64)
        rmse_tm = float(np.sqrt(np.mean((tm - ref_tm) ** 2)))
        print(json.dumps({
            "budget_texels": budget,
            "tonemapped_rmse_u8": round(rmse_tm, 3),
            "mean_radiance_rel_err": round(
                float(abs(lin.mean() - ref_lin.mean()) / ref_lin.mean()), 6),
            "mrays_per_s": round(stats.rays_per_sec / 1e6, 1),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
