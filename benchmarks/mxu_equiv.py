"""MXU-sweep estimator equivalence at convergence (VERDICT r3 weak #7).

The MXU chunk sweep is statistically equivalent but NOT bit-identical to
the VPU sweep (matmul accumulation order + an ulp hole in the
skipped-chunk lemma, docs/PERF.md). Before the knob can ever default on,
its converged image must be measured against both the VPU fused render
and the XLA reference at real sample counts — the texture-quality-table
assertion level, not the 96x54 interpret smoke test.

Renders RTiOW at moderate resolution to high spp through the real
Renderer with identical RNG streams on all three engines, then reports
tonemapped-u8 RMSE and linear mean-radiance error for each pair. The MC
noise floor between two INDEPENDENT estimators at N spp scales ~1/sqrt(N);
VPU-vs-MXU divergence is chaotic only at silhouettes, so its RMSE should
sit well below VPU-vs-XLA (which adds the texture/sky LUT deltas — none
on this textureless scene).

    python benchmarks/mxu_equiv.py [spp] [WxH]
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

    spp = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    if len(sys.argv) > 2:
        w, h = (int(v) for v in sys.argv[2].split("x"))
    else:
        w, h = 960, 540
    desc = scenes.rtiow_final()
    params = RenderParams(
        camera=scenes.rtiow_final_camera(),
        viewport_size=(w, h),
        sampling=SamplingParams(max_samples_per_pixel=spp,
                                num_samples_per_pixel=4, num_bounces=8),
    )

    images = {}
    for name, kwargs in (
        ("xla", dict(backend="xla")),
        ("vpu", dict(backend="regroup", mxu_sweep=False)),
        ("mxu", dict(backend="regroup", mxu_sweep=True)),
    ):
        r = Renderer(desc, params, **kwargs)
        stats = r.render()
        lin = np.asarray(r.mean_radiance()).astype(np.float64)
        tm = np.asarray(tonemap.to_srgb_u8(r.mean_radiance())).astype(
            np.float64)
        images[name] = (lin, tm)
        print(json.dumps({
            "engine": name, "spp": spp, "size": [w, h],
            "mrays_per_s": round(stats.rays_per_sec / 1e6, 1),
        }), flush=True)

    for a, b in (("vpu", "mxu"), ("xla", "vpu"), ("xla", "mxu")):
        lin_a, tm_a = images[a]
        lin_b, tm_b = images[b]
        print(json.dumps({
            "pair": f"{a}-vs-{b}",
            "tonemapped_rmse_u8": round(
                float(np.sqrt(np.mean((tm_a - tm_b) ** 2))), 4),
            "mean_radiance_rel_err": round(
                float(abs(lin_a.mean() - lin_b.mean()) / lin_a.mean()), 7),
            "max_abs_u8": float(np.max(np.abs(tm_a - tm_b))),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
