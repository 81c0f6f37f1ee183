"""Collect megakernel occupancy/culling statistics on the real chip.

    python benchmarks/kernel_stats.py [rtiow|random10k|three]

Feeds docs/PERF.md: tells whether the frame budget is lost to dead lanes
(occupancy) or to chunk bodies the tile-granularity cull can't skip
(divergence)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from weekend_raytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp
    import numpy as np

    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
    from weekend_raytracer_tpu.ops.pallas.megakernel import render_image_pallas

    which = sys.argv[1] if len(sys.argv) > 1 else "rtiow"
    cfgs = {
        "rtiow": (scenes.rtiow_final, scenes.rtiow_final_camera, (1920, 1080)),
        "three": (scenes.three_spheres, scenes.three_spheres_camera, (1280, 720)),
        "random10k": (lambda: scenes.random_spheres(10000),
                      scenes.random_spheres_camera, (3840, 2160)),
    }
    build, cam_fn, (w, h) = cfgs[which]
    desc = build()
    scene = desc.build()
    basis = CameraBasis.create(cam_fn(), (w, h))
    sky = to_sky_state(SkyParams())
    acc = jnp.zeros((w * h, 3), jnp.float32)
    spp, bounces = 4, 8
    img, st = render_image_pallas(
        acc, jnp.uint32(1), jnp.bool_(True), scene, sky, basis,
        width=w, height=h, spp=spp, num_bounces=bounces, stats=True,
    )
    st = np.asarray(st)
    iters, live, chunks, supers = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
    lanes = 32 * 128
    n_spheres = desc.num_spheres
    n_chunks = -(-(-(-n_spheres // 32) * 32) // 32)  # after pad, chunk=32
    live_frac = live / (iters * lanes + 1e-9)
    print(f"{which}: {st.shape[0]} tiles  spp={spp} bounces={bounces} "
          f"spheres={n_spheres} (~{n_chunks} chunks)")
    print(f"  iters/tile: mean {iters.mean():.2f} of max {spp*bounces}  "
          f"p10/p50/p90/max {np.percentile(iters, [10,50,90,100])}")
    print(f"  live-lane fraction per executed iter: mean {live_frac.mean():.3f}  "
          f"p10/p50/p90 {np.percentile(live_frac, [10,50,90])}")
    print(f"  chunk bodies entered/tile: mean {chunks.mean():.1f}  "
          f"(= {float((chunks/(iters*n_chunks+1e-9)).mean()):.2%} of iters*chunks)")
    print(f"  supers entered/tile: mean {supers.mean():.1f}")
    # effective sweep efficiency: fraction of (live lane x tested sphere)
    # work relative to what a perfect per-ray test count would be
    total_lane_sphere = (chunks * 32 * lanes).sum()
    total_live_segments = live.sum()
    print(f"  sphere-tests per live path segment: "
          f"{total_lane_sphere / max(total_live_segments,1):.1f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
