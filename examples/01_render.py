"""Headless render of a built-in scene to a PNG, with stats.

The equivalent of running the wgpu reference (`cargo run`) and waiting for
the progress bar — but scriptable, deterministic, and display-free
(docs/MIGRATION.md).
"""

from _common import parse_args


def main():
    args = parse_args(
        "render a built-in scene headless",
        **{
            "--scene": dict(default="demo", help="one of SCENES (see --scene list)"),
            "--size": dict(default="400x300"),
            "--spp": dict(type=int, default=16),
            "--out": dict(default="/tmp/example_render.png"),
        },
    )
    from weekend_raytracer_tpu import (RenderParams, Renderer, SamplingParams,
                                       SCENES)
    from weekend_raytracer_tpu.utils.image import save_png

    if args.scene == "list":
        print(" ".join(SCENES))
        return
    build, camera = SCENES[args.scene]
    w, h = (int(v) for v in args.size.split("x"))
    params = RenderParams(
        camera=camera(),
        viewport_size=(w, h),
        sampling=SamplingParams(max_samples_per_pixel=args.spp,
                                num_samples_per_pixel=2),
    )
    r = Renderer(build(), params)  # backend="auto" → fastest fused kernel
    stats = r.render()             # progressive frames to convergence
    save_png(args.out, r.image())  # tonemapped sRGB uint8 [H, W, 3]
    print(f"{args.scene} {w}x{h} spp={r.accumulated_samples()} "
          f"backend={r.backend} sky={r.sky_model()}")
    print(f"{stats.rays_per_sec/1e6:.1f} Mrays/s warm, "
          f"{stats.seconds:.2f} s total -> {args.out}")


if __name__ == "__main__":
    main()
