"""Per-phase timing of the regrouped wavefront on the real chip.

Times the pipeline truncated after each stage so the per-cut fixed costs
are attributable (docs/PERF.md).  Unlike the round-3 version (which
re-plumbed every pallas_call by hand and drifted from the production
API), this runs `render_image_regrouped` itself with `profile_stop=` —
the phase split always matches production plumbing (frustum lists,
scene-aware cuts, LUT retrieval, and the MXU knob via WRT_MXU_SWEEP).

    python benchmarks/profile_regroup.py [rtiow|random10k] [cut,cut,...]
    python benchmarks/profile_regroup.py stats [cut]   # K1 cull counters
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _setup():
    from weekend_raytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax  # noqa: F401

    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state

    args = [a for a in sys.argv[1:] if a != "stats"]
    scene_name = next(
        (a for a in args if not a.replace(",", "").isdigit()), "rtiow")
    cuts_arg = next((a for a in args if a.replace(",", "").isdigit()), None)
    if scene_name == "random10k":
        w, h, spp, bounces = 3840, 2160, 8, 8
        desc, cam = (scenes.random_spheres(10000),
                     scenes.random_spheres_camera())
    else:
        w, h, spp, bounces = 1920, 1080, 32, 8
        desc, cam = scenes.rtiow_final(), scenes.rtiow_final_camera()
    # CPU smoke overrides so the script glue is testable without a chip
    if os.environ.get("WRT_PROF_SIZE"):
        w, h = (int(v) for v in os.environ["WRT_PROF_SIZE"].split("x"))
    if os.environ.get("WRT_PROF_SPP"):
        spp = int(os.environ["WRT_PROF_SPP"])
    from weekend_raytracer_tpu.ops.pallas.regroup import default_cuts

    cuts = (tuple(int(c) for c in cuts_arg.split(",")) if cuts_arg
            else default_cuts(bounces, desc.num_spheres))
    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    sky = to_sky_state(SkyParams())
    return scene, desc, basis, sky, w, h, spp, bounces, cuts


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weekend_raytracer_tpu.ops.pallas.regroup import (
        render_image_regrouped,
    )

    scene, desc, basis, sky, w, h, spp, bounces, cuts = _setup()
    accum = jnp.zeros((w * h, 3), jnp.float32)
    clear = jnp.asarray(True)

    def timed(stop):
        """Mean seconds/frame of the pipeline truncated after `stop`."""
        reps = int(os.environ.get("WRT_PROF_REPS", "4"))

        @jax.jit
        def run():
            acc = jnp.float32(0)
            for r in range(reps):  # frame varies -> no CSE across reps
                o = render_image_regrouped(
                    accum, jnp.uint32(r), clear, scene, sky, basis,
                    width=w, height=h, spp=spp, num_bounces=bounces,
                    cuts=cuts, profile_stop=stop)
                acc = acc + (jnp.sum(o[::65537]) if stop is None else o)
            return acc

        out = run()
        jax.block_until_ready(out)
        np.asarray(out)  # axon: force real execution by reading back
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        np.asarray(out)
        return (time.perf_counter() - t0) / reps

    stops = ["k0", "pack", "k1", "phases", "combine", None]
    names = ["k0", "+pack", "+k1", "+later_phases", "+combine", "+image"]
    rays = w * h * spp * 1e-6
    prev = 0.0
    for stop, name in zip(stops, names):
        if stop in ("k1", "phases") and len(cuts) == 1 and stop == "phases":
            continue  # single cut: "phases" == "k1"
        dt = timed(stop)
        print(json.dumps({
            "phase": name, "ms": round(dt * 1e3, 2),
            "delta_ms": round((dt - prev) * 1e3, 2),
            "cuts": list(cuts), "spp": spp,
            "mrays_s_cum": round(rays / dt, 1),
        }), flush=True)
        prev = dt
    return 0


def stats_main() -> int:
    """K1 occupancy/culling counters (cf. benchmarks/kernel_stats.py for
    the megakernel): hand-plumbed K0 -> pack -> K1(stats=True), since the
    production path doesn't expose the stats output."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import weekend_raytracer_tpu.ops.pallas.regroup as rg
    from weekend_raytracer_tpu.ops.pallas.megakernel import (
        default_chunk_size,
    )

    scene, desc, basis, sky, w, h, spp, bounces, cuts = _setup()
    cut = cuts[0]
    interp = rg._is_cpu()  # CPU smoke/offline-replay mode
    chunk_size = default_chunk_size(desc.num_spheres)
    super_factor = 16
    spp_shift = spp.bit_length() - 1
    block_w = 128 >> spp_shift
    wp = -(-w // block_w) * block_w
    hp = -(-h // 32) * 32
    tiles_x = wp // block_w
    n_tiles = tiles_x * (hp // 32)
    n_rows = n_tiles * 32

    (s_attrs, chunk_arrays, super_arrays, n_spheres, n_chunks, n_super,
     tex_pool, retr_lut) = rg.prepare_scene_arrays(scene, basis, chunk_size,
                                                   super_factor)
    assert tex_pool is None, "stats profiler doesn't wire the texture pool"
    cam_vec = rg.pack_camera(basis)
    sky_vec = rg.pack_sky(sky)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_specs = [smem()] * len(s_attrs) + [smem()] * 13
    pool_blk = lambda: pl.BlockSpec((1, rg.N_COMP, 32, 128),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    pool_shape = jax.ShapeDtypeStruct((n_tiles, rg.N_COMP, 32, 128),
                                      jnp.float32)
    contrib_blk = lambda: pl.BlockSpec((1, 3, 32, 128),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    contrib_shape = jax.ShapeDtypeStruct((n_tiles, 3, 32, 128), jnp.float32)
    retr = retr_lut is not None
    lut_rows = -(-n_spheres // 128)
    lut_inputs = [retr_lut] if retr else []
    lut_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] if retr else [])

    k0 = rg._make_k0(w, h, spp, cut, n_spheres, chunk_size, n_chunks,
                     super_factor, n_super, tiles_x, block_w, spp_shift,
                     retr=retr, lut_rows=lut_rows)
    meta0 = jnp.asarray([0, 0], jnp.uint32)  # [frame, row_offset]

    @jax.jit
    def run_k0():
        return pl.pallas_call(
            k0, grid=(n_tiles,),
            in_specs=[smem(), smem(), smem()] + scene_specs + lut_specs,
            out_specs=(pool_blk(), contrib_blk()),
            out_shape=(pool_shape, contrib_shape),
            interpret=interp,
        )(meta0, cam_vec, sky_vec, *s_attrs, *chunk_arrays, *super_arrays,
          *lut_inputs)

    inv_blk = lambda: pl.BlockSpec((1, rg.N_INV, 32, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    inv_shape = jax.ShapeDtypeStruct((n_tiles, rg.N_INV, 32, 128),
                                     jnp.float32)

    @jax.jit
    def run_pack(pool, count):
        return pl.pallas_call(
            rg._pack_kernel, grid=(n_tiles,),
            in_specs=[smem(), pool_blk()],
            out_specs=(pl.BlockSpec(memory_space=pl.ANY), inv_blk(),
                       pl.BlockSpec(memory_space=pltpu.SMEM)),
            out_shape=(pool_shape, inv_shape,
                       jax.ShapeDtypeStruct((1,), jnp.int32)),
            scratch_shapes=[
                pltpu.VMEM((rg.N_COMP, 32, 128), jnp.float32),
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.VMEM((rg.N_COMP, 128), jnp.float32),
                pltpu.VMEM((34, rg.N_COMP, 128), jnp.float32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((33,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interp,
        )(count, pool)

    # K1 cull knobs (mirroring the production env resolution) so the
    # row-granular traversal's measured steps/segment are reportable:
    # under WRT_ROWSWEEP=1 the "chunks" counter holds SWEEP STEPS (each
    # = k1c row-divergent sphere tests), not chunk entries.
    k1c = int(os.environ.get("WRT_K1_CHUNK", "0")) or chunk_size
    tsub = int(os.environ.get("WRT_K1_TSUB", "32"))
    rowsweep = os.environ.get("WRT_ROWSWEEP", "0") == "1"
    if k1c != chunk_size:
        (s_attrs1, chunk_arrays1, super_arrays1, n_sph1, n_chunks1,
         n_super1, _tp1, retr_lut1) = rg.prepare_scene_arrays(
            scene, basis, k1c, super_factor)
    else:
        (s_attrs1, chunk_arrays1, super_arrays1, n_sph1, n_chunks1,
         n_super1, retr_lut1) = (s_attrs, chunk_arrays, super_arrays,
                                 n_spheres, n_chunks, n_super, retr_lut)
    retr1 = retr_lut1 is not None
    lut_rows1 = -(-n_sph1 // 128)
    lut_inputs1 = [retr_lut1] if retr1 else []
    lut_specs1 = ([pl.BlockSpec(memory_space=pltpu.VMEM)] if retr1 else [])
    if rowsweep:
        from weekend_raytracer_tpu.ops.pallas.megakernel import rowsweep_tab

        lut_inputs1 = lut_inputs1 + [rowsweep_tab(s_attrs1, k1c, n_chunks1)]
        lut_specs1 = lut_specs1 + [pl.BlockSpec(memory_space=pltpu.VMEM)]

    k1s = rg._make_k1(n_sph1, k1c, n_chunks1, super_factor,
                      n_super1, w, h, spp, tiles_x, block_w, spp_shift,
                      stats=True, retr=retr1, lut_rows=lut_rows1,
                      tsub1=tsub, rowsweep=rowsweep)
    meta1 = jnp.asarray([cut, bounces], jnp.int32)
    stats_blk = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    stats_shape = jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32)

    @jax.jit
    def run_k1_stats(cpool, count):
        return pl.pallas_call(
            k1s, grid=(n_tiles,),
            in_specs=[smem(), smem(), smem(), smem()] + scene_specs
            + lut_specs1 + [pool_blk()],
            out_specs=(pool_blk(), stats_blk),
            out_shape=(pool_shape, stats_shape),
            interpret=interp,
        )(count, meta1, meta0, sky_vec, *s_attrs1, *chunk_arrays1,
          *super_arrays1, *lut_inputs1, cpool)

    count0 = jnp.asarray([n_rows], jnp.int32)
    pool, _ = run_k0()
    cpool, inv, count = run_pack(pool, count0)
    _, st = run_k1_stats(cpool, count)
    st = np.asarray(st)[:, :, 0]
    n_live_tiles = -(-int(count[0]) // 32)
    st = st[:n_live_tiles]
    iters, live, chunks, supers = st[:, 0], st[:, 1], st[:, 2], st[:, 3]
    lanes = 32 * 128
    live_frac = live / (iters * lanes + 1e-9)
    print(json.dumps({
        "phase": "k1_stats", "cut": cut, "live_rows": int(count[0]),
        "of": n_rows, "tiles": n_live_tiles,
        "rowsweep": rowsweep, "k1_chunk": k1c, "k1_tsub": tsub,
        "iters_mean": round(float(iters.mean()), 2),
        "iters_max": float(iters.max()),
        "live_frac_mean": round(float(live_frac.mean()), 3),
        # under rowsweep, "chunks" counts SWEEP STEPS (see _make_bounce)
        "chunk_entry_frac": round(
            float((chunks / (iters * n_chunks1 + 1e-9)).mean()), 3),
        "supers_per_tile": round(float(supers.mean()), 1),
        "tests_per_segment": round(
            float((chunks * k1c * lanes).sum()
                  / max(live.sum(), 1)), 1),
    }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(stats_main() if "stats" in sys.argv else main())
