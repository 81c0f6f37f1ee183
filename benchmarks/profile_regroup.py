"""Per-phase timing of the regrouped wavefront on the real chip.

Times K0 / PACK / K1 / UNPACK separately on real 1080p pool data so the
per-cut fixed costs are attributable (docs/PERF.md).

    python benchmarks/profile_regroup.py [cut]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import weekend_raytracer_tpu.ops.pallas.regroup as rg
    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state

    args = [a for a in sys.argv[1:] if a != "stats"]
    cut = int(args[0]) if args and args[0].isdigit() else 3
    scene_name = next((a for a in args if not a.isdigit()), "rtiow")
    if scene_name == "random10k":
        w, h, spp, bounces = 3840, 2160, 4, 8
        desc, cam = (scenes.random_spheres(10000),
                     scenes.random_spheres_camera())
    else:
        w, h, spp, bounces = 1920, 1080, 4, 8
        desc, cam = scenes.rtiow_final(), scenes.rtiow_final_camera()
    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    sky = to_sky_state(SkyParams())

    from weekend_raytracer_tpu.ops.pallas.megakernel import (
        default_chunk_size,
    )

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

    assert tex_pool is None, "profiler doesn't wire the texture pool"
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
        )(count, pool)

    k1 = rg._make_k1(n_spheres, chunk_size, n_chunks, super_factor, n_super,
                     w, h, spp, tiles_x, block_w, spp_shift,
                     retr=retr, lut_rows=lut_rows)
    meta1 = jnp.asarray([cut, bounces], jnp.int32)

    @jax.jit
    def run_k1(cpool, count):
        return pl.pallas_call(
            k1, grid=(n_tiles,),
            in_specs=[smem(), smem(), smem(), smem()] + scene_specs
            + lut_specs + [pool_blk()],
            out_specs=pool_blk(), out_shape=pool_shape,
        )(count, meta1, meta0, sky_vec, *s_attrs, *chunk_arrays,
          *super_arrays, *lut_inputs, cpool)

    @jax.jit
    def run_table(pool_i, count_i):
        h0 = (pool_i[:, rg._HHI, :, 0].astype(jnp.int32) * rg._HOME_RADIX
              + pool_i[:, rg._HLO, :, 0].astype(jnp.int32)).reshape(-1)
        rowid = jnp.arange(n_rows, dtype=jnp.int32)
        h0 = jnp.where(rowid < count_i[0], h0, jnp.int32(1 << 29))
        bases = jnp.arange(n_tiles + 1, dtype=jnp.int32) * (32 * 128)
        return jnp.maximum(
            jnp.searchsorted(h0, bases, side="right") - 1, 0
        ).astype(jnp.int32)

    unpack_kern, n_src = rg._make_level_kernel(
        src_records=True, out8=False, base_records=False)
    dcount_home = jnp.asarray([n_rows], jnp.int32)

    @jax.jit
    def run_unpack(tbl, count_i, inv, pool_i, contrib):
        return pl.pallas_call(
            unpack_kern, grid=(n_tiles,),
            in_specs=[smem(), smem(), smem(), inv_blk(),
                      pl.BlockSpec(memory_space=pl.ANY), contrib_blk()],
            out_specs=contrib_blk(), out_shape=contrib_shape,
            scratch_shapes=[
                pltpu.VMEM((34, n_src, 128), jnp.float32),
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((34,)),
            ],
            input_output_aliases={5: 0},
        )(dcount_home, tbl, count_i, inv, pool_i, contrib)

    # Single-dispatch pipelines (axon tunnel latency is ~200 ms/call, so
    # per-phase dispatch timing is useless): run the pipeline truncated
    # after each stage N times *inside one jit* and diff the wall times.
    count0 = jnp.asarray([n_rows], jnp.int32)

    def pipeline(upto):
        reps = 5

        @jax.jit
        def run():
            acc = jnp.zeros((8, 128), jnp.float32)
            for r in range(reps):
                pool, contrib = pl.pallas_call(
                    k0, grid=(n_tiles,),
                    in_specs=[smem(), smem(), smem()] + scene_specs
                    + lut_specs,
                    out_specs=(pool_blk(), contrib_blk()),
                    out_shape=(pool_shape, contrib_shape),
                )(jnp.asarray([r, 0], jnp.uint32), cam_vec, sky_vec,
                  *s_attrs, *chunk_arrays, *super_arrays, *lut_inputs)
                out = contrib[0, :, :1, :1]
                if upto >= 1:
                    cpool, inv, count = run_pack.__wrapped__(pool, count0)
                    out = cpool[0, :, :1, :1]
                if upto >= 2:
                    pool1 = run_k1.__wrapped__(cpool, count)
                    out = pool1[0, :, :1, :1]
                if upto >= 3:
                    tbl = run_table.__wrapped__(pool1, count)
                    out = tbl[:1].astype(jnp.float32)[None]
                if upto >= 4:
                    contrib = run_unpack.__wrapped__(tbl, count, inv,
                                                     pool1, contrib)
                    out = contrib[0, :, :1, :1]
                acc = acc + jnp.sum(out)
            return acc

        out = run()
        jax.block_until_ready(out)
        np.asarray(out)[:1]
        t0 = time.perf_counter()
        out = run()
        jax.block_until_ready(out)
        np.asarray(out)[:1]
        return (time.perf_counter() - t0) / reps

    if "stats" in sys.argv:
        # K1 occupancy/culling statistics (cf. benchmarks/kernel_stats.py
        # for the megakernel): is K1's higher per-row-bounce cost due to
        # dead lanes or to chunk bodies the tile cull can't skip?
        k1s = rg._make_k1(n_spheres, chunk_size, n_chunks, super_factor,
                          n_super, w, h, spp, tiles_x, block_w, spp_shift,
                          stats=True, retr=retr, lut_rows=lut_rows)
        stats_blk = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        stats_shape = jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32)

        @jax.jit
        def run_k1_stats(cpool, count):
            return pl.pallas_call(
                k1s, grid=(n_tiles,),
                in_specs=[smem(), smem(), smem(), smem()] + scene_specs
                + lut_specs + [pool_blk()],
                out_specs=(pool_blk(), stats_blk),
                out_shape=(pool_shape, stats_shape),
            )(count, meta1, meta0, sky_vec, *s_attrs, *chunk_arrays,
              *super_arrays, *lut_inputs, cpool)

        pool, contrib = run_k0()
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
            "tiles": n_live_tiles,
            "iters_mean": round(float(iters.mean()), 2),
            "iters_max": float(iters.max()),
            "live_frac_mean": round(float(live_frac.mean()), 3),
            "chunk_entry_frac": round(
                float((chunks / (iters * n_chunks + 1e-9)).mean()), 3),
            "supers_per_tile": round(float(supers.mean()), 1),
            "tests_per_segment": round(
                float((chunks * chunk_size * lanes).sum()
                      / max(live.sum(), 1)), 1),
        }), flush=True)
        return 0

    names = ["k0", "+pack", "+k1", "+table", "+unpack"]
    prev = 0.0
    for upto, name in enumerate(names):
        dt = pipeline(upto)
        print(json.dumps({"phase": name, "ms": round(dt * 1e3, 2),
                          "delta_ms": round((dt - prev) * 1e3, 2)}),
              flush=True)
        prev = dt

    pool, contrib = run_k0()
    _, _, count = run_pack(pool, count0)
    print(json.dumps({"phase": "live_rows", "n": int(count[0]),
                      "of": n_rows}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
