"""Probe: how much does K1 collapse when rays are binned by traversal
target (docs/PERF.md round-3 plan)?

Simulates the binned pack OFFLINE: runs K0 + the existing dense pack,
pulls the pool to the host, stably sorts live records by a candidate bin
key in NumPy, pushes the permuted pool back, and times/instruments K1 on
it. Per-record K1 outputs are position-independent (RNG re-derives from
home slots), so permutation changes only the tile-uniform cull unions —
exactly the effect being measured — and the live-record contribution sum
is a permutation-invariant sanity check.

Keys probed (origin cell = quantized hit position, a proxy for the hit
chunk; octant = sign pattern of the outgoing direction):

    home        no permutation (baseline)
    oct         direction octant only (8 bins)
    cell16      4x1x4 origin cells (ground-dominated scenes)
    cell64      8x1x8 origin cells
    cell16xoct / cell64xoct / cell256xoct
    chunkxoct   containing morton-chunk of the origin x octant

    python benchmarks/probe_binned.py [cut] [rtiow|random10k] [quick]
"""
from __future__ import annotations

import json
import os
import sys
import time

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
    from weekend_raytracer_tpu.ops.pallas.megakernel import (
        default_chunk_size,
    )

    args = sys.argv[1:]
    cut = int(args[0]) if args and args[0].isdigit() else 3
    scene_name = next((a for a in args if a in ("rtiow", "random10k")),
                      "rtiow")
    quick = "quick" in args
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

    assert tex_pool is None
    retr = retr_lut is not None
    lut_rows = -(-n_spheres // 128)
    lut_inputs = [retr_lut] if retr else []
    lut_specs = ([pl.BlockSpec(memory_space=pltpu.VMEM)] if retr else [])
    k0 = rg._make_k0(w, h, spp, cut, n_spheres, chunk_size, n_chunks,
                     super_factor, n_super, tiles_x, block_w, spp_shift,
                     retr=retr, lut_rows=lut_rows)
    meta0 = jnp.asarray([0, 0], jnp.uint32)

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
    k1s = rg._make_k1(n_spheres, chunk_size, n_chunks, super_factor,
                      n_super, w, h, spp, tiles_x, block_w, spp_shift,
                      stats=True, retr=retr, lut_rows=lut_rows)
    meta1 = jnp.asarray([cut, bounces], jnp.int32)

    def k1_call(kern, cpool, count, frame, extra_out=False):
        out_specs = pool_blk()
        out_shape = pool_shape
        if extra_out:
            out_specs = (pool_blk(),
                         pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                      memory_space=pltpu.VMEM))
            out_shape = (pool_shape,
                         jax.ShapeDtypeStruct((n_tiles, 8, 128),
                                              jnp.float32))
        return pl.pallas_call(
            kern, grid=(n_tiles,),
            in_specs=[smem(), smem(), smem(), smem()] + scene_specs
            + lut_specs + [pool_blk()],
            out_specs=out_specs, out_shape=out_shape,
        )(count, meta1, jnp.asarray([frame, 0], jnp.uint32), sky_vec,
          *s_attrs, *chunk_arrays, *super_arrays, *lut_inputs, cpool)

    reps = 3 if quick else 5

    @jax.jit
    def run_k1_timed(cpool, count):
        # distinct frames -> distinct RNG streams: reps can't CSE; work
        # per rep is statistically identical
        acc = jnp.float32(0.0)
        for r in range(reps):
            p = k1_call(k1, cpool, count, r)
            acc = acc + jnp.sum(p[0, :, :1, :1])
        return acc

    @jax.jit
    def run_k1_stats(cpool, count):
        return k1_call(k1s, cpool, count, 0, extra_out=True)

    @jax.jit
    def live_sum(pool_i, count_i):
        # permutation-invariance sanity: live records' throughput sum
        # (radiance is zero on live records until they terminate)
        al = pool_i[:, rg._AL]
        rowid = jnp.arange(n_rows, dtype=jnp.int32).reshape(n_tiles, 32, 1)
        m = (al > 0.5) & (rowid < count_i[0])
        return jnp.sum(jnp.where(m, pool_i[:, rg._TR], 0.0))

    # --- produce the real pool at the cut ---
    pool, contrib = run_k0()
    count0 = jnp.asarray([n_rows], jnp.int32)
    cpool, inv, count = run_pack(pool, count0)
    n_live_rows = int(np.asarray(count)[0])
    print(json.dumps({"phase": "pool", "cut": cut, "scene": scene_name,
                      "live_rows": n_live_rows, "of": n_rows}), flush=True)

    # host view of the live region as (tiles, comps, 32, 128)
    live_region_tiles = -(-n_live_rows // 32)
    rec = np.asarray(cpool[:live_region_tiles])  # (T, C, 32, 128)
    rec = np.moveaxis(rec, 1, -1).reshape(-1, rg.N_COMP)  # (T*32*128, C)
    rowid = np.arange(rec.shape[0]) // 128
    live = (rec[:, rg._AL] > 0.5) & (rowid < n_live_rows)
    recs = rec[live]
    L = recs.shape[0]
    print(json.dumps({"phase": "live_records", "n": int(L)}), flush=True)

    if "dump" in args:
        # save the live records + chunk/sphere data for offline,
        # order-aware cull simulation (benchmarks/sim_order.py)
        out = f"/tmp/pool_{scene_name}_cut{cut}.npz"
        np.savez_compressed(
            out, recs=recs.astype(np.float32),
            chunk_bounds=np.stack([np.asarray(a) for a in
                                   chunk_arrays[:6]]),
            s_attrs=np.stack([np.asarray(a) for a in s_attrs[:4]]),
            kq=np.asarray(s_attrs[-1]), chunk_size=chunk_size,
            eye=np.asarray(basis.eye))
        print(json.dumps({"phase": "dump", "path": out}), flush=True)
        return 0

    ox, oy, oz = recs[:, rg._OX], recs[:, rg._OY], recs[:, rg._OZ]
    dx, dy, dz = recs[:, rg._DX], recs[:, rg._DY], recs[:, rg._DZ]
    octant = ((dx >= 0).astype(np.int64) * 4 + (dy >= 0) * 2 + (dz >= 0))

    lo = np.array([ox.min(), oy.min(), oz.min()])
    hi = np.array([ox.max(), oy.max(), oz.max()])
    span = np.maximum(hi - lo, 1e-6)

    def cell(nx, ny, nz):
        cx = np.minimum(((ox - lo[0]) / span[0] * nx).astype(np.int64),
                        nx - 1)
        cy = np.minimum(((oy - lo[1]) / span[1] * ny).astype(np.int64),
                        ny - 1)
        cz = np.minimum(((oz - lo[2]) / span[2] * nz).astype(np.int64),
                        nz - 1)
        return (cx * ny + cy) * nz + cz

    # containing morton chunk of the origin (first chunk whose AABB holds
    # it; nearest-center fallback) — the key the real kernel would emit
    clox, cloy, cloz, chix, chiy, chiz = (np.asarray(a) for a in
                                          chunk_arrays[:6])
    ncp = clox.shape[0]
    ccx = 0.5 * (clox + chix)
    ccy = 0.5 * (cloy + chiy)
    ccz = 0.5 * (cloz + chiz)
    # distance to nearest point of each chunk AABB, in batches
    chunk_of = np.zeros(L, np.int64)
    bs = 1 << 18
    for i in range(0, L, bs):
        sl = slice(i, min(i + bs, L))
        px, py, pz = ox[sl, None], oy[sl, None], oz[sl, None]
        qx = np.clip(px, clox[None], chix[None]) - px
        qy = np.clip(py, cloy[None], chiy[None]) - py
        qz = np.clip(pz, cloz[None], chiz[None]) - pz
        d2 = qx * qx + qy * qy + qz * qz
        chunk_of[sl] = np.argmin(d2, axis=1)

    schemes = {
        "home": None,
        "oct": octant,
        "cell16xoct": cell(4, 1, 4) * 8 + octant,
        "cell64xoct": cell(8, 1, 8) * 8 + octant,
        "chunkxoct": chunk_of * 8 + octant,
    }
    if not quick:
        schemes["cell64"] = cell(8, 1, 8)
        schemes["cell256xoct"] = cell(16, 1, 16) * 8 + octant
        schemes["chunk"] = chunk_of

    dead_row = np.zeros((rg.N_COMP,), np.float32)
    dead_row[rg._HHI] = rg._DEAD_HHI

    base_sum = None
    for name, key in schemes.items():
        if key is None:
            permuted = cpool
        else:
            order = np.argsort(key, kind="stable")
            newrec = np.full((live_region_tiles * 32 * 128, rg.N_COMP),
                             dead_row, np.float32)
            newrec[:L] = recs[order]
            blk = newrec.reshape(live_region_tiles, 32, 128, rg.N_COMP)
            blk = np.moveaxis(blk, -1, 1)  # (T, C, 32, 128)
            permuted = jnp.asarray(np.concatenate(
                [blk, np.asarray(cpool[live_region_tiles:])], axis=0))

        s = float(np.asarray(live_sum(permuted, count)))
        if base_sum is None:
            base_sum = s

        out = run_k1_timed(permuted, count)
        jax.block_until_ready(out)
        np.asarray(out)
        t0 = time.perf_counter()
        out = run_k1_timed(permuted, count)
        jax.block_until_ready(out)
        np.asarray(out)
        dt = (time.perf_counter() - t0) / reps

        _, st = run_k1_stats(permuted, count)
        st = np.asarray(st)[:live_region_tiles, :, 0]
        iters, livec, chunks = st[:, 0], st[:, 1], st[:, 2]
        lanes = 32 * 128
        print(json.dumps({
            "scheme": name, "cut": cut, "k1_ms": round(dt * 1e3, 2),
            "iters_mean": round(float(iters.mean()), 2),
            "live_frac": round(
                float((livec / (iters * lanes + 1e-9)).mean()), 3),
            "chunk_entry": round(
                float((chunks / (iters * n_chunks + 1e-9)).mean()), 3),
            "tests_per_seg": round(
                float((chunks * chunk_size * lanes).sum()
                      / max(livec.sum(), 1)), 1),
            "in_sum_rel_err": abs(s - base_sum) / max(abs(base_sum), 1e-9),
        }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
