"""Compacted-wavefront path tracer: the round-2 structural answer to the
megakernel's occupancy/divergence ceiling (docs/PERF.md).

The fused megakernel (megakernel.py) runs every bounce on fixed pixel
tiles: measured on RTiOW-1080p, only 49% of lanes in an executed bounce
iteration are alive and tile divergence lets 52% of chunk bodies through
the cull — together a ~4x gap against the no-sweep ceiling. This module
restores occupancy by *compacting live rays between bounce phases*, the
TPU-native form of the wavefront/binning architectures GPU path tracers
use (reference capability being scaled: the bounce loop at
raytracer.wgsl:130-169):

  K0   camera + bounces [0, b1): the megakernel's tile structure with
       samples folded into lanes (one ray per lane), dumping the live ray
       pool + per-ray contributions at the cut.
  C    row compaction: a sequential-grid kernel appends rows (128-ray
       records) with any live lane to a dense pool via per-row async DMA,
       counting with an SMEM counter that persists across grid steps
       (TPU grids run in order on one core — no atomics needed).
  K1   resume bounces [b_lo, b_hi) over the compacted pool: full tiles of
       live rays, same culled sweep, contributions DMA-scattered back to
       each row's home slot. The bounce range is a *runtime* scalar so one
       compilation serves every phase; C+K1 can be chained any number of
       times per frame.

Ray records are row-granular (128 rays x 15 components = 7.5 KB,
DMA-friendly); rays never leave their row, so pixel identity rides the
row's home id and the frame's contributions land by pure reshape — no
per-ray scatter anywhere (Mosaic has no per-lane HBM addressing; measured
in-kernel record DMA runs ~7M records/s, benchmarks/probe_dma.py).

RNG streams are per-(pixel, sample) seeded (ops/rng.init_sample_state), so
radiance is bit-identical to the megakernel/XLA paths for every live ray
regardless of how rays are regrouped.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models.camera import CameraBasis
from ...models.sky import SkyState
from ..tracer import Scene
from .megakernel import (
    _camera_ray,
    _is_cpu,
    _jenkins,
    _make_bounce,
    pack_camera,
    pack_sky,
    prepare_scene_arrays,
)

# Pool record layout: 15 components per row of 128 rays.
_OX, _OY, _OZ, _DX, _DY, _DZ = 0, 1, 2, 3, 4, 5
_TR, _TG, _TB = 6, 7, 8
_CR, _CG, _CB = 9, 10, 11
_ST, _AL, _HOME = 12, 13, 14
N_COMP = 15


def _make_k0(width, height, spp, b1, n_spheres, chunk_size, n_chunks,
             super_factor, n_super, tiles_x, block_w, block_h, spp_shift,
             textures=False, retr=False, lut_rows=0, mxu=False):
    """Camera generation + bounces [0, b1) + pool/contribution dump.

    Lane mapping folds samples into lanes: within a tile's (32, 128) block,
    row = y-in-block, col = x-in-block * spp + sample, so the frame's
    contribution image is recovered by pure reshape/transpose (no gather).
    """
    f32 = jnp.float32
    bw_shift = block_w.bit_length() - 1
    n_attr = 19 if textures else 13

    def kernel(meta_ref, cam_ref, sky_ref, *refs):
        scene = refs[0:n_attr]
        bounds = refs[n_attr:n_attr + 7]
        supers = refs[n_attr + 7:n_attr + 13]
        rest = refs[n_attr + 13:]
        if textures:
            tex_pool_ref, rest = rest[0], rest[1:]
        else:
            tex_pool_ref = None
        if retr:
            retr_lut_ref, rest = rest[0], rest[1:]
        else:
            retr_lut_ref = None
        if mxu:
            mxu_ref, rest = rest[0], rest[1:]
        else:
            mxu_ref = None
        pool_ref, contrib_ref = rest[0], rest[1]
        t = pl.program_id(0)
        frame = meta_ref[0]

        rows = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
        tx = t % tiles_x
        ty = t // tiles_x
        x = tx * block_w + (cols >> spp_shift)
        y = ty * block_h + rows
        smp = cols & ((1 << spp_shift) - 1)
        # clamp padded lanes into the frame (their contributions land in
        # padded slots and are cropped by the caller)
        x = jnp.minimum(x, width - 1)
        y = jnp.minimum(y, height - 1)
        pix = y * width + x
        xf = x.astype(f32)
        yf = y.astype(f32)
        pix_u32 = jax.lax.bitcast_convert_type(pix, jnp.uint32)
        frame_hash = _jenkins(frame)
        mix = jnp.uint32(0x9E3779B9) * (
            jax.lax.bitcast_convert_type(smp, jnp.uint32) + jnp.uint32(1)
        )
        state = _jenkins(pix_u32 ^ frame_hash ^ mix)

        bounce_cond, bounce_body = _make_bounce(
            scene, bounds, supers, sky_ref,
            num_bounces=b1, chunk_size=chunk_size, n_chunks=n_chunks,
            super_factor=super_factor, n_super=n_super, n_spheres=n_spheres,
            tex_pool_ref=tex_pool_ref, retr_lut_ref=retr_lut_ref,
            lut_rows=lut_rows, mxu_ref=mxu_ref,
        )

        # thin-lens camera ray (wgsl:105-122, 456-478)
        state, ox, oy, oz, dx, dy, dz = _camera_ray(
            cam_ref, xf, yf, f32(1.0 / width), f32(1.0 / height), state)

        one = jnp.ones((32, 128), f32)
        zero = jnp.zeros((32, 128), f32)
        carry = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                 one, one, one, zero, zero, zero, one, state)
        carry = jax.lax.while_loop(bounce_cond, bounce_body, carry)
        (_, ox, oy, oz, dx, dy, dz,
         tr, tg, tb, cr, cg, cb, alive_f, state) = carry

        # comp-major pool: pool_ref[0, comp] is a contiguous (32, 128) plane
        for comp, val in ((_OX, ox), (_OY, oy), (_OZ, oz),
                          (_DX, dx), (_DY, dy), (_DZ, dz),
                          (_TR, tr), (_TG, tg), (_TB, tb),
                          (_CR, cr), (_CG, cg), (_CB, cb)):
            pool_ref[0, comp] = val
        pool_ref[0, _ST] = jax.lax.bitcast_convert_type(state, f32)
        pool_ref[0, _AL] = alive_f
        home = (t * 32 + rows).astype(f32)
        pool_ref[0, _HOME] = home
        # contribution so far: zero for still-alive lanes (cr stays 0 until
        # the path terminates), final radiance for terminated ones
        contrib_ref[0, 0] = tr * cr
        contrib_ref[0, 1] = tg * cg
        contrib_ref[0, 2] = tb * cb

    return kernel


def _compact_kernel(count_in_ref, pool_ref, cpool_hbm, count_out_ref,
                    live_vmem, dst_smem, counter, sems):
    """Append rows with any live lane (and index < count_in) to the dense
    pool. Sequential grid: the SMEM counter persists across tiles."""
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(t == 0)
    def _():
        counter[0] = 0

    limit = count_in_ref[0] - t * 32
    alive = pool_ref[0, _AL]
    live_vmem[:] = jnp.max(alive, axis=1, keepdims=True) * jnp.ones(
        (32, 128), jnp.float32
    )
    for j in range(32):
        @pl.when((live_vmem[j, 0] > 0.0) & (j < limit))
        def _(j=j):
            dst = counter[0]
            dst_smem[j] = dst
            pltpu.make_async_copy(
                pool_ref.at[0, :, j],
                cpool_hbm.at[dst // 32, :, dst % 32],
                sems.at[j],
            ).start()
            counter[0] = dst + 1

    for j in range(32):
        @pl.when((live_vmem[j, 0] > 0.0) & (j < limit))
        def _(j=j):
            dst = dst_smem[j]
            pltpu.make_async_copy(
                pool_ref.at[0, :, j],
                cpool_hbm.at[dst // 32, :, dst % 32],
                sems.at[j],
            ).wait()

    count_out_ref[0] = counter[0]


def _make_k1(n_spheres, chunk_size, n_chunks, super_factor, n_super,
             textures=False, retr=False, lut_rows=0, mxu=False):
    """Resume bounces [b_lo, b_hi) over the compacted pool; write the
    updated pool in place (1:1 rows) and DMA each row's contribution to
    its home slot. b_lo/b_hi are runtime scalars — one compilation serves
    every phase of the frame."""
    f32 = jnp.float32
    n_attr = 19 if textures else 13

    def kernel(meta_ref, count_ref, sky_ref, *refs):
        scene = refs[0:n_attr]
        bounds = refs[n_attr:n_attr + 7]
        supers = refs[n_attr + 7:n_attr + 13]
        rest = refs[n_attr + 13:]
        if textures:
            tex_pool_ref, rest = rest[0], rest[1:]
        else:
            tex_pool_ref = None
        if retr:
            retr_lut_ref, rest = rest[0], rest[1:]
        else:
            retr_lut_ref = None
        if mxu:
            mxu_ref, rest = rest[0], rest[1:]
        else:
            mxu_ref = None
        # rest = cpool in, contrib in (aliased to out), pool out,
        #        contrib out (same buffer as contrib in), then scratch
        cpool_ref, pool_out_ref, contrib_hbm = rest[0], rest[2], rest[3]
        scratch, home_smem, sems = rest[4], rest[5], rest[6]
        t = pl.program_id(0)
        count = count_ref[0]
        b_lo = meta_ref[0]
        b_hi = meta_ref[1]

        @pl.when(t * 32 < count)
        def _():
            blk = cpool_ref[0]
            ox, oy, oz = blk[_OX], blk[_OY], blk[_OZ]
            dx, dy, dz = blk[_DX], blk[_DY], blk[_DZ]
            tr, tg, tb = blk[_TR], blk[_TG], blk[_TB]
            cr, cg, cb = blk[_CR], blk[_CG], blk[_CB]
            state = jax.lax.bitcast_convert_type(blk[_ST], jnp.uint32)
            alive_f = blk[_AL]
            home = blk[_HOME]
            # mask rows beyond the live count (stale records)
            rows = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
            valid = (t * 32 + rows) < count
            alive_f = jnp.where(valid, alive_f, 0.0)

            bounce_cond, bounce_body = _make_bounce(
                scene, bounds, supers, sky_ref,
                num_bounces=b_hi, chunk_size=chunk_size, n_chunks=n_chunks,
                super_factor=super_factor, n_super=n_super,
                n_spheres=n_spheres, tex_pool_ref=tex_pool_ref,
                retr_lut_ref=retr_lut_ref, lut_rows=lut_rows,
                mxu_ref=mxu_ref,
            )
            carry = (b_lo, ox, oy, oz, dx, dy, dz,
                     tr, tg, tb, cr, cg, cb, alive_f, state)
            carry = jax.lax.while_loop(bounce_cond, bounce_body, carry)
            (_, ox, oy, oz, dx, dy, dz,
             tr, tg, tb, cr, cg, cb, alive_f, state) = carry

            out = pool_out_ref
            out[0, _OX] = ox
            out[0, _OY] = oy
            out[0, _OZ] = oz
            out[0, _DX] = dx
            out[0, _DY] = dy
            out[0, _DZ] = dz
            out[0, _TR] = tr
            out[0, _TG] = tg
            out[0, _TB] = tb
            out[0, _CR] = cr
            out[0, _CG] = cg
            out[0, _CB] = cb
            out[0, _ST] = jax.lax.bitcast_convert_type(state, f32)
            out[0, _AL] = alive_f
            out[0, _HOME] = home

            # contributions -> home rows (unique writer per home row per
            # phase: compaction is one-to-one, and dead lanes' tp*col rides
            # the pool so re-writes stay consistent across phases)
            scratch[:, 0, :] = tr * cr
            scratch[:, 1, :] = tg * cg
            scratch[:, 2, :] = tb * cb
            limit = count - t * 32
            for j in range(32):
                @pl.when(j < limit)
                def _(j=j):
                    h = home[j, 0].astype(jnp.int32)
                    home_smem[j] = h
                    pltpu.make_async_copy(
                        scratch.at[j],
                        contrib_hbm.at[h // 32, :, h % 32],
                        sems.at[j],
                    ).start()
            for j in range(32):
                @pl.when(j < limit)
                def _(j=j):
                    h = home_smem[j]
                    pltpu.make_async_copy(
                        scratch.at[j],
                        contrib_hbm.at[h // 32, :, h % 32],
                        sems.at[j],
                    ).wait()

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "num_bounces", "chunk_size",
                     "super_factor", "phase_cuts", "interpret",
                     "debug_counts", "budget_texels", "mxu_sweep"),
)
def _render_image_wavefront_jit(
    accum: jnp.ndarray,  # [H*W, 3] f32
    frame: jnp.ndarray,  # u32 scalar
    clear: jnp.ndarray,  # bool scalar
    scene: Scene,
    sky: SkyState,
    basis: CameraBasis,
    *,
    width: int,
    height: int,
    spp: int,
    num_bounces: int,
    chunk_size: int | None = None,
    super_factor: int = 16,
    phase_cuts: tuple = (),
    interpret: bool | None = None,
    debug_counts: bool = False,
    budget_texels: int | None = None,
    mxu_sweep: bool = False,
) -> jnp.ndarray:
    """One progressive frame via the compacted wavefront; drop-in for
    render_image / render_image_pallas.

    phase_cuts are the bounce indices at which live rays are re-compacted;
    e.g. (2,) runs bounces 0-1 on camera tiles, compacts once, and finishes
    2..num_bounces on dense tiles. The default () runs the whole bounce
    budget in K0 — compaction is measured net-neutral on one chip because
    row-granular liveness stays high (docs/PERF.md), but the sample-folded
    lane layout alone is ~10% faster than the megakernel, and cuts are the
    hook for lane-granular regrouping work.
    """
    if interpret is None:
        interpret = _is_cpu()
    if chunk_size is None:
        from .megakernel import default_chunk_size

        chunk_size = default_chunk_size(int(scene.spheres.centers.shape[0]))
    if spp & (spp - 1) or not 1 <= spp <= 128:
        raise ValueError(
            f"wavefront spp must be a power of two <= 128 (samples fold "
            f"into the 128-lane dim), got {spp}")
    spp_shift = spp.bit_length() - 1
    block_w = 128 >> spp_shift  # x-pixels per tile row (cols = x * spp + s)
    block_h = 32
    cuts = [c for c in phase_cuts if 0 < c < num_bounces]

    n = width * height
    wp = -(-width // block_w) * block_w
    hp = -(-height // block_h) * block_h
    tiles_x = wp // block_w
    tiles_y = hp // block_h
    n_tiles = tiles_x * tiles_y
    n_rows = n_tiles * 32

    (s_attrs, chunk_arrays, super_arrays, n_spheres, n_chunks, n_super,
     tex_pool, retr_lut) = prepare_scene_arrays(
        scene, basis, chunk_size, super_factor,
        *(() if budget_texels is None else (budget_texels,)))
    textures = tex_pool is not None
    cam_vec = pack_camera(basis)
    sky_vec = pack_sky(sky)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_specs = [smem()] * len(s_attrs) + [smem()] * 7 + [smem()] * 6
    retr = retr_lut is not None
    lut_rows = -(-n_spheres // 128)  # LUT rows per attribute
    pool_inputs, pool_specs = [], []
    if textures:
        pool_inputs = [tex_pool]
        pool_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if retr:
        pool_inputs.append(retr_lut)
        pool_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    mxu = (bool(mxu_sweep) and n_chunks > 0
           and chunk_size & (chunk_size - 1) == 0)
    if mxu:
        from .megakernel import mxu_sweep_amats

        pool_inputs.append(mxu_sweep_amats(s_attrs, chunk_size, n_chunks))
        pool_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    b1 = cuts[0] if cuts else num_bounces
    k0 = _make_k0(width, height, spp, b1, n_spheres, chunk_size, n_chunks,
                  super_factor, n_super, tiles_x, block_w, block_h,
                  spp_shift, textures=textures, retr=retr,
                  lut_rows=lut_rows, mxu=mxu)
    meta0 = jnp.stack([frame.astype(jnp.uint32)])
    pool, contrib = pl.pallas_call(
        k0,
        grid=(n_tiles,),
        in_specs=[smem(), smem(), smem()] + scene_specs + pool_specs,
        out_specs=(
            pl.BlockSpec((1, N_COMP, 32, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 32, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_tiles, N_COMP, 32, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, 3, 32, 128), jnp.float32),
        ),
        interpret=interpret,
    )(meta0, cam_vec, sky_vec, *s_attrs, *chunk_arrays, *super_arrays,
      *pool_inputs)

    count = jnp.asarray([n_rows], jnp.int32)
    counts = []
    k1 = None
    for pi, b_lo in enumerate(cuts):
        # --- compact live rows into a dense pool ---
        cpool, count = pl.pallas_call(
            _compact_kernel,
            grid=(n_tiles,),
            in_specs=[
                smem(),
                pl.BlockSpec((1, N_COMP, 32, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, N_COMP, 32, 128), jnp.float32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.SMEM((32,), jnp.int32),
                pltpu.SMEM((1,), jnp.int32),
                pltpu.SemaphoreType.DMA((32,)),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(count, pool)
        counts.append(count)

        # --- resume bounces [b_lo, b_hi) on dense tiles ---
        b_hi = cuts[pi + 1] if pi + 1 < len(cuts) else num_bounces
        if k1 is None:
            k1 = _make_k1(n_spheres, chunk_size, n_chunks, super_factor,
                          n_super, textures=textures, retr=retr,
                          lut_rows=lut_rows, mxu=mxu)
        meta1 = jnp.asarray([b_lo, b_hi], jnp.int32)
        pool, contrib = pl.pallas_call(
            k1,
            grid=(n_tiles,),
            in_specs=[smem(), smem(), smem()] + scene_specs + pool_specs + [
                pl.BlockSpec((1, N_COMP, 32, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # contrib (aliased out)
            ],
            out_specs=(
                pl.BlockSpec((1, N_COMP, 32, 128), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((n_tiles, N_COMP, 32, 128), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, 3, 32, 128), jnp.float32),
            ),
            scratch_shapes=[
                pltpu.VMEM((32, 3, 128), jnp.float32),
                pltpu.SMEM((32,), jnp.int32),
                pltpu.SemaphoreType.DMA((32,)),
            ],
            input_output_aliases={3 + len(s_attrs) + 13 + len(pool_inputs)
                                  + 1: 1},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(meta1, count, sky_vec, *s_attrs, *chunk_arrays, *super_arrays,
          *pool_inputs, cpool, contrib)

    # --- contributions -> scanline pixel image (pure reshape/transpose:
    # tile (ty*TX+tx), channel, row=y_in, col=x_in*spp+s) ---
    img = contrib.reshape(tiles_y, tiles_x, 3, block_h, block_w, spp)
    img = img.sum(axis=5)  # sum samples
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, hp, wp)
    img = img[:, :height, :width].reshape(3, n).T

    base = jnp.where(clear, jnp.zeros_like(accum), accum)
    out = base + img
    if debug_counts:
        return out, (jnp.asarray([n_rows], jnp.int32),) + tuple(counts)
    return out


def render_image_wavefront(*args, mxu_sweep: bool | None = None, **kwargs):
    """Public entry: resolves the scene-size/env default eagerly so the
    jit cache keys on the concrete bool (an env flip mid-process would
    otherwise be silently ignored via the cached None trace)."""
    from .megakernel import _default_mxu_sweep, _wrapper_n_spheres

    if mxu_sweep is None:
        mxu_sweep = _default_mxu_sweep(_wrapper_n_spheres(args, kwargs))
    return _render_image_wavefront_jit(*args, mxu_sweep=bool(mxu_sweep),
                                       **kwargs)


render_image_wavefront.__wrapped__ = _render_image_wavefront_jit
