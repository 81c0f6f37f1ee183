"""Lane-granular regrouped wavefront: dense ray compaction between bounce
phases.

The row-granular compaction in ops/pallas/wavefront.py was measured
net-neutral on RTiOW-1080p: a 128-ray row stays "live" while ANY lane
lives, so row liveness sits at 56-85% while lane liveness is ~49%
(docs/PERF.md). This module compacts at LANE granularity — the occupancy
half of the structural step to 1e9 rays/s — using the Mosaic primitives
the round-2 probes proved out (benchmarks/probe_mosaic.py): per-lane
gathers along lanes, dynamic leading-dim VMEM reads/writes, and per-row
async DMA.

Pipeline per frame (reference capability being scaled: the bounce loop at
/root/reference/src/raytracer/raytracer.wgsl:130-169):

  K0      camera + bounces [0, c1) on screen tiles (coherent rays, high
          occupancy); dumps the ray pool with PER-LANE home slot ids and
          writes the frame's contribution image for paths that already
          terminated.
  PACK    stable lane-granular compaction into a globally dense pool:
          per row, a cumsum + 7-step binary-search lower_bound builds the
          live-lane gather permutation (no sort network needed); a
          sequential cross-row fold with a carry row that persists across
          grid steps (TPU grids run in order on one core) merges live
          prefixes into completely full 128-ray rows, DMA-appended to HBM.
          The pack is stable, so home ids stay globally sorted.
  K1      resume bounces [b_lo, b_hi) over full tiles of live rays.
          RNG state is NOT carried in records: every path draws exactly 4
          floats per bounce (plus 4 for the camera), so K1 re-derives each
          lane's state from (home slot, frame, b_lo) — bit-identical to
          the megakernel's stream and free of bitcast-through-f32 hazards.
  COMBINE contributions return to their pixels through the packs'
          INVERSE MAPS, composed in reverse: every pack emits, per input
          slot, the dense position its record was packed to (lane cumsum
          + sublane-roll row prefix), so each destination row gathers
          its records from <=2 candidate pool rows with zero searches.
          Walking phases last-to-first, R_i = own tr*cr where the path
          terminated in phase i, else R_{i+1} through phase i+1's map;
          the final level lands R_0 on home slots over K0's contribution
          image. No per-lane HBM scatter anywhere, and later cuts cost
          only one cheap 8-comp-window level each — the round-2
          search-based unpack that made second cuts a net loss is gone.

PACK/K1 chain freely (cuts=(3,5)): records that die in an intermediate
phase are dropped by the next pack and their radiance picked up by that
phase's combine level; each home slot receives its radiance exactly
once.

Home slot ids are stored as TWO small exact-in-f32 integers (lo 12 bits /
hi) so no payload component ever round-trips through a bitcast: every
record component is plain f32 data under gathers and selects.
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
    _rng_next,
    pack_camera,
    pack_sky,
    prepare_scene_arrays,
)

# Pool record layout: 15 components per row of 128 rays.
_OX, _OY, _OZ, _DX, _DY, _DZ = 0, 1, 2, 3, 4, 5
_TR, _TG, _TB = 6, 7, 8
_CR, _CG, _CB = 9, 10, 11
_HLO, _AL, _HHI = 12, 13, 14
_SPARE = 15  # pad to 16 sublanes: Mosaic lane gathers need >=8-row blocks
N_COMP = 16

_HOME_RADIX = 4096  # slot = hhi * 4096 + hlo; both exact in f32
_DEAD_HHI = float(1 << 16)  # dead slot = 2^28: above any real slot

# Inverse-map component layout (pack output, per ORIGINAL slot): the dense
# pool position each live record was packed to. Pool row < 2^21 (enforced
# by the < 2^28 rays/frame guard) is exact in f32, so no lo/hi split.
_INV_ROW, _INV_LANE, _INV_FIRST = 0, 1, 2
N_INV = 4  # padded to 4 sublanes
_DEAD_ROW = float(1 << 22)  # dead-lane marker: above any real pool row


def _sample_seed(pix_u32, frame_hash, smp):
    """Per-(pixel, frame, sample) seed — the ops/rng.py stream shared by
    every backend."""
    mix = jnp.uint32(0x9E3779B9) * (
        jax.lax.bitcast_convert_type(smp, jnp.uint32) + jnp.uint32(1)
    )
    return _jenkins(pix_u32 ^ frame_hash ^ mix)


def default_cuts(num_bounces: int, n_spheres: int = None) -> tuple:
    """Measured-best recompaction schedule (docs/PERF.md round 3): cuts
    at bounces 2/4/6 clipped to the bounce budget. Multi-cut became
    cheap once every phase's inverse map composes and dead tiles
    stopped paying block DMA ((3,5,6): RTiOW-1080p 500.6 -> 532.0,
    random10k 136.6 -> 152.8 Mrays/s); moving the first cut a bounce
    earlier then won again on both scenes ((2,4,6): RTiOW spp16
    586.7 -> 601.5, random10k 153 -> 174.7 — sky-dead rays compact
    out before the first diverged full-occupancy sweep). All schedules
    are bit-identical.

    Small scenes invert the trade: with only a handful of spheres the
    closest-hit sweep a cut would shrink is already negligible next to
    the per-phase fixed costs (pack + combine + full-grid iteration),
    so extra phases are pure overhead — three-sphere 720p runs 1796
    Mrays/s at (3,) vs 1284 at (2,4,6) (-29%). When ``n_spheres`` is
    given and the scene fits in a few cull chunks, keep the round-2
    single-cut schedule; measured crossover points are 5 spheres
    (single cut wins big) and 486 (multi-cut wins)."""
    if n_spheres is not None and n_spheres <= 64:
        cuts = tuple(c for c in (3,) if c < num_bounces)
    else:
        cuts = tuple(c for c in (2, 4, 6) if c < num_bounces)
    return cuts or (num_bounces - 1,)


def _make_k0(width, height, spp, b1, n_spheres, chunk_size, n_chunks,
             super_factor, n_super, tiles_x, block_w, spp_shift,
             textures=False, frustum=False, full_height=None,
             retr=False, lut_rows=0, export_key=False, listed=False,
             mxu=False, rowsweep=False):
    """Camera + bounces [0, b1); dumps the pool (per-lane homes) and the
    contribution image (final radiance for terminated paths, else 0).

    RNG seeds and camera aiming use GLOBAL image coordinates (meta[1] is
    the shard's row offset; full_height the whole image's height) so
    per-shard renders under shard_map reproduce the single-device image
    row band for row band — same contract as the megakernel.

    export_key=True writes each live lane's ray-binning key into _SPARE:
    8 * (morton chunk of the last hit) + direction octant — the grouping
    key of the per-ray-group traversal (docs/PERF.md round-3 plan)."""
    f32 = jnp.float32
    if full_height is None:
        full_height = height
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
        if frustum:
            frustum_ref, rest = rest[0], rest[1:]
        else:
            frustum_ref = None
        if mxu:
            mxu_ref, rest = rest[0], rest[1:]
        else:
            mxu_ref = None
        if rowsweep:
            # bounce 0 keeps the frustum-listed sweep; bounces >= 1 go
            # row-granular (the cond in the culling dispatch below)
            rows_ref, rest = rest[0], rest[1:]
        else:
            rows_ref = None
        pool_ref, contrib_ref = rest[0], rest[1]
        list_ref = rest[-1] if listed else None
        t = pl.program_id(0)
        frame = meta_ref[0]
        row_off = meta_ref[1]

        rows = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
        tx = t % tiles_x
        ty = t // tiles_x
        x = tx * block_w + (cols >> spp_shift)
        y = ty * 32 + rows
        # clamp padded lanes into the frame (their contributions land in
        # padded slots and are cropped by the caller)
        x = jnp.minimum(x, width - 1)
        y = jnp.minimum(y, height - 1)
        y_gu = jax.lax.bitcast_convert_type(y, jnp.uint32) + row_off
        y_g = jax.lax.bitcast_convert_type(y_gu, jnp.int32)
        smp = cols & ((1 << spp_shift) - 1)
        pix = y_g * width + x
        pix_u32 = jax.lax.bitcast_convert_type(pix, jnp.uint32)
        state = _sample_seed(pix_u32, _jenkins(frame), smp)

        bounce_cond, bounce_body = _make_bounce(
            scene, bounds, supers, sky_ref,
            num_bounces=b1, chunk_size=chunk_size, n_chunks=n_chunks,
            super_factor=super_factor, n_super=n_super, n_spheres=n_spheres,
            tex_pool_ref=tex_pool_ref, frustum_ref=frustum_ref,
            frustum_row=t % 8, retr_lut_ref=retr_lut_ref,
            lut_rows=lut_rows, export_hit=bool(export_key),
            chunk_list_ref=list_ref, mxu_ref=mxu_ref,
            rowsweep_ref=rows_ref,
        )
        state, ox, oy, oz, dx, dy, dz = _camera_ray(
            cam_ref, x.astype(f32), y_g.astype(f32),
            f32(1.0 / width), f32(1.0 / full_height), state)

        one = jnp.ones((32, 128), f32)
        zero = jnp.zeros((32, 128), f32)
        carry = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                 one, one, one, zero, zero, zero, one, state)
        if export_key:
            carry = carry + (zero,)
        carry = jax.lax.while_loop(bounce_cond, bounce_body, carry)
        (_, ox, oy, oz, dx, dy, dz,
         tr, tg, tb, cr, cg, cb, alive_f, _state) = carry[:15]

        slot = (t * 32 + rows) * 128 + cols
        for comp, val in ((_OX, ox), (_OY, oy), (_OZ, oz),
                          (_DX, dx), (_DY, dy), (_DZ, dz),
                          (_TR, tr), (_TG, tg), (_TB, tb),
                          (_CR, cr), (_CG, cg), (_CB, cb)):
            pool_ref[0, comp] = val
        pool_ref[0, _HLO] = (slot & (_HOME_RADIX - 1)).astype(f32)
        pool_ref[0, _HHI] = (slot >> 12).astype(f32)
        pool_ref[0, _AL] = alive_f
        if export_key:
            # bin key = (last-hit chunk >> key_shift) * 8 + direction
            # octant, in [0, n_bins); export_key IS the chunk shift + 1
            # (so callers pass 1 + shift; 0 disables)
            shift = int(export_key) - 1
            hch = jnp.floor(carry[15] * f32(1.0 / (1 << shift)))
            oct_ = (jnp.where(dx >= 0.0, 4.0, 0.0)
                    + jnp.where(dy >= 0.0, 2.0, 0.0)
                    + jnp.where(dz >= 0.0, 1.0, 0.0))
            pool_ref[0, _SPARE] = hch * 8.0 + oct_
        else:
            pool_ref[0, _SPARE] = jnp.zeros((32, 128), f32)
        contrib_ref[0, 0] = tr * cr
        contrib_ref[0, 1] = tg * cg
        contrib_ref[0, 2] = tb * cb

    return kernel


def _cumsum_lanes(x):
    """Inclusive cumsum along lanes of an (S, 128) f32 block via
    Hillis-Steele log-shifts (jnp.cumsum has no reliable Mosaic lowering
    on the lane dim)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    for s in (1, 2, 4, 8, 16, 32, 64):
        sh = pltpu.roll(x, s, 1)
        x = x + jnp.where(lane >= s, sh, 0.0)
    return x


def _lower_bound(c, target):
    """Per-lane lower_bound along lanes: smallest src index j (per row)
    with c[row, j] >= target[row, lane]. c must be non-decreasing along
    lanes. 7 binary-search steps of take_along_axis."""
    lo = jnp.zeros(c.shape, jnp.int32)
    hi = jnp.full(c.shape, c.shape[-1] - 1, jnp.int32)
    for _ in range(7):
        mid = (lo + hi) >> 1
        v = jnp.take_along_axis(c, mid, axis=-1)
        ge = v >= target
        hi = jnp.where(ge, mid, hi)
        lo = jnp.where(ge, lo, mid + 1)
    return lo


def _cumsum_rows(x):
    """Inclusive cumsum along SUBLANES of a (32, 128) f32 block (sublane
    rolls verified on chip; the (32,32)@(32,128) matmul alternative
    silently miscompiles in Mosaic)."""
    srow = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    for s in (1, 2, 4, 8, 16):
        sh = pltpu.roll(x, s, 0)
        x = x + jnp.where(srow >= s, sh, 0.0)
    return x


def _pack_kernel(count_in_ref, pool_ref, cpool_hbm, inv_ref, count_out_ref,
                 pscratch, counts_vmem, acc_vmem, staging,
                 fill_smem, counter_smem, sems):
    """Stable lane-granular compaction of live records into a globally
    dense pool. Sequential grid; the carry row (acc/fill) and the global
    row counter persist across grid steps, so every emitted row except the
    final flush is completely full and home ids stay globally sorted.

    Also emits the INVERSE MAP: for every input slot, the dense pool
    (row, lane) its record was packed to (dead lanes get _DEAD_ROW), plus
    the pool row of each input row's first record. The unpack gathers
    through this map with zero searches. Tiles past the live count skip
    all compaction work (their inv block is garbage, never read)."""
    f32 = jnp.float32
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    is_last = t == n_tiles - 1

    @pl.when(t == 0)
    def _():
        counter_smem[0] = 0
        fill_smem[0] = 0

    rows = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
    lane1 = jax.lax.broadcasted_iota(jnp.int32, (N_COMP, 128), 1)
    limit = count_in_ref[0] - t * 32

    @pl.when(limit > 0)
    def _():
        alive = jnp.where(rows < limit, pool_ref[0, _AL], 0.0)

        c = _cumsum_lanes(alive)
        counts_vmem[:] = c
        k_vec = c[:, 127:128]
        target = lane.astype(f32) + 1.0
        src = _lower_bound(c, target)
        valid = target <= k_vec

        for comp in range(N_COMP):
            g = jnp.take_along_axis(pool_ref[0, comp], src, axis=1)
            if comp == _AL:
                g = valid.astype(f32)
            elif comp == _HHI:
                g = jnp.where(valid, g, _DEAD_HHI)
            else:
                g = jnp.where(valid, g, 0.0)
            pscratch[comp] = g

        base = counter_smem[0]
        fill0 = fill_smem[0]

        if inv_ref is not None:
            # Inverse map: record at (row j, rank r) lands at global dense
            # index G_j + r where G_j = records packed before row j.
            k_bcast = jnp.broadcast_to(k_vec, (32, 128))
            row_base = _cumsum_rows(k_bcast) - k_bcast
            g_idx = base * 128 + fill0 + row_base.astype(jnp.int32)
            d_idx = g_idx + c.astype(jnp.int32) - 1
            alive_b = alive > 0.5
            inv_ref[0, _INV_ROW] = jnp.where(
                alive_b, (d_idx >> 7).astype(f32), _DEAD_ROW)
            inv_ref[0, _INV_LANE] = jnp.where(
                alive_b, (d_idx & 127).astype(f32), 0.0)
            inv_ref[0, _INV_FIRST] = (g_idx >> 7).astype(f32)
            inv_ref[0, 3] = jnp.zeros((32, 128), f32)

        acc = acc_vmem[:]
        fill = fill0
        emit = jnp.int32(0)
        zero_blk = jnp.zeros((N_COMP, 128), f32)
        for j in range(32):
            k = counts_vmem[j, 127].astype(jnp.int32)
            blk = pscratch[:, j, :]
            idx = (lane1 - fill) & 127
            rolled = jnp.take_along_axis(blk, idx, axis=1)
            tot = fill + k
            over = tot >= 128
            merged = jnp.where(lane1 < fill, acc, rolled)

            @pl.when(over)
            def _(merged=merged, emit=emit):
                staging[pl.ds(emit, 1)] = merged[None]

            acc = jnp.where(
                over,
                jnp.where(lane1 < tot - 128, rolled, zero_blk),
                jnp.where(lane1 < tot, merged, zero_blk),
            )
            fill = jnp.where(over, tot - 128, tot)
            emit = jnp.where(over, emit + 1, emit)

        acc_vmem[:] = acc
        fill_smem[0] = fill

        for j2 in range(32):
            @pl.when(j2 < emit)
            def _(j2=j2):
                d = base + j2
                pltpu.make_async_copy(
                    staging.at[j2],
                    cpool_hbm.at[d // 32, :, d % 32],
                    sems.at[j2],
                ).start()
        for j2 in range(32):
            @pl.when(j2 < emit)
            def _(j2=j2):
                d = base + j2
                pltpu.make_async_copy(
                    staging.at[j2],
                    cpool_hbm.at[d // 32, :, d % 32],
                    sems.at[j2],
                ).wait()
        counter_smem[0] = base + emit

    @pl.when(is_last & (fill_smem[0] > 0))
    def _():
        # flush the partial carry row; dead tail lanes get the home
        # sentinel so no unpack pass can ever match them
        base = counter_smem[0]
        flush = acc_vmem[:]
        tail = lane1 >= fill_smem[0]
        comp_i = jax.lax.broadcasted_iota(jnp.int32, (N_COMP, 128), 0)
        flush = jnp.where(tail & (comp_i == _HHI), _DEAD_HHI, flush)
        staging[pl.ds(0, 1)] = flush[None]
        copy = pltpu.make_async_copy(
            staging.at[0],
            cpool_hbm.at[base // 32, :, base % 32],
            sems.at[32],
        )
        copy.start()
        copy.wait()
        counter_smem[0] = base + 1

    count_out_ref[0] = counter_smem[0]


def _make_pack_kernel_v2(indirect: bool = False):
    """Matmul-merge variant of _pack_kernel (round 4): identical
    contract, bit-identical outputs (tests/test_regroup.py).

    v1 spends its step in a 32-iteration scalar merge loop plus up to
    66 lax.cond-guarded row DMAs (~90 cycles per cond on v5e). v2
    removes both:

    - The merge is data-independent once destinations are known:
      record (row j, rank r) lands at staging row
      s = (fill0 + row_base[j] + r) >> 7, lane (...) & 127. The lane
      move composes with the rank gather (one take_along_axis per
      component, composed source index), and the row move is a pair of
      exact one-hot matmuls (dim-0-contracting dot_general at
      precision=highest — the _make_bounce MXU pattern): each input
      row sends its non-wrapping lanes to staging row s0_j and its
      wrapping lanes to s0_j + 1; lane-disjointness of the dense
      layout makes the masked sum a permutation, so precision=highest
      keeps it bit-exact (each output lane receives one record).
    - The row DMAs are unconditional with clamped indices: slots past
      this step's emit count write garbage rows that lie at or beyond
      the NEXT step's base, so the owning later step (or the final
      flush, or the never-read dense tail) overwrites them before any
      consumer can see them — no cond needs to guard the writes. The
      dense pool carries one spare tile past full capacity
      (pool_shape_dense) so the CLAMPED overflow writes land in rows
      that are never live: without it, a full pool (every record
      alive) would clamp the first garbage DMA onto the final live
      row and race its in-flight write (round-4 advisor finding).

    Bit-identity caveat: the one-hot destination-row matmuls map a
    -0.0 payload component to +0.0 (the masked sum adds +-0.0 terms
    and -0.0 + 0.0 = +0.0 under round-to-nearest). No pool component
    can legitimately be -0.0 where it matters — positions/directions
    of live records feed arithmetic where +-0.0 behave identically
    downstream, throughput/radiance are products of non-negative
    terms, and home ids/alive are integers-in-f32 — but callers
    comparing raw pool bytes (not images) against v1 should know the
    sign of zero is not preserved.

    With indirect=True the kernel takes a second prefetched scalar
    table (the live-tile list): grid step t packs tile list[t], so
    all-dead tiles are never visited at all (their inv blocks stay
    uninitialized — by contract the skip-dead combine level never
    reads them). The dense order is unchanged: skipped tiles
    contribute zero records, so the pool stays bit-identical.
    """

    def kernel(count_in_ref, *rest):
        if indirect:
            (list_ref, pool_ref, cpool_hbm, inv_ref, count_out_ref,
             acc_vmem, staging, fill_smem, counter_smem, sems) = rest
        else:
            list_ref = None
            (pool_ref, cpool_hbm, inv_ref, count_out_ref,
             acc_vmem, staging, fill_smem, counter_smem, sems) = rest
        _pack_v2_body(count_in_ref, list_ref, pool_ref, cpool_hbm,
                      inv_ref, count_out_ref, acc_vmem, staging,
                      fill_smem, counter_smem, sems)

    return kernel


def _pack_v2_body(count_in_ref, list_ref, pool_ref, cpool_hbm, inv_ref,
                  count_out_ref, acc_vmem, staging, fill_smem,
                  counter_smem, sems):
    f32 = jnp.float32
    t = pl.program_id(0)
    n_tiles = pl.num_programs(0)
    is_last = t == n_tiles - 1
    max_row = cpool_hbm.shape[0] * 32 - 1

    @pl.when(t == 0)
    def _():
        counter_smem[0] = 0
        fill_smem[0] = 0

    rows = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
    tile = t if list_ref is None else list_ref[t]
    limit = count_in_ref[0] - tile * 32

    @pl.when(limit > 0)
    def _():
        alive = jnp.where(rows < limit, pool_ref[0, _AL], 0.0)

        c = _cumsum_lanes(alive)
        k_vec = c[:, 127:128]
        target = lane.astype(f32) + 1.0
        src = _lower_bound(c, target)

        base = counter_smem[0]
        fill0 = fill_smem[0]
        k_bcast = jnp.broadcast_to(k_vec, (32, 128))
        row_base = _cumsum_rows(k_bcast) - k_bcast
        rb_i = row_base.astype(jnp.int32)

        if inv_ref is not None:
            g_idx = base * 128 + fill0 + rb_i
            d_idx = g_idx + c.astype(jnp.int32) - 1
            alive_b = alive > 0.5
            inv_ref[0, _INV_ROW] = jnp.where(
                alive_b, (d_idx >> 7).astype(f32), _DEAD_ROW)
            inv_ref[0, _INV_LANE] = jnp.where(
                alive_b, (d_idx & 127).astype(f32), 0.0)
            inv_ref[0, _INV_FIRST] = (g_idx >> 7).astype(f32)
            inv_ref[0, 3] = jnp.zeros((32, 128), f32)

        pos0 = fill0 + rb_i          # first dense position, const per row
        shift = pos0 & 127
        s0 = pos0 >> 7               # staging row of the non-wrap part
        rankv = (lane - shift) & 127
        csrc = jnp.take_along_axis(
            src.astype(f32), rankv, axis=1).astype(jnp.int32)
        k_i = k_bcast.astype(jnp.int32)
        valid_a = (rankv < k_i) & (lane >= shift)
        valid_b = (rankv < k_i) & (lane < shift)

        parts_a, parts_b = [], []
        for comp in range(N_COMP):
            if comp == _AL:
                g = jnp.ones((32, 128), f32)
            else:
                g = jnp.take_along_axis(pool_ref[0, comp], csrc, axis=1)
            parts_a.append(jnp.where(valid_a, g, 0.0))
            parts_b.append(jnp.where(valid_b, g, 0.0))
        a_all = jnp.concatenate(parts_a, axis=1)  # (32, N_COMP*128)
        b_all = jnp.concatenate(parts_b, axis=1)

        # one-hot row matrices, input-row-major: P[j, s] = (s == s0_j)
        s0r = s0[:, 0:1]
        iota_s = jax.lax.broadcasted_iota(jnp.int32, (32, 40), 1)
        p0 = (iota_s == s0r).astype(f32)
        p1 = (iota_s == (s0r + 1)).astype(f32)
        dn = (((0,), (0,)), ((), ()))
        hi = jax.lax.Precision.HIGHEST
        s_all = (jax.lax.dot_general(p0, a_all, dn, precision=hi)
                 + jax.lax.dot_general(p1, b_all, dn, precision=hi))

        tot = fill0 + jnp.sum(alive).astype(jnp.int32)
        emit = tot >> 7              # full staging rows to write out
        lane40 = jax.lax.broadcasted_iota(jnp.int32, (40, 128), 1)
        srow40 = jax.lax.broadcasted_iota(jnp.int32, (40, 128), 0)
        carry_mask = (srow40 == 0) & (lane40 < fill0)
        for comp in range(N_COMP):
            s_c = s_all[:, comp * 128:(comp + 1) * 128]
            acc_c = jnp.broadcast_to(acc_vmem[comp, 0:1, :], (40, 128))
            staging[comp] = jnp.where(carry_mask, acc_c, s_c)
        new_acc = staging[:, pl.ds(emit, 1), :]   # partial row -> carry
        acc_vmem[:, 0:1, :] = new_acc
        counter_smem[0] = base + emit
        fill_smem[0] = tot & 127

        for j2 in range(33):
            d = jnp.minimum(base + j2, max_row)
            pltpu.make_async_copy(
                staging.at[:, j2],
                cpool_hbm.at[d // 32, :, d % 32],
                sems.at[j2],
            ).start()
        for j2 in range(33):
            pltpu.make_async_copy(
                staging.at[:, j2],
                cpool_hbm.at[jnp.minimum(base + j2, max_row) // 32, :,
                             jnp.minimum(base + j2, max_row) % 32],
                sems.at[j2],
            ).wait()

    @pl.when(is_last & (fill_smem[0] > 0))
    def _():
        # flush the partial carry row; dead tail lanes get the home
        # sentinel so no unpack pass can ever match them
        lane1 = jax.lax.broadcasted_iota(jnp.int32, (N_COMP, 128), 1)
        base = counter_smem[0]
        flush = acc_vmem[:, 0, :]
        tail = lane1 >= fill_smem[0]
        comp_i = jax.lax.broadcasted_iota(jnp.int32, (N_COMP, 128), 0)
        flush = jnp.where(tail & (comp_i == _HHI), _DEAD_HHI, flush)
        staging[:, pl.ds(0, 1), :] = flush[:, None, :]
        copy = pltpu.make_async_copy(
            staging.at[:, 0],
            cpool_hbm.at[base // 32, :, base % 32],
            sems.at[0],
        )
        copy.start()
        copy.wait()
        counter_smem[0] = base + 1

    count_out_ref[0] = counter_smem[0]


def _make_k1(n_spheres, chunk_size, n_chunks, super_factor, n_super,
             width, height, spp, tiles_x, block_w, spp_shift,
             textures=False, stats=False, tsub1=32, retr=False,
             lut_rows=0, subcull=0, listed=False, emit_r8=False,
             mxu=False, rowsweep=False):
    # frame_ref is [frame, row_offset] u32: home slots are shard-local,
    # but RNG seeds derive from GLOBAL pixel ids (see _make_k0).
    """Resume bounces [b_lo, b_hi) over the dense pool (1:1 rows).

    RNG state is re-derived from each record's home slot: the stream
    draws exactly 4 floats for the camera plus 4 per bounce, so the state
    entering bounce b_lo is seed advanced 4*(b_lo+1) times — bit-identical
    to a carried state, with no bitcast payload in the pool.

    emit_r8 adds a second (1, 4, 32, 128) output holding each record's
    base radiance tr*cr in rows 0-2 (row 3 zero pad): the reverse combine
    reads only that product, so retaining the compact 4-comp radiance
    pool per phase instead of the full 16-comp record pool quarters the
    regroup pipeline's retained-HBM high-water (the record pool is
    consumed by the next pack alone and its buffer is donated through
    the phase chain)."""
    f32 = jnp.float32
    n_attr = 19 if textures else 13

    def kernel(count_ref, meta_ref, frame_ref, sky_ref, *refs):
        # count rides scalar prefetch (clamped block maps skip dead tiles)
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
        if rowsweep:
            rows_ref, rest = rest[0], rest[1:]
        else:
            rows_ref = None
        cpool_ref, pool_out_ref = rest[0], rest[1]
        rest = rest[2:]
        if emit_r8:
            r8_ref, rest = rest[0], rest[1:]
        else:
            r8_ref = None
        stats_ref = rest[0] if stats else None
        list_ref = rest[-1] if listed else None
        t = pl.program_id(0)
        count = count_ref[0]
        b_lo = meta_ref[0]
        b_hi = meta_ref[1]
        frame = frame_ref[0]  # u32 (separate ref: Mosaic has no scalar bitcast)
        row_off = frame_ref[1]

        @pl.when(t * 32 < count)
        def _():
            blk = cpool_ref[0]
            bounce_cond, bounce_body = _make_bounce(
                scene, bounds, supers, sky_ref,
                num_bounces=b_hi, chunk_size=chunk_size, n_chunks=n_chunks,
                super_factor=super_factor, n_super=n_super,
                n_spheres=n_spheres, stats=stats, tex_pool_ref=tex_pool_ref,
                retr_lut_ref=retr_lut_ref, lut_rows=lut_rows,
                subcull=subcull, chunk_list_ref=list_ref, mxu_ref=mxu_ref,
                rowsweep_ref=rows_ref,
            )

            # The tile is processed in independent (tsub1, 128) sub-blocks,
            # each with its own bounce loop and cull decisions: pool rows
            # are home-sorted, so a sub-block spans a ~32/tsub1-times
            # smaller world region than the whole tile and its chunk-cull
            # union is correspondingly tighter (decisive on big scenes;
            # docs/PERF.md). tsub1=32 is the original single-loop layout.
            for sub in range(32 // tsub1):
                r0 = sub * tsub1

                @pl.when((t * 32 + r0) < count)
                def _(r0=r0):
                    ox, oy, oz = (blk[_OX, r0:r0 + tsub1],
                                  blk[_OY, r0:r0 + tsub1],
                                  blk[_OZ, r0:r0 + tsub1])
                    dx, dy, dz = (blk[_DX, r0:r0 + tsub1],
                                  blk[_DY, r0:r0 + tsub1],
                                  blk[_DZ, r0:r0 + tsub1])
                    tr, tg, tb = (blk[_TR, r0:r0 + tsub1],
                                  blk[_TG, r0:r0 + tsub1],
                                  blk[_TB, r0:r0 + tsub1])
                    cr, cg, cb = (blk[_CR, r0:r0 + tsub1],
                                  blk[_CG, r0:r0 + tsub1],
                                  blk[_CB, r0:r0 + tsub1])
                    hlo = blk[_HLO, r0:r0 + tsub1]
                    hhi = blk[_HHI, r0:r0 + tsub1]
                    alive_f = blk[_AL, r0:r0 + tsub1]
                    rows = jax.lax.broadcasted_iota(
                        jnp.int32, (tsub1, 128), 0)
                    alive_f = jnp.where(
                        (t * 32 + r0 + rows) < count, alive_f, 0.0)

                    # home slot -> (pixel, sample) -> RNG at bounce b_lo
                    slot = (hhi.astype(jnp.int32) * _HOME_RADIX
                            + hlo.astype(jnp.int32))
                    srow = slot >> 7
                    col = slot & 127
                    tt = srow >> 5
                    row = srow & 31
                    x = (tt % tiles_x) * block_w + (col >> spp_shift)
                    y = (tt // tiles_x) * 32 + row
                    x = jnp.minimum(jnp.maximum(x, 0), width - 1)
                    y = jnp.minimum(jnp.maximum(y, 0), height - 1)
                    y_gu = jax.lax.bitcast_convert_type(y, jnp.uint32) + row_off
                    y_g = jax.lax.bitcast_convert_type(y_gu, jnp.int32)
                    smp = col & (spp - 1)
                    pix = y_g * width + x
                    pix_u32 = jax.lax.bitcast_convert_type(pix, jnp.uint32)
                    state = _sample_seed(pix_u32, _jenkins(frame), smp)
                    state = jax.lax.fori_loop(
                        0, 4 * (b_lo + 1), lambda i, s: _rng_next(s), state)

                    carry = (b_lo, ox, oy, oz, dx, dy, dz,
                             tr, tg, tb, cr, cg, cb, alive_f, state)
                    if stats:
                        carry = carry + (jnp.float32(0.0), jnp.int32(0),
                                         jnp.int32(0))
                    carry = jax.lax.while_loop(bounce_cond, bounce_body,
                                               carry)
                    (it_end, ox, oy, oz, dx, dy, dz,
                     tr, tg, tb, cr, cg, cb, alive_f, _state) = carry[:15]
                    if stats:
                        rows_st = [(it_end - b_lo).astype(f32), carry[15],
                                   carry[16].astype(f32),
                                   carry[17].astype(f32)]
                        stats_ref[0] = jnp.concatenate(
                            [jnp.full((1, 128), v, f32) for v in rows_st]
                            + [jnp.zeros((4, 128), f32)], axis=0)

                    out = pool_out_ref
                    for comp, val in ((_OX, ox), (_OY, oy), (_OZ, oz),
                                      (_DX, dx), (_DY, dy), (_DZ, dz),
                                      (_TR, tr), (_TG, tg), (_TB, tb),
                                      (_CR, cr), (_CG, cg), (_CB, cb)):
                        out[0, comp, r0:r0 + tsub1] = val
                    out[0, _HLO, r0:r0 + tsub1] = hlo
                    out[0, _HHI, r0:r0 + tsub1] = hhi
                    out[0, _AL, r0:r0 + tsub1] = alive_f
                    out[0, _SPARE, r0:r0 + tsub1] = blk[_SPARE,
                                                        r0:r0 + tsub1]
                    if emit_r8:
                        r8_ref[0, 0, r0:r0 + tsub1] = tr * cr
                        r8_ref[0, 1, r0:r0 + tsub1] = tg * cg
                        r8_ref[0, 2, r0:r0 + tsub1] = tb * cb
                        if sub == 0:
                            r8_ref[0, 3:4] = jnp.zeros((1, 32, 128), f32)

    return kernel


def _make_level_kernel():
    """One reverse-combine level (see render_image_regrouped's COMBINE).

    Every level gathers radiance from a 4-comp R pool (rows 0-2 hold
    the source records' radiance — K1's emitted base-radiance pool for
    the last phase, the previous level's output above it) and reads its
    base radiance from rows 0-2 of its own destination-space base block
    (a phase r4 pool, or the K0 contribution image at the final home
    level); the base buffer is overwritten in place (1:1 rows, donated).
    The gather window keeps 8 sublanes (the verified take_along_axis
    shape); each DMA fills only its first 4, rows 4-7 stay stale and
    are never consumed.

    The grid runs under a scalar-prefetched dest-row count with CLAMPED
    block index maps: grid steps past the live destination tiles revisit
    the last live block and are fully skipped, so dead tiles cost no
    block DMA and no writeback of garbage."""

    def kernel(dcount_ref, tbl_ref, count_ref, inv_ref, src_hbm,
               base_in, out_ref, win, rb0, rb1, rb2, sems):
        t = pl.program_id(0)

        @pl.when(t * 32 < dcount_ref[0])
        def _():
            count = count_ref[0]
            start = tbl_ref[t]
            end = jnp.minimum(tbl_ref[t + 1], count - 1)
            nwin = jnp.maximum(end - start + 1, 0)

            for w in range(34):
                @pl.when(w < nwin)
                def _(w=w):
                    r = start + w
                    pltpu.make_async_copy(
                        src_hbm.at[r // 32, :, r % 32],
                        win.at[w, pl.ds(0, 4)],
                        sems.at[w],
                    ).start()
            for w in range(34):
                @pl.when(w < nwin)
                def _(w=w):
                    r = start + w
                    pltpu.make_async_copy(
                        src_hbm.at[r // 32, :, r % 32],
                        win.at[w, pl.ds(0, 4)],
                        sems.at[w],
                    ).wait()

            rowbufs = (rb0, rb1, rb2)
            for ch in range(3):
                rowbufs[ch][:] = base_in[0, ch]

            @pl.when(nwin > 0)
            def _():
                def body(j, _):
                    first = inv_ref[0, _INV_FIRST, j, 0].astype(jnp.int32)
                    a = jnp.clip(first - start, 0, 33)
                    prow_f = inv_ref[0, _INV_ROW, pl.ds(j, 1), :]
                    lidx = inv_ref[0, _INV_LANE, pl.ds(j, 1), :].astype(
                        jnp.int32)
                    prow = prow_f.astype(jnp.int32)
                    off = prow - (start + a)
                    use_b = off == 1
                    live = (prow_f < _DEAD_ROW) & ((off == 0) | use_b)
                    blk_a = win[pl.ds(a, 1)][0]
                    blk_b = win[pl.ds(jnp.minimum(a + 1, 33), 1)][0]
                    idx8 = jnp.broadcast_to(lidx, (8, 128))
                    va = jnp.take_along_axis(blk_a, idx8, axis=1)
                    vb = jnp.take_along_axis(blk_b, idx8, axis=1)
                    for ch in range(3):
                        ra = va[ch:ch + 1]
                        rb = vb[ch:ch + 1]
                        cur = rowbufs[ch][pl.ds(j, 1), :]
                        rowbufs[ch][pl.ds(j, 1), :] = jnp.where(
                            live, jnp.where(use_b, rb, ra), cur)
                    return 0

                jax.lax.fori_loop(0, 32, body, 0)

            for ch in range(3):
                out_ref[0, ch] = rowbufs[ch][:]
            if out_ref.shape[1] == 4:  # r4 pad row: keep pools defined
                out_ref[0, 3] = jnp.zeros((32, 128), jnp.float32)

    return kernel


def _make_level_kernel_v2(indirect: bool = False):
    """Windowed-matmul reverse-combine level (round 4).

    Same contract and bit-identical output as _make_level_kernel,
    rebuilt around three facts (docs/PERF.md round 4): (a) v1 spends
    most of its per-step time in 68 lax.cond-guarded row DMAs plus a
    32-iteration scalar gather loop (~90 cycles/cond on v5e); (b) each
    dest tile's source span [tbl[t], tbl[t]+34) is CONTIGUOUS in the
    dense pool, so it lies inside THREE consecutive source tiles that
    unconditional block DMAs can fetch whole; (c) the per-dest-row
    source row a_j = INV_FIRST[j] is monotone within the window, so
    "select window row a_j (and a_j+1)" is an exact one-hot f32 matmul
    under precision='highest' (measured exact on chip, round 2), after
    which the per-lane pick is the verified lane-axis take_along_axis.
    Zero conds, zero fori, three DMAs.

    Window-bound proof: start = tbl[t] = INV_FIRST of the tile's row
    0; within one dest tile g_idx grows by at most 32*128 records plus
    the <=127-lane carry, so a_j - start <= 33 and a_j + 1 lies in
    [t0*32, t0*32 + 66) — inside the 96-row / 3-tile window. Rows past
    the live count read garbage tiles (clamped to the last live source
    tile) but their records are _DEAD_ROW-masked and never selected.

    With indirect=True the prefetched scalars are (live-tile count,
    live-tile list): grid step t combines dest tile list[t] and
    all-dead dest tiles are never visited — their aliased base/out
    blocks keep the K0 contribution untouched, and their (possibly
    uninitialized, skip-dead-pack) inverse-map blocks are never read.
    At n_live == 0 the 1-step grid runs with the guard false and the
    guard-off branch copies base_in through to out_ref, keeping the
    Pallas writeback of the (aliased) block idempotent — without the
    copy an all-dead frame would clobber tile 0's K0 contribution
    with uninitialized VMEM (round-4 advisor finding).

    Bit-identity caveat: the one-hot window matmuls (wa/wb) map a
    -0.0 radiance component to +0.0. Radiance is a product of
    non-negative throughput and emitted light, so -0.0 cannot occur
    on any real path; the caveat matters only to byte-level pool
    comparisons, not to images.
    """

    def kernel(dcount_ref, *rest):
        if indirect:
            (list_ref, tbl_ref, count_ref, inv_ref, src_hbm,
             base_in, out_ref, win, sems) = rest
        else:
            list_ref = None
            (tbl_ref, count_ref, inv_ref, src_hbm,
             base_in, out_ref, win, sems) = rest
        f32 = jnp.float32
        t = pl.program_id(0)
        tile = t if list_ref is None else list_ref[t]
        guard = ((tile * 32 < dcount_ref[0]) if list_ref is None
                 else (t < dcount_ref[0]))

        @pl.when(guard)
        def _():
            count = count_ref[0]
            start = tbl_ref[tile]
            t0 = start // 32
            last = jnp.maximum((count + 31) // 32 - 1, 0)
            for k in range(3):
                pltpu.make_async_copy(
                    src_hbm.at[jnp.minimum(t0 + k, last)],
                    win.at[k], sems.at[k]).start()
            for k in range(3):
                pltpu.make_async_copy(
                    src_hbm.at[jnp.minimum(t0 + k, last)],
                    win.at[k], sems.at[k]).wait()

            # one-hot row-select matrices over the 96-row window
            wj = (inv_ref[0, _INV_FIRST, :, 0:1].astype(jnp.int32)
                  - t0 * 32)  # (32, 1) first source row, window-local
            iota_w = jax.lax.broadcasted_iota(jnp.int32, (32, 96), 1)
            ga = (iota_w == wj).astype(f32)
            gb = (iota_w == (wj + 1)).astype(f32)
            # window as (96, 384): source rows x (3 channels x 128).
            # Rows past the live source count are uninitialized HBM and
            # MUST be zeroed: unlike a gather, the matmul multiplies
            # every row by its one-hot weight, and 0 * NaN = NaN.
            row_live = (jax.lax.broadcasted_iota(jnp.int32, (96, 1), 0)
                        < count - t0 * 32)
            wall = jnp.concatenate(
                [win[:, ch].reshape(96, 128) for ch in range(3)], axis=1)
            wall = jnp.where(row_live, wall, 0.0)
            wa = jnp.dot(ga, wall, precision="highest")
            wb = jnp.dot(gb, wall, precision="highest")

            prow_f = inv_ref[0, _INV_ROW]
            prow = prow_f.astype(jnp.int32)
            lidx = inv_ref[0, _INV_LANE].astype(jnp.int32)
            off = prow - (t0 * 32 + wj)
            use_b = off == 1
            live = (prow_f < _DEAD_ROW) & ((off == 0) | use_b)
            for ch in range(3):
                va = jnp.take_along_axis(
                    wa[:, ch * 128:(ch + 1) * 128], lidx, axis=1)
                vb = jnp.take_along_axis(
                    wb[:, ch * 128:(ch + 1) * 128], lidx, axis=1)
                out_ref[0, ch] = jnp.where(
                    live, jnp.where(use_b, vb, va), base_in[0, ch])
            if out_ref.shape[1] == 4:  # r4 pad row: keep pools defined
                out_ref[0, 3] = jnp.zeros((32, 128), f32)

        if indirect:
            # n_live == 0 runs a single guard-off step whose (aliased)
            # out block would otherwise write back uninitialized VMEM
            # over tile live_list[0]'s K0 contribution — copy the base
            # through so the writeback is idempotent. (Non-indirect
            # grids never hit this: their guard-off steps are clamped
            # revisits of the previous block index, which Pallas skips.)
            @pl.when(jnp.logical_not(guard))
            def _():
                for ch in range(3):
                    out_ref[0, ch] = base_in[0, ch]
                if out_ref.shape[1] == 4:
                    out_ref[0, 3] = jnp.zeros((32, 128), jnp.float32)

    return kernel


def _profile_probe(x):
    """Tiny read of a stage output: keeps a profile-truncated pipeline's
    pallas calls live under DCE while costing ~nothing to materialize
    (benchmarks/profile_regroup.py). Reads ONLY the first element — pool
    buffers are dense-prefix-initialized (pack/K1 write live tiles only),
    so any wider read sums uninitialized HBM."""
    return jnp.sum(x.reshape(-1)[:1])


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "num_bounces", "chunk_size",
                     "super_factor", "cuts", "k1_chunk_size", "k1_tsub",
                     "k1_subcull", "full_height", "interpret",
                     "debug_counts", "budget_texels", "listed",
                     "mxu_sweep", "profile_stop", "dyn_grid",
                     "combine_v2", "pack_v2", "skip_dead", "rowsweep",
                     "rowsweep_k0"),
)
def _render_image_regrouped_jit(
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
    cuts: tuple = (2,),
    k1_chunk_size: int | None = None,
    k1_tsub: int = 32,
    k1_subcull: int = 0,
    row_offset: jnp.ndarray | int = 0,
    full_height: int | None = None,
    interpret: bool | None = None,
    debug_counts: bool = False,
    budget_texels: int | None = None,
    listed: bool = False,
    mxu_sweep: bool = False,
    profile_stop: str | None = None,
    dyn_grid: bool = False,
    combine_v2: bool = False,
    pack_v2: bool = False,
    skip_dead: bool = False,
    rowsweep: bool = False,
    rowsweep_k0: bool = False,
) -> jnp.ndarray:
    """One progressive frame via the lane-regrouped wavefront; drop-in for
    render_image / render_image_pallas / render_image_wavefront.

    cuts are the bounce indices at which live rays are densely recompacted
    (at least one required — with no cuts use the megakernel/wavefront).

    k1_chunk_size sets a separate cull-chunk granularity for the resume
    phases (post-cut rays are omnidirectional, so tile-granularity culling
    saturates — ~0.88 chunk entry measured on RTiOW — and the overhead/
    precision trade-off shifts). Measured on RTiOW-1080p: 64/128/unculled
    all within -1..-4% of matching K0's 32, so the default stays the K0
    chunk size; the knob remains for scenes where it pays.

    profile_stop truncates the pipeline after a named stage ("k0",
    "pack", "k1" — first phase only — "phases", "combine") and returns a
    scalar probe of that stage's outputs instead of the image; stage
    deltas between truncations attribute per-phase cost on chip
    (benchmarks/profile_regroup.py). None (the default) is the normal
    full render."""
    if interpret is None:
        interpret = _is_cpu()
    if full_height is None:
        full_height = height
    if skip_dead and not (pack_v2 and combine_v2):
        raise ValueError("skip_dead requires pack_v2 and combine_v2 "
                         "(the indirection is implemented on the v2 "
                         "kernels only)")
    if chunk_size is None:
        from .megakernel import default_chunk_size

        chunk_size = default_chunk_size(int(scene.spheres.centers.shape[0]))
    if spp & (spp - 1) or not 1 <= spp <= 128:
        raise ValueError(
            f"regroup spp must be a power of two <= 128 (samples fold "
            f"into the 128-lane dim), got {spp}")
    if 32 % k1_tsub:
        raise ValueError(f"k1_tsub must divide 32, got {k1_tsub}")
    cuts = tuple(c for c in cuts if 0 < c < num_bounces)
    if not cuts:
        raise ValueError("regrouped wavefront needs at least one cut")
    spp_shift = spp.bit_length() - 1
    block_w = 128 >> spp_shift

    n = width * height
    wp = -(-width // block_w) * block_w
    hp = -(-height // 32) * 32
    tiles_x = wp // block_w
    n_tiles = tiles_x * (hp // 32)
    n_rows = n_tiles * 32
    if n_rows * 128 >= (1 << 28):
        raise ValueError("regrouped wavefront supports < 2^28 rays/frame")

    (s_attrs, chunk_arrays, super_arrays, n_spheres, n_chunks, n_super,
     tex_pool, retr_lut) = prepare_scene_arrays(
        scene, basis, chunk_size, super_factor,
        *(() if budget_texels is None else (budget_texels,)))
    textures = tex_pool is not None
    retr = retr_lut is not None
    lut_rows = -(-n_spheres // 128)  # LUT rows per attribute
    if k1_chunk_size is None:
        k1_chunk_size = chunk_size
    if k1_chunk_size != chunk_size:
        # separate cull granularity for the omnidirectional resume phases;
        # sphere padding/order is self-consistent within each array set
        (s_attrs1, chunk_arrays1, super_arrays1, n_sph1, n_chunks1,
         n_super1, tex_pool1, retr_lut1) = prepare_scene_arrays(
            scene, basis, k1_chunk_size, super_factor,
            *(() if budget_texels is None else (budget_texels,)))
    else:
        (s_attrs1, chunk_arrays1, super_arrays1, n_sph1, n_chunks1,
         n_super1, tex_pool1, retr_lut1) = (
            s_attrs, chunk_arrays, super_arrays, n_spheres, n_chunks,
            n_super, tex_pool, retr_lut)
    retr1 = retr_lut1 is not None
    lut_rows1 = -(-n_sph1 // 128)
    cam_vec = pack_camera(basis)
    sky_vec = pack_sky(sky)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    scene_specs = [smem()] * len(s_attrs) + [smem()] * 13
    pool_inputs, pool_specs = [], []
    if textures:
        pool_inputs = [tex_pool]
        pool_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if retr:
        pool_inputs.append(retr_lut)
        pool_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    pool_blk = lambda: pl.BlockSpec((1, N_COMP, 32, 128),
                                    lambda i: (i, 0, 0, 0),
                                    memory_space=pltpu.VMEM)
    pool_shape = jax.ShapeDtypeStruct((n_tiles, N_COMP, 32, 128),
                                      jnp.float32)
    # Dense pools (pack output / K1 in-out) carry ONE spare tile beyond
    # full capacity: pack_v2's unconditional clamped row DMAs park every
    # overflow write there, so a clamped garbage DMA can never alias a
    # live row written in the same grid step (the full-pool race found
    # by the round-4 advisor). Live rows never reach the spare tile
    # (live <= n_tiles*32 rows) and no consumer reads past the count.
    pool_shape_dense = jax.ShapeDtypeStruct((n_tiles + 1, N_COMP, 32, 128),
                                            jnp.float32)
    contrib_blk = lambda: pl.BlockSpec((1, 3, 32, 128),
                                       lambda i: (i, 0, 0, 0),
                                       memory_space=pltpu.VMEM)
    contrib_shape = jax.ShapeDtypeStruct((n_tiles, 3, 32, 128), jnp.float32)

    # --- K0 ---
    frustum = n_chunks > 0
    fr_inputs, fr_specs = [], []
    if frustum:
        from .megakernel import build_frustum_lists

        flist = build_frustum_lists(basis, chunk_arrays[:6], tiles_x,
                                    hp // 32, block_w, 32, width, height,
                                    row_offset=row_offset,
                                    full_height=full_height)
        pad_t = (-n_tiles) % 8
        if pad_t:
            flist = jnp.concatenate(
                [flist, jnp.zeros((pad_t, flist.shape[1]), jnp.int32)])
        fr_inputs = [flist]
        fr_specs = [pl.BlockSpec((8, flist.shape[1]), lambda i: (i // 8, 0),
                                 memory_space=pltpu.SMEM)]
    # listed=True switches the culled sweeps to the branchless chunk-list
    # form — measured slower than the cond+super form on chip (docs/
    # PERF.md round 3), kept as a knob.
    listed0 = listed and n_chunks > 0
    listed1 = listed and n_chunks1 > 0
    from .megakernel import mxu_sweep_amats

    # the sublane-half argmin needs power-of-two chunks (review finding)
    mxu0 = (bool(mxu_sweep) and n_chunks > 0
            and chunk_size & (chunk_size - 1) == 0)
    mxu1 = (bool(mxu_sweep) and n_chunks1 > 0 and k1_subcull == 0
            and k1_chunk_size & (k1_chunk_size - 1) == 0)
    mxu_inputs0, mxu_specs0 = [], []
    if mxu0:
        mxu_inputs0 = [mxu_sweep_amats(s_attrs, chunk_size, n_chunks)]
        mxu_specs0 = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    # row-granular sweeps for K0's bounces >= 1 (bounce 0 stays on the
    # frustum lists); a separate knob from the K1 rowsweep because K0's
    # tiles are screen-coherent and may not pay the mask cost
    rows0 = (rowsweep_k0 and n_chunks > 0 and not mxu0 and not listed0
             and chunk_size * 4 <= 128)
    rs_inputs0, rs_specs0 = [], []
    if rows0:
        from .megakernel import rowsweep_tab

        rs_inputs0 = [rowsweep_tab(s_attrs, chunk_size, n_chunks)]
        rs_specs0 = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    lscr = lambda n: [pltpu.SMEM((max(n, 1),), jnp.int32)]
    k0 = _make_k0(width, height, spp, cuts[0], n_spheres, chunk_size,
                  n_chunks, super_factor, n_super, tiles_x, block_w,
                  spp_shift, textures=textures, frustum=frustum,
                  full_height=full_height, retr=retr, lut_rows=lut_rows,
                  listed=listed0, mxu=mxu0, rowsweep=rows0)
    meta0 = jnp.stack([frame.astype(jnp.uint32),
                       jnp.asarray(row_offset).astype(jnp.uint32)])
    pool, contrib = pl.pallas_call(
        k0,
        grid=(n_tiles,),
        in_specs=[smem(), smem(), smem()] + scene_specs + pool_specs
        + fr_specs + mxu_specs0 + rs_specs0,
        out_specs=(pool_blk(), contrib_blk()),
        out_shape=(pool_shape, contrib_shape),
        scratch_shapes=lscr(n_chunks) if listed0 else [],
        interpret=interpret,
    )(meta0, cam_vec, sky_vec, *s_attrs, *chunk_arrays, *super_arrays,
      *pool_inputs, *fr_inputs, *mxu_inputs0, *rs_inputs0)

    if profile_stop == "k0":
        return _profile_probe(pool) + _profile_probe(contrib)

    count = jnp.asarray([n_rows], jnp.int32)

    if skip_dead:
        # Live-tile indirection for the full-grid phases (pack #1 and
        # the final combine level): a K0 tile whose 4096 records are
        # ALL dead (pure-sky tiles die at bounce 0-1) contributes
        # nothing to the dense pool and its home contribution is
        # already final, so neither phase needs to visit it. The list
        # is built XLA-side from the pool's alive component (a cheap
        # strided reduce), prefetched, and dereferenced by the block
        # index maps; the dense order (and so every pool, count and
        # inverse map entry that is ever read) is bit-identical.
        tile_live = pool[:, _AL].reshape(n_tiles, -1).sum(axis=1) > 0
        tl_i = tile_live.astype(jnp.int32)
        lpos = jnp.cumsum(tl_i) - tl_i
        live_list = jnp.zeros((n_tiles,), jnp.int32).at[
            jnp.where(tile_live, lpos, n_tiles)].set(
            jnp.arange(n_tiles, dtype=jnp.int32), mode="drop")
        n_live = jnp.asarray([lpos[-1] + tl_i[-1]], jnp.int32)

    def live_tiles(c_ref):
        # last live tile index for clamped block maps (>=0 even at c=0)
        return jnp.maximum((c_ref[0] + 31) // 32 - 1, 0)

    def live_grid(c):
        # dyn_grid: Mosaic dynamic grid bound — visit ONLY the tiles
        # holding live rows instead of guarding all n_tiles steps (the
        # post-cut phases are mostly dead tiles). Outputs are identical:
        # dead steps never write (clamped maps + count guards), so
        # skipping them changes nothing the consumers read. Min 1 keeps
        # the pack's t==0 counter init and last-step flush well-defined
        # at count==0.
        return jnp.maximum((c[0] + 31) // 32, 1) if dyn_grid else n_tiles

    def pool_blk_c():
        return pl.BlockSpec((1, N_COMP, 32, 128),
                            lambda i, c: (jnp.minimum(i, live_tiles(c)),
                                          0, 0, 0),
                            memory_space=pltpu.VMEM)

    def inv_blk_c():
        return pl.BlockSpec((1, N_INV, 32, 128),
                            lambda i, c: (jnp.minimum(i, live_tiles(c)),
                                          0, 0, 0),
                            memory_space=pltpu.VMEM)

    inv_blk = lambda: pl.BlockSpec((1, N_INV, 32, 128),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)
    inv_shape = jax.ShapeDtypeStruct((n_tiles, N_INV, 32, 128), jnp.float32)
    r8_shape = jax.ShapeDtypeStruct((n_tiles, 4, 32, 128), jnp.float32)
    r8_blk_c = lambda: pl.BlockSpec(
        (1, 4, 32, 128),
        lambda i, c: (jnp.minimum(i, live_tiles(c)), 0, 0, 0),
        memory_space=pltpu.VMEM)
    k1 = None
    phases = []  # (k1_out_pool, count, inv, dest_count)
    for pi, b_lo in enumerate(cuts):
        # --- PACK: dense lane-granular compaction. EVERY phase emits its
        # inverse map (input-slot -> dense position); the reverse combine
        # composes them, so later pools need no home-sortedness and no
        # binary-search unpack. The input-row count rides scalar prefetch:
        # grid steps past the live input tiles revisit the last live
        # block (no dead-tile DMA). ---
        dest_count = count  # rows of this pack's input space
        indirect0 = skip_dead and pi == 0
        if pack_v2:
            pack_kern = _make_pack_kernel_v2(indirect=indirect0)
            pack_scratch = [
                pltpu.VMEM((N_COMP, 8, 128), jnp.float32),   # acc carry
                pltpu.VMEM((N_COMP, 40, 128), jnp.float32),  # staging
                pltpu.SMEM((1,), jnp.int32),                 # fill
                pltpu.SMEM((1,), jnp.int32),                 # counter
                pltpu.SemaphoreType.DMA((33,)),
            ]
        else:
            pack_kern = _pack_kernel
            pack_scratch = [
                pltpu.VMEM((N_COMP, 32, 128), jnp.float32),  # pscratch
                pltpu.VMEM((32, 128), jnp.float32),          # counts
                pltpu.VMEM((N_COMP, 128), jnp.float32),      # acc carry
                pltpu.VMEM((34, N_COMP, 128), jnp.float32),  # staging
                pltpu.SMEM((1,), jnp.int32),                 # fill
                pltpu.SMEM((1,), jnp.int32),                 # counter
                pltpu.SemaphoreType.DMA((33,)),
            ]
        if indirect0:
            ind_blk = lambda nd: pl.BlockSpec(
                (1, nd, 32, 128),
                lambda i, c, l: (l[i], 0, 0, 0),
                memory_space=pltpu.VMEM)
            pack_args = dict(
                num_scalar_prefetch=2,
                grid=(jnp.maximum(n_live[0], 1),),
                in_specs=[ind_blk(N_COMP)],
                out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                           ind_blk(N_INV),
                           pl.BlockSpec(memory_space=pltpu.SMEM)),
            )
            pack_operands = (count, live_list, pool)
        else:
            pack_args = dict(
                num_scalar_prefetch=1,
                grid=(live_grid(count),),
                in_specs=[pool_blk_c()],
                out_specs=(pl.BlockSpec(memory_space=pl.ANY), inv_blk_c(),
                           pl.BlockSpec(memory_space=pltpu.SMEM)),
            )
            pack_operands = (count, pool)
        packed = pl.pallas_call(
            pack_kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                scratch_shapes=pack_scratch, **pack_args,
            ),
            out_shape=(pool_shape_dense, inv_shape,
                       jax.ShapeDtypeStruct((1,), jnp.int32)),
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*pack_operands)
        cpool, inv, count = packed
        if profile_stop == "pack" and pi == 0:
            # under skip_dead, dead tiles' inv blocks are uninitialized
            # HBM (never read by the skip-dead combine) — keep the
            # probe off them
            inv_probe = (jnp.float32(0.0) if indirect0
                         else _profile_probe(inv))
            return (_profile_probe(cpool) + inv_probe
                    + count[0].astype(jnp.float32))

        # --- K1: resume bounces on dense tiles (same clamped maps).
        # Besides the updated record pool (consumed ONLY by the next
        # phase's pack, so its buffer is donated from cpool), K1 emits
        # the compact 8-comp base-radiance pool the combine needs: the
        # full pools never accumulate across phases, halving the
        # pipeline's HBM high-water (docs/PERF.md round 3). ---
        b_hi = cuts[pi + 1] if pi + 1 < len(cuts) else num_bounces
        if k1 is None:
            # row-granular traversal (round 5): K1-only — post-cut rays
            # are where the tile-union saturates; K0's screen tiles cull
            # fine. Exclusive with the other sweep mechanisms.
            rows1 = (rowsweep and n_chunks1 > 0 and not mxu1
                     and k1_subcull == 0 and not listed1
                     and k1_chunk_size * 4 <= 128)
            k1 = _make_k1(n_sph1, k1_chunk_size, n_chunks1, super_factor,
                          n_super1, width, height, spp, tiles_x, block_w,
                          spp_shift, textures=textures, tsub1=k1_tsub,
                          retr=retr1, lut_rows=lut_rows1,
                          subcull=k1_subcull, listed=listed1, emit_r8=True,
                          mxu=mxu1, rowsweep=rows1)
            pool_inputs1 = [tex_pool1] if textures else []
            if retr1:
                pool_inputs1.append(retr_lut1)
            if mxu1:
                pool_inputs1.append(mxu_sweep_amats(
                    s_attrs1, k1_chunk_size, n_chunks1))
            if rows1:
                from .megakernel import rowsweep_tab

                pool_inputs1.append(rowsweep_tab(
                    s_attrs1, k1_chunk_size, n_chunks1))
            pool_specs1 = [pl.BlockSpec(memory_space=pltpu.VMEM)
                           for _ in pool_inputs1]
        meta1 = jnp.asarray([b_lo, b_hi], jnp.int32)
        k1_ops = (count, meta1, meta0, sky_vec, *s_attrs1, *chunk_arrays1,
                  *super_arrays1, *pool_inputs1, cpool)
        pool, r8 = pl.pallas_call(
            k1,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(live_grid(count),),
                in_specs=[smem(), smem(), smem()] + scene_specs
                + pool_specs1 + [pool_blk_c()],
                out_specs=(pool_blk_c(), r8_blk_c()),
                scratch_shapes=lscr(n_chunks1) if listed1 else [],
            ),
            out_shape=(pool_shape_dense, r8_shape),
            input_output_aliases={len(k1_ops) - 1: 0},
            interpret=interpret,
        )(*k1_ops)
        phases.append((r8, count, inv, dest_count))
        if profile_stop == "k1" and pi == 0:
            return _profile_probe(pool) + _profile_probe(r8)

    # --- COMBINE (reverse map composition): walking phases last-to-first,
    # compute R_i[p] = the final radiance of the path whose record sat at
    # position p of phase i's pool — its own base radiance tr*cr (phase
    # i's r8 pool, rows 0-2) if it terminated there, else R_{i+1}
    # gathered through phase i+1's inverse map. The final level lands
    # R_0 on home slots over the K0 contribution image. Every level
    # gathers from an 8-comp radiance pool and overwrites its base pool
    # in place (1:1 rows -> the base buffer is donated); no XLA radiance
    # materialization on any path.
    if profile_stop == "phases":
        return (sum(_profile_probe(ph[0]) for ph in phases)
                + _profile_probe(pool))

    contrib_blk_c = lambda: pl.BlockSpec(
        (1, 3, 32, 128),
        lambda i, c: (jnp.minimum(i, live_tiles(c)), 0, 0, 0),
        memory_space=pltpu.VMEM)

    def combine_level(inv_i, src_count, dest_count, src_pool, base, out8,
                      home=False):
        tiles_alive = (jnp.arange(n_tiles, dtype=jnp.int32) * 32
                       < dest_count[0])
        tbl_raw = inv_i[:, _INV_FIRST, 0, 0].astype(jnp.int32)
        tbl = jnp.where(tiles_alive, tbl_raw, src_count[0])
        tbl = jnp.clip(tbl, 0, jnp.maximum(src_count[0] - 1, 0))
        tbl = jnp.concatenate([tbl, src_count])
        indirect = skip_dead and home
        if combine_v2:
            kern = _make_level_kernel_v2(indirect=indirect)
            scratch = [
                pltpu.VMEM((3, 4, 32, 128), jnp.float32),  # tile window
                pltpu.SemaphoreType.DMA((3,)),
            ]
        else:
            kern = _make_level_kernel()
            scratch = [
                pltpu.VMEM((34, 8, 128), jnp.float32),
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.VMEM((32, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((34,)),
            ]
        base_spec = r8_blk_c() if out8 else contrib_blk_c()
        if indirect:
            ind_blk = lambda nd: pl.BlockSpec(
                (1, nd, 32, 128),
                lambda i, n, l: (l[i], 0, 0, 0),
                memory_space=pltpu.VMEM)
            lvl_args = dict(
                num_scalar_prefetch=2,
                grid=(jnp.maximum(n_live[0], 1),),
                in_specs=[smem(), smem(), ind_blk(N_INV),
                          pl.BlockSpec(memory_space=pl.ANY),
                          ind_blk(base.shape[1])],
                out_specs=ind_blk(4 if out8 else 3),
            )
            lvl_operands = (n_live, live_list, tbl, src_count, inv_i,
                            src_pool, base)
            alias = {6: 0}
        else:
            lvl_args = dict(
                num_scalar_prefetch=1,
                grid=(live_grid(dest_count),),
                in_specs=[smem(), smem(), inv_blk_c(),
                          pl.BlockSpec(memory_space=pl.ANY),
                          base_spec],
                out_specs=r8_blk_c() if out8 else contrib_blk_c(),
            )
            lvl_operands = (dest_count, tbl, src_count, inv_i, src_pool,
                            base)
            alias = {5: 0}
        return pl.pallas_call(
            kern,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                scratch_shapes=scratch, **lvl_args,
            ),
            out_shape=r8_shape if out8 else contrib_shape,
            input_output_aliases=alias,
            interpret=interpret,
        )(*lvl_operands)

    src = phases[-1][0]
    for pi in range(len(phases) - 1, 0, -1):
        r8_prev = phases[pi - 1][0]
        _, src_count, inv_i, dc = phases[pi]
        src = combine_level(inv_i, src_count, dc, src, r8_prev, out8=True)
    contrib = combine_level(phases[0][2], phases[0][1], phases[0][3],
                            src, contrib, out8=False, home=True)
    if profile_stop == "combine":
        return _profile_probe(contrib)

    # --- contributions -> scanline pixel image (pure reshape/transpose) ---
    tiles_y = hp // 32
    img = contrib.reshape(tiles_y, tiles_x, 3, 32, block_w, spp)
    img = img.sum(axis=5)
    img = img.transpose(2, 0, 3, 1, 4).reshape(3, hp, wp)
    img = img[:, :height, :width].reshape(3, n).T

    base = jnp.where(clear, jnp.zeros_like(accum), accum)
    out = base + img
    if debug_counts:
        return out, (jnp.asarray([n_rows], jnp.int32),) + tuple(
            ph[1] for ph in phases)
    return out


def render_image_regrouped(*args, mxu_sweep: bool | None = None,
                           dyn_grid: bool | None = None,
                           combine_v2: bool | None = None,
                           pack_v2: bool | None = None,
                           skip_dead: bool | None = None,
                           rowsweep: bool | None = None,
                           rowsweep_k0: bool | None = None, **kwargs):
    """Public entry: resolves the scene-size/env defaults eagerly so the
    jit cache keys on concrete bools (an env flip mid-process would
    otherwise be silently ignored via the cached None trace)."""
    import os

    from .megakernel import _default_mxu_sweep, _wrapper_n_spheres

    if mxu_sweep is None:
        mxu_sweep = _default_mxu_sweep(_wrapper_n_spheres(args, kwargs))
    if dyn_grid is None:
        # dynamic grid bounds on the post-cut phases: bit-identical and
        # measured winning on chip (round 4: RTiOW 1080p 631.6 -> 646.1
        # Mrays/s, random10k 4K 179.0 -> 180.4), so default ON;
        # WRT_DYN_GRID=0 reverts to the static full-tile grid.
        dyn_grid = os.environ.get("WRT_DYN_GRID", "1") == "1"
    if combine_v2 is None:
        # windowed-matmul combine level: bit-identical to v1
        # (tests/test_regroup.py). Default ON per the round-5a pinned-env
        # chip A/B (v1 646.5 vs v2pair 793.6 Mrays/s RTiOW 1080p,
        # benchmarks/chip_logs/r5a_verdict.json — the r4b "parity" rerun
        # was corrupted by an unpinned base leg). WRT_COMBINE_V2=0
        # reverts to the guarded-row-DMA v1 kernel.
        combine_v2 = os.environ.get("WRT_COMBINE_V2", "1") == "1"
    if pack_v2 is None:
        # matmul-merge pack: bit-identical to v1 (tests/test_regroup.py).
        # Default ON per the same round-5a pinned A/B (priced as the
        # v2pair with combine_v2; r5a_verdict.json). WRT_PACK_V2=0
        # reverts to the scalar-merge v1 kernel.
        pack_v2 = os.environ.get("WRT_PACK_V2", "1") == "1"
    if skip_dead is None:
        # live-tile indirection for pack #1 + the final combine level:
        # bit-identical; default ON per the round-5a pinned chip A/B
        # (RTiOW 793.6 -> 819.2 Mrays/s, random10k 180.5 -> 191.7,
        # benchmarks/chip_logs/r5a_verdict.json). WRT_SKIP_DEAD=0
        # reverts to dense full-tile pack/combine grids.
        skip_dead = os.environ.get("WRT_SKIP_DEAD", "1") == "1"
    if skip_dead:
        # the indirection is implemented on the v2 kernels only
        combine_v2 = pack_v2 = True
    if rowsweep is None:
        # row-granular K1 traversal (round 5): bit-identical
        # (tests/test_regroup.py), default off until a chip session
        # prices it (WRT_ROWSWEEP=1 to measure)
        rowsweep = os.environ.get("WRT_ROWSWEEP", "0") == "1"
    if rowsweep_k0 is None:
        # same mechanism on K0's bounces >= 1 (bounce 0 stays on the
        # frustum lists); separate knob — K0 tiles are screen-coherent
        # and may not pay the per-row mask cost (WRT_ROWSWEEP_K0=1)
        rowsweep_k0 = os.environ.get("WRT_ROWSWEEP_K0", "0") == "1"
    kwargs["rowsweep"] = bool(rowsweep)
    kwargs["rowsweep_k0"] = bool(rowsweep_k0)
    if "k1_tsub" not in kwargs:
        # lockstep width of the K1 traversal rows (32 = whole tile;
        # 8 = per-sublane-row, only meaningful under rowsweep). The
        # production default follows the chip-sweep verdict
        # (benchmarks/chip_logs/r5b_verdict.json); WRT_K1_TSUB pins it.
        kwargs["k1_tsub"] = int(os.environ.get("WRT_K1_TSUB", "32"))
    if "k1_chunk_size" not in kwargs and os.environ.get("WRT_K1_CHUNK"):
        kwargs["k1_chunk_size"] = int(os.environ["WRT_K1_CHUNK"])
    kwargs["dyn_grid"] = bool(dyn_grid)
    kwargs["combine_v2"] = bool(combine_v2)
    kwargs["pack_v2"] = bool(pack_v2)
    kwargs["skip_dead"] = bool(skip_dead)
    return _render_image_regrouped_jit(*args, mxu_sweep=bool(mxu_sweep),
                                       **kwargs)


render_image_regrouped.__wrapped__ = _render_image_regrouped_jit
