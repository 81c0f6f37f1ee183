"""Per-ray-group traversal: the binned regrouped wavefront (round 3).

The lane-regrouped wavefront (ops/pallas/regroup.py) compacts live rays
densely but keeps them in HOME (screen) order, so post-cut K1 tiles hold
omnidirectional rays and the tile-uniform chunk-cull union saturates
(entry 0.878 on RTiOW / 0.251 on random10k at cut 3 — docs/PERF.md).
This module instead packs live rays GROUPED BY TRAVERSAL TARGET:

    key = (morton chunk of the last hit  >> shift) * 8 + direction octant

so every K1 tile's rays share their origin region and direction octant,
collapsing the cull union to the bin's working set (the wgsl reference's
per-thread traversal at raytracer.wgsl:130-169, rebuilt as ray binning —
a TPU tile must agree on its sweep, so coherence is manufactured by
regrouping rather than assumed from SIMT divergence hardware).

Pipeline per frame:

  K0       camera + bounces [0, cut) on screen tiles; dumps the pool in
           home layout with the per-lane bin key in _SPARE
           (regroup._make_k0(export_key=...)).
  COUNT    per-tile histogram of live-lane keys (roll-compare over the
           128-lane bin space); XLA reduces to per-bin totals and
           row-aligned region starts.
  PLACE    sequential-grid binned compaction: each tile's rows are
           key-sorted in-register (bitonic over lanes, all rows in
           parallel), then a while-loop walks the sorted runs and
           appends each run to its bin's carry row (per-bin carries in
           VMEM, fills/cursors as vectors), emitting full 128-record
           rows by async DMA through a staging ring. Emits the inverse
           map (per home slot -> binned pool position) for the combine.
  K1       the UNCHANGED regroup resume kernel over the binned pool:
           records carry origin/direction/throughput/home, RNG is
           re-derived from home slots, so per-record radiance is
           bit-identical to every other fused backend.
  COMBINE  XLA gather: each home slot fetches its record's radiance
           through the inverse map (t and c ride the records, so the
           final per-slot contribution is bit-identical to the
           regroup/wavefront paths' unpack).

The pack is stable in (tile, row, sorted-lane) order within each bin;
records of one bin occupy a contiguous row-aligned region, so K1 tiles
span one or a few ADJACENT bins.
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
    _is_cpu,
    build_frustum_lists,
    pack_camera,
    pack_sky,
    prepare_scene_arrays,
)
from .regroup import (
    _AL,
    _DEAD_HHI,
    _DEAD_ROW,
    _HHI,
    _HLO,
    _INV_LANE,
    _INV_ROW,
    _SPARE,
    N_COMP,
    N_INV,
    _make_k0,
    _make_k1,
)

_DEAD_KEY = 160.0  # sorts after every real bin key (< n_bins <= 128)


def bin_shift(n_chunks: int, n_bins: int = 128) -> int:
    """Chunk-group shift so (n_chunks >> shift) * 8 <= n_bins."""
    shift = 0
    while -(-n_chunks >> shift) * 8 > n_bins:
        shift += 1
    return shift


def _count_kernel(count_ref, pool_ref, hist_ref):
    """Per-tile histogram of live-lane bin keys.

    For each lane shift s, a lane-roll aligns key[r, (l-s) mod 128] with
    lane l; comparing against the lane index accumulates
    hist[r, b] = #{l : key[r, l] == b}. XLA sums the row dim. Tiles past
    the live count emit zeros."""
    t = pl.program_id(0)
    rows = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
    lane_f = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1).astype(
        jnp.float32)
    limit = count_ref[0] - t * 32
    keys = pool_ref[0, _SPARE]
    alive = (pool_ref[0, _AL] > 0.5) & (rows < limit)
    keys = jnp.where(alive, keys, _DEAD_KEY)
    cnt = jnp.zeros((32, 128), jnp.float32)
    for s in range(128):
        rolled = pltpu.roll(keys, s, 1) if s else keys
        cnt = cnt + jnp.where(rolled == lane_f, 1.0, 0.0)
    hist_ref[0] = cnt


def _make_place_kernel(n_bins: int, max_emits: int):
    """Binned compaction with per-bin carry rows.

    Scalar state (per-bin fill and row cursor, the staging-ring emit
    counter) lives in (8, 128) VMEM vectors: reading entry b is a masked
    max-reduce, writing is a lane-select — both proven Mosaic primitives
    (no dynamic SMEM indexing needed). Run boundaries are read from the
    sorted key row with the same masked-reduce trick."""
    f32 = jnp.float32

    def kernel(count_ref, base_ref, pool_ref, cpool_hbm, inv_ref,
               count_out_ref, spool, skey, snext, sdest, state_vmem,
               carry_vmem, staging, sems):
        # state_vmem rows: 0 = fill[b], 1 = cursor[b] (as f32, exact)
        t = pl.program_id(0)
        n_tiles = pl.num_programs(0)
        is_last = t == n_tiles - 1
        rows32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0)
        lane32 = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 1)
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        lane8f = lane8.astype(f32)
        lane1 = lane8[:1]
        lane1f = lane8f[:1]

        @pl.when(t == 0)
        def _():
            # fill = 0, cursor = the XLA-computed region start rows
            state_vmem[0:1] = jnp.zeros((1, 128), f32)
            base_rows = jnp.broadcast_to(base_ref[0:1], (1, 128))
            state_vmem[1:2] = base_rows
            state_vmem[2:3] = jnp.zeros((1, 128), f32)  # emit counter @ [2,0]

        limit = count_ref[0] - t * 32

        @pl.when(limit > 0)
        def _():
            alive = (pool_ref[0, _AL] > 0.5) & (rows32 < limit)
            keys = jnp.where(alive, pool_ref[0, _SPARE], _DEAD_KEY)

            # --- per-row stable key sort along lanes (bitonic, all rows
            # in parallel); sv = key * 128 + lane keeps it stable and
            # exact in f32 (< 2^15)
            sv = keys * 128.0 + lane32.astype(f32)
            v = sv
            k = 2
            while k <= 128:
                j = k // 2
                while j >= 1:
                    partner = lane32 ^ j
                    pv = jnp.take_along_axis(v, partner, axis=1)
                    up = (lane32 & k) == 0
                    keep_min = (lane32 < partner) == up
                    v = jnp.where(keep_min, jnp.minimum(v, pv),
                                  jnp.maximum(v, pv))
                    j //= 2
                k *= 2
            skey_blk = jnp.floor(v * f32(1.0 / 128.0))
            slane = (v - skey_blk * 128.0).astype(jnp.int32)

            # sorted payload (16 comps) into VMEM scratch
            for comp in range(N_COMP):
                g = jnp.take_along_axis(pool_ref[0, comp], slane, axis=1)
                if comp == _SPARE:
                    g = skey_blk  # carry the (possibly dead) sort key
                elif comp == _HHI:
                    g = jnp.where(skey_blk < _DEAD_KEY, g, _DEAD_HHI)
                spool[comp] = g
            skey[:] = skey_blk

            # next-run-boundary index per sorted lane: largest span of
            # equal keys starting at l ends at nxt[l] (inclusive). Suffix
            # scan via doubling rolls: nxt[l] = max r >= l with
            # key[r] == key[l] on the sorted row.
            nxt = lane32
            kk = skey_blk
            for s in (1, 2, 4, 8, 16, 32, 64):
                shifted_key = pltpu.roll(kk, -s, 1)
                shifted_nxt = pltpu.roll(nxt, -s, 1)
                same = (pltpu.roll(skey_blk, -s, 1) == skey_blk) & (
                    lane32 + s < 128)
                # chain: if the run continues s ahead, inherit its end
                nxt = jnp.where(same & (nxt == lane32 + s - 1 + 1 - 1),
                                nxt, nxt)  # placeholder, fixed below
                del shifted_key, shifted_nxt
            # (simpler exact formulation below)
            # boundary[l] = 1 if l is last lane of its run
            nxt_key = pltpu.roll(skey_blk, -1, 1)
            is_end = (skey_blk != nxt_key) | (lane32 == 127)
            # end index per lane: min over r >= l of (r where is_end[r])
            endv = jnp.where(is_end, lane32, 200)
            for s in (1, 2, 4, 8, 16, 32, 64):
                cand = pltpu.roll(endv, -s, 1)
                cand = jnp.where(lane32 + s < 128, cand, 200)
                endv = jnp.minimum(endv, cand)
            snext[:] = endv.astype(f32)

            # count of live records per row (dead keys sorted last)
            live_row = jnp.sum(
                jnp.where(skey_blk < _DEAD_KEY, 1.0, 0.0), axis=1,
                keepdims=True)  # (32, 1)

            # --- run walk: (r, pos) cursor over sorted rows ---
            def scalar_at(ref, r, pos):
                row = ref[pl.ds(r, 1), :]
                return jnp.max(jnp.where(lane1 == pos, row, -1.0))

            def cond(carry):
                r, pos, emits = carry
                return r < 32

            def body(carry):
                r, pos, emits = carry
                key_f = scalar_at(skey, r, pos)
                end_i = scalar_at(snext, r, pos).astype(jnp.int32)
                is_live = key_f < _DEAD_KEY

                def do_append(emits):
                    b = key_f  # f32 bin id, exact
                    b_i = b.astype(jnp.int32)
                    c = end_i - pos + 1
                    srow = state_vmem[0:1, :]
                    scur = state_vmem[1:2, :]
                    fill = jnp.max(
                        jnp.where(lane1 == b_i, srow, -1.0)).astype(
                        jnp.int32)
                    cursor = jnp.max(
                        jnp.where(lane1 == b_i, scur, -1.0)).astype(
                        jnp.int32)
                    # rotate the run from lanes [pos, pos+c) to
                    # [fill, fill+c) and merge into the bin's carry
                    carry_blk = carry_vmem[b_i]
                    idx = (lane32[:N_COMP] * 0 + 1)  # unused placeholder
                    del idx
                    rot = (jnp.broadcast_to(lane1, (N_COMP, 128))
                           - fill + pos) & 127
                    run_rows = spool[:, pl.ds(r, 1), :].reshape(N_COMP, 128)
                    rolled = jnp.take_along_axis(run_rows, rot, axis=1)
                    lanes_n = jnp.broadcast_to(lane1, (N_COMP, 128))
                    tot = fill + c
                    in_new = (lanes_n >= fill) & (lanes_n < tot)
                    merged = jnp.where(in_new, rolled, carry_blk)
                    over = tot >= 128

                    @pl.when(over)
                    def _(emits=emits):
                        slot = emits % 32

                        @pl.when(emits >= 32)
                        def _():
                            pltpu.make_async_copy(
                                staging.at[slot], staging.at[slot],
                                sems.at[slot]).wait()

                        staging[pl.ds(slot, 1)] = merged[None]
                        d = cursor
                        pltpu.make_async_copy(
                            staging.at[slot],
                            cpool_hbm.at[d // 32, :, d % 32],
                            sems.at[slot],
                        ).start()

                    wrap = (lanes_n < tot - 128)
                    new_carry = jnp.where(
                        over,
                        jnp.where(wrap, rolled, jnp.zeros_like(rolled)),
                        merged,
                    )
                    carry_vmem[b_i] = new_carry
                    new_fill = jnp.where(over, tot - 128, tot)
                    new_cursor = jnp.where(over, cursor + 1, cursor)
                    sel = lane1 == b_i
                    state_vmem[0:1, :] = jnp.where(
                        sel, new_fill.astype(f32), srow)
                    state_vmem[1:2, :] = jnp.where(
                        sel, new_cursor.astype(f32), scur)
                    # inverse-map dest for this run's records (global
                    # dense position = cursor*128 + fill + offset)
                    g0 = cursor * 128 + fill - pos
                    drow = sdest[pl.ds(r, 1), :]
                    in_run = (lane1 >= pos) & (lane1 <= end_i)
                    sdest[pl.ds(r, 1), :] = jnp.where(
                        in_run, (g0 + lane1).astype(f32), drow)
                    return jnp.where(over, emits + 1, emits)

                emits = jax.lax.cond(is_live, do_append,
                                     lambda e: e, emits)
                nxt_pos = end_i + 1
                adv = (nxt_pos >= 128) | (~is_live)
                r2 = jnp.where(adv, r + 1, r)
                pos2 = jnp.where(adv, 0, nxt_pos)
                return (r2, pos2, emits)

            emits0 = jnp.max(
                jnp.where(lane1 == 0, state_vmem[2:3, :], -1.0)).astype(
                jnp.int32)
            sdest[:] = jnp.full((32, 128), _DEAD_ROW, f32)
            _, _, emits_end = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(0), emits0))
            state_vmem[2:3, :] = jnp.where(
                lane1 == 0, emits_end.astype(f32), state_vmem[2:3, :])

            # --- inverse map back to HOME lane order: each original
            # lane finds its sorted position by searching sv (sorted
            # strictly increasing per row), then gathers its dest.
            target = keys * 128.0 + lane32.astype(f32)
            lo = jnp.zeros((32, 128), jnp.int32)
            hi = jnp.full((32, 128), 127, jnp.int32)
            for _ in range(7):
                mid = (lo + hi) >> 1
                got = jnp.take_along_axis(v, mid, axis=1)
                ge = got >= target
                hi = jnp.where(ge, mid, hi)
                lo = jnp.where(ge, lo, mid + 1)
            dest = jnp.take_along_axis(sdest[:], lo, axis=1)
            alive_b = alive
            inv_ref[0, _INV_ROW] = jnp.where(
                alive_b, jnp.floor(dest * f32(1.0 / 128.0)), _DEAD_ROW)
            inv_ref[0, _INV_LANE] = jnp.where(
                alive_b, dest - jnp.floor(dest * f32(1.0 / 128.0)) * 128.0,
                0.0)
            inv_ref[0, 2] = jnp.zeros((32, 128), f32)
            inv_ref[0, 3] = jnp.zeros((32, 128), f32)

        @pl.when(is_last)
        def _():
            # flush every bin's partial carry row (sentinel-dead tails)
            emits0 = jnp.max(
                jnp.where(lane1 == 0, state_vmem[2:3, :], -1.0)).astype(
                jnp.int32)

            def fbody(b, emits):
                srow = state_vmem[0:1, :]
                scur = state_vmem[1:2, :]
                fill = jnp.max(jnp.where(lane1 == b, srow, -1.0)).astype(
                    jnp.int32)
                cursor = jnp.max(jnp.where(lane1 == b, scur, -1.0)).astype(
                    jnp.int32)

                def flush(emits):
                    blk = carry_vmem[b]
                    lanes_n = jnp.broadcast_to(lane1, (N_COMP, 128))
                    comp_i = jax.lax.broadcasted_iota(
                        jnp.int32, (N_COMP, 128), 0)
                    tail = lanes_n >= fill
                    blk = jnp.where(tail & (comp_i == _HHI), _DEAD_HHI, blk)
                    blk = jnp.where(tail & (comp_i == _AL), 0.0, blk)
                    slot = emits % 32

                    @pl.when(emits >= 32)
                    def _():
                        pltpu.make_async_copy(
                            staging.at[slot], staging.at[slot],
                            sems.at[slot]).wait()

                    staging[pl.ds(slot, 1)] = blk[None]
                    d = cursor
                    pltpu.make_async_copy(
                        staging.at[slot],
                        cpool_hbm.at[d // 32, :, d % 32],
                        sems.at[slot],
                    ).start()
                    return emits + 1

                return jax.lax.cond(fill > 0, flush, lambda e: e, emits)

            emits_end = jax.lax.fori_loop(0, n_bins, fbody, emits0)

            def wbody(i, _):
                @pl.when(i < jnp.minimum(emits_end, 32))
                def _():
                    pltpu.make_async_copy(
                        staging.at[i], staging.at[i], sems.at[i]).wait()
                return 0

            jax.lax.fori_loop(0, 32, wbody, 0)

        count_out_ref[0] = count_ref[0]

    return kernel
