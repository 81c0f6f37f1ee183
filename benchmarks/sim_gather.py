"""Offline sim: per-lane gather traversal vs the tile-uniform union sweep.

The round-3 ceiling analysis (docs/PERF.md) priced per-ray traversal as
the only remaining 2x lever on RTiOW (117 vs ~480 tests/segment) but
declared "no VPU mechanism". The round-2 Mosaic probes, however,
verified per-lane dynamic indexing ALONG LANES on chip
(`jnp.take_along_axis(tab, idx, axis=-1)` on (8,128)/(32,128) f32,
benchmarks/probe_mosaic.py) — which enables this design:

  Per (8,128) register row, each lane builds its OWN entered-chunk mask
  (chunk AABBs broadcast from SMEM exactly like today's cull, but the
  tnear/tfar compare is against the lane's own seeded best-t instead of
  the row/tile any-lane union), then the row iterates k = 0 ..
  max-set-bits-over-row waves: each lane extracts its k-th entered chunk
  id from its mask (bit tricks) and tests that chunk's cs spheres via
  per-lane gathers of (cx, cy, cz, kq) from the sphere table —
  take_along_axis per 128-sphere row, cross-row reach paid with selects.

SIMD economics: masked-lane pruning saves nothing (the wave still runs),
so the cost driver is max-STATICALLY-entered per register row — entered
masks are built once per segment against the ray's initial best-t seed
and cannot shrink as sibling waves tighten best-t. This sim therefore
measures, on exact oracle-generated mid-path ray populations grouped by
the kernel's real fold geometry:

  - evolving tile union            -> today's sweep cost (sanity: ~15/16
                                      chunks, ~480 tests/seg on RTiOW)
  - per-lane static entered        -> gather waves, no best-t seed
  - per-lane oracle-seeded entered -> gather waves, best-t seeded with
                                      the TRUE hit t (lower bound on any
                                      realizable seeding)

and prices both designs in VPU ops per register row per segment:

  union:  U_tile * cs * C_V                         (C_V ~ 23)
  gather: maxk_row * (cs * C_G + C_K) + N_chunks * C_M
     C_G = 4 attrs * (2*rows_S - 1) + 19   (rows_S = ceil(S_pad/128))
     C_K = 12 (k-th set bit), C_M = 17 (mask-build slab test per chunk)

    python benchmarks/sim_gather.py [rtiow|random10k] [quick]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIN_T = 1.0e-3
MAX_T = 1.0e8
C_V = 23.0   # VPU ops per sphere per register row, union sweep
C_K = 12.0   # per-wave k-th-set-bit extraction per row
C_M = 17.0   # per-chunk mask-build slab test per row


def c_gather(n_spheres_padded: int) -> float:
    rows_s = -(-n_spheres_padded // 128)
    return 4.0 * (2 * rows_s - 1) + 19.0


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.ops.pallas.megakernel import (
        default_chunk_size, prepare_scene_arrays,
    )
    from weekend_raytracer_tpu.reference import OracleTracer

    args = sys.argv[1:]
    scene_name = next((a for a in args if a in ("rtiow", "random10k")),
                      "rtiow")
    quick = "quick" in args
    if scene_name == "random10k":
        w, h, spp = 3840, 2160, 8
        desc, cam = (scenes.random_spheres(10000),
                     scenes.random_spheres_camera())
        bounces = 8
    else:
        w, h, spp = 1920, 1080, 32
        desc, cam = scenes.rtiow_final(), scenes.rtiow_final_camera()
        bounces = 8
    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))

    # --- kernel fold geometry (regroup.py): a (32,128) tile covers a
    # block_w x 32 pixel block, lane = x_in_block*spp + s ---
    spp_shift = spp.bit_length() - 1
    block_w = 128 >> spp_shift
    tiles_x = -(-w // block_w)

    # --- sampled tiles spread over the frame ---
    n_tiles_sim = 8 if quick else 48
    rng = np.random.default_rng(7)
    ty_all = h // 32
    picks = rng.choice(tiles_x * ty_all, size=n_tiles_sim, replace=False)
    picks.sort()
    pixel_ids = []
    for t in picks:
        ty, tx = divmod(int(t), tiles_x)
        xs = np.arange(tx * block_w, min((tx + 1) * block_w, w))
        ys = np.arange(ty * 32, min((ty + 1) * 32, h))
        gx, gy = np.meshgrid(xs, ys)
        pixel_ids.append((gy * w + gx).ravel())
    pixels = np.concatenate(pixel_ids)

    # --- oracle trace, capturing every bounce-segment population ---
    tracer = OracleTracer(desc, cam, w, h)
    caps = {}  # bounce -> list over samples of (o, d, alive)

    def on_bounce(s, b, o, d, alive):
        caps.setdefault(b, []).append((o.copy(), d.copy(), alive.copy()))

    spp_sim = spp if not quick else max(spp // 4, 4)
    tracer.render(spp_sim, bounces, on_bounce=on_bounce, pixels=pixels)

    # --- kernel sphere/chunk arrays (exact morton + front-to-back order)
    for cs in ((16, 32) if scene_name == "rtiow" else (32, 64)):
        (s_attrs, chunk_arrays, _sa, n_sph, n_chunks, _ns, _tp,
         _lut) = prepare_scene_arrays(scene, basis, cs, 16)
        scx, scy, scz = (np.asarray(s_attrs[i], np.float64) for i in
                         range(3))
        srad = np.asarray(s_attrs[3], np.float64)
        lo = np.stack([np.asarray(chunk_arrays[i], np.float64)
                       for i in range(3)], 1)
        hi = np.stack([np.asarray(chunk_arrays[i], np.float64)
                       for i in range(3, 6)], 1)
        cg = c_gather(n_sph)

        for b in sorted(caps):
            rows = simulate_segment(caps[b], pixels, w, block_w, spp_sim,
                                    scx, scy, scz, srad, lo, hi, cs,
                                    n_chunks)
            if rows is None:
                continue
            (n_live, u_tile, static_maxk, seeded_maxk, static_mean,
             seeded_mean, per_ray_evolv, s1_maxk, s4_maxk, s1_mean,
             s4_mean, rem2_maxk, rem2_mean) = rows
            ops_union = u_tile * cs * C_V                # per row per seg
            mask_cost = n_chunks * C_M

            def g_ops(maxk, n_seed=0):
                return (maxk * (cs * cg + C_K) + mask_cost
                        + n_seed * C_V)

            print(json.dumps({
                "scene": scene_name, "cs": cs, "bounce": b,
                "live_rays": int(n_live),
                "union_tile_mean": round(float(u_tile), 2),
                "tests_per_seg_union": round(float(u_tile * cs), 1),
                "per_ray_entered_evolving": round(float(per_ray_evolv), 2),
                "entered_mean": {
                    "static": round(float(static_mean), 2),
                    "seed1": round(float(s1_mean), 2),
                    "seed4": round(float(s4_mean), 2),
                    "oracle": round(float(seeded_mean), 2)},
                "row_maxk_mean": {
                    "static": round(float(static_maxk), 2),
                    "seed1": round(float(s1_maxk), 2),
                    "seed4": round(float(s4_maxk), 2),
                    "2pass": round(float(1 + rem2_maxk), 2),
                    "oracle": round(float(seeded_maxk), 2)},
                "ops_row_union": round(float(ops_union)),
                "speedup": {
                    "static": round(float(ops_union / g_ops(static_maxk)), 3),
                    "seed1": round(
                        float(ops_union / g_ops(s1_maxk, 1)), 3),
                    "seed4": round(
                        float(ops_union / g_ops(s4_maxk, 4)), 3),
                    "2pass": round(
                        float(ops_union
                              / (g_ops(1 + rem2_maxk, 4) + mask_cost)), 3),
                    "oracle": round(
                        float(ops_union / g_ops(seeded_maxk)), 3)},
            }), flush=True)
    return 0


def simulate_segment(samples, pixels, w, block_w, spp, scx, scy, scz,
                     srad, lo, hi, cs, n_chunks):
    """Pack one bounce segment's live rays in kernel home order, then
    compute per-ray entered-chunk stats and group them into (8,128)
    register rows (1024 consecutive packed rays) and (32,128) tiles."""
    # home order: tiles were sampled in index order; within a tile,
    # home slot = (sublane=y%32) * 128 + (x%block_w)*spp + s
    x = (pixels % w).astype(np.int64)
    y = (pixels // w).astype(np.int64)
    n_tile_px = block_w * 32
    n_tiles = len(pixels) // n_tile_px
    o_all = np.concatenate([s[0] for s in samples], 0)
    d_all = np.concatenate([s[1] for s in samples], 0)
    a_all = np.concatenate([s[2] for s in samples], 0)
    packed = []  # live ray indices (into *_all), kernel home order
    for t in range(n_tiles):
        sl = slice(t * n_tile_px, (t + 1) * n_tile_px)
        sub = y[sl] % 32
        xin = x[sl] % block_w
        base = np.full(32 * 128, -1, np.int64)
        for s in range(spp):
            home = sub * 128 + xin * spp + s  # lane encodes (x%bw, s)
            base[home] = np.arange(sl.start, sl.stop) + s * len(pixels)
        live = base[base >= 0]
        live = live[a_all[live]]
        packed.append(live)
    packed = np.concatenate(packed)
    n_live = packed.shape[0]
    if n_live < 1024:
        return None
    o = o_all[packed].astype(np.float64)
    d = d_all[packed].astype(np.float64)

    eps = 1.0e-12
    sgn = np.where(d >= 0, 1.0, -1.0)
    invd = 1.0 / (sgn * np.maximum(np.abs(d), eps))
    L = o.shape[0]

    # --- per-ray evolving entered + true hit t (front-to-back order) ---
    bt = np.full(L, MAX_T)
    entered_evolv = np.zeros(L, np.int64)
    static_mask = np.zeros((L, n_chunks), bool)
    tnear_all = np.empty((L, n_chunks))
    t_first = np.full(L, MAX_T)  # min-t of the ray's FIRST entered chunk
    for k in range(n_chunks):
        t0 = (lo[k][None] - o) * invd
        t1 = (hi[k][None] - o) * invd
        tnear = np.minimum(t0, t1).max(1)
        tfar = np.maximum(t0, t1).min(1)
        slab = (tfar >= tnear) & (tfar > MIN_T)
        tnear_all[:, k] = np.where(slab, tnear, MAX_T)
        static_mask[:, k] = slab
        enter = slab & (tnear < bt)
        entered_evolv += enter
        if enter.any():
            ids = k * cs + np.arange(cs)
            ocx = o[:, 0:1] - scx[ids][None]
            ocy = o[:, 1:2] - scy[ids][None]
            ocz = o[:, 2:3] - scz[ids][None]
            bq = ocx * d[:, 0:1] + ocy * d[:, 1:2] + ocz * d[:, 2:3]
            cq = ocx**2 + ocy**2 + ocz**2 - srad[ids][None] ** 2
            disc = bq * bq - cq
            sq = np.sqrt(np.maximum(disc, 0))
            tt0 = -bq - sq
            tt1 = -bq + sq
            ok = disc > 0
            t_hit = np.where(ok & (tt0 > MIN_T), tt0,
                             np.where(ok & (tt1 > MIN_T), tt1, MAX_T))
            tmin = t_hit.min(1)
            first = enter & (entered_evolv == 1)  # just counted above
            t_first = np.where(first, tmin, t_first)
            bt = np.where(enter, np.minimum(bt, tmin), bt)

    t_true = bt  # true closest hit (MAX_T for sky rays)
    static_cnt = static_mask.sum(1)
    seeded_mask = static_mask & (tnear_all <= t_true[:, None] + 1e-9)
    seeded_cnt = seeded_mask.sum(1)

    # realizable seed: broadcast-test the K largest spheres first (the
    # RTiOW ground sphere bounds every downward ray), THEN build masks
    # against that per-lane best-t — same broadcast economics as today's
    # sweep, K extra sphere tests per row
    k_seed = 4
    big = np.argsort(-np.abs(srad))[:k_seed]
    ocx = o[:, 0:1] - scx[big][None]
    ocy = o[:, 1:2] - scy[big][None]
    ocz = o[:, 2:3] - scz[big][None]
    bq = ocx * d[:, 0:1] + ocy * d[:, 1:2] + ocz * d[:, 2:3]
    cq = ocx**2 + ocy**2 + ocz**2 - srad[big][None] ** 2
    disc = bq * bq - cq
    sq = np.sqrt(np.maximum(disc, 0))
    tt0, tt1 = -bq - sq, -bq + sq
    ok = disc > 0
    t_seed_each = np.where(ok & (tt0 > MIN_T), tt0,
                           np.where(ok & (tt1 > MIN_T), tt1, MAX_T))
    bt_seed1 = t_seed_each[:, 0]
    bt_seed4 = t_seed_each.min(1)
    seed1_mask = static_mask & (tnear_all <= bt_seed1[:, None] + 1e-9)
    seed4_mask = static_mask & (tnear_all <= bt_seed4[:, None] + 1e-9)
    seed1_cnt = seed1_mask.sum(1)
    seed4_cnt = seed4_mask.sum(1)

    # two-pass: wave 0 tests each lane's FIRST entered chunk (front-to-
    # back nearest), then masks are REBUILT against the tightened best-t
    # (min of the seed-set t and the first chunk's hit t); remaining
    # waves run on the rebuilt mask. Realizable: costs one extra mask
    # build + one guaranteed wave.
    bt2 = np.minimum(bt_seed4, t_first)
    mask2 = static_mask & (tnear_all <= bt2[:, None] + 1e-9)
    has_any = static_cnt > 0
    rem2_cnt = np.clip(mask2.sum(1) - 1, 0, None) * has_any

    # --- group into register rows (1024 consecutive) and tiles (4096) ---
    n_rows = L // 1024
    rmax = lambda c: float(
        c[: n_rows * 1024].reshape(n_rows, 1024).max(1).mean())
    rows_static = static_cnt[: n_rows * 1024].reshape(n_rows, 1024)
    rows_seeded = seeded_cnt[: n_rows * 1024].reshape(n_rows, 1024)
    n_t = L // 4096
    if n_t == 0:
        return None
    u_tile = np.array([
        static_mask[i * 4096:(i + 1) * 4096].any(0).sum()
        for i in range(n_t)
    ])
    # evolving union (what the kernel's cond actually executes): a chunk
    # runs if any lane's tnear beats the GROUP max best-t at visit time —
    # approximate with any-lane static-entered pruned by group max t_true
    u_tile_evolv = np.array([
        (static_mask[i * 4096:(i + 1) * 4096]
         & (tnear_all[i * 4096:(i + 1) * 4096]
            <= t_true[i * 4096:(i + 1) * 4096].max() + 1e-9)).any(0).sum()
        for i in range(n_t)
    ])
    return (n_live, float(u_tile_evolv.mean()),
            float(rows_static.max(1).mean()),
            float(rows_seeded.max(1).mean()),
            float(static_cnt.mean()), float(seeded_cnt.mean()),
            float(entered_evolv.mean()),
            rmax(seed1_cnt), rmax(seed4_cnt),
            float(seed1_cnt.mean()), float(seed4_cnt.mean()),
            rmax(rem2_cnt), float(rem2_cnt.mean()))


if __name__ == "__main__":
    raise SystemExit(main())
