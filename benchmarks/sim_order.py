"""Offline, order-aware cull simulation (round 3).

probe_binned.py showed that re-binning rays WITHOUT changing the chunk
visit order does nothing: entered-chunk counts are ORDER-dependent — a
chunk passes the `tnear < best_t` cull only if it is visited before
best_t tightens, and the global eye-front-to-back order is arbitrary for
post-cut rays. This script replays the kernel's cull logic in NumPy on a
dumped pool (probe_binned.py ... dump) under different visit orders:

    global   the kernel's current order (chunks pre-sorted from the eye)
    bin      per-(origin-chunk-group x octant) order: chunks sorted by
             AABB distance from the bin's member origins' centroid
             (realizable in-kernel: one SMEM list per bin)
    perray   each ray visits chunks sorted by its own tnear (the
             unrealizable ideal; lower bound)

For each it reports mean entered chunks per ray AND the (32,128)-tile
union entered count under bin-grouped tiles — the number K1 would pay.

    python benchmarks/sim_order.py /tmp/pool_random10k_cut3.npz [n_rays]
"""
from __future__ import annotations

import json
import sys

import numpy as np

MIN_T = 1.0e-3
MAX_T = 1.0e8


def main() -> int:
    path = sys.argv[1]
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    d = np.load(path)
    recs = d["recs"]
    clox, cloy, cloz, chix, chiy, chiz = d["chunk_bounds"]
    scx, scy, scz, srad = d["s_attrs"]
    kq = d["kq"]
    cs = int(d["chunk_size"])
    nc = clox.shape[0]
    rng = np.random.default_rng(0)
    sel = rng.choice(recs.shape[0], size=min(n_sample, recs.shape[0]),
                     replace=False)
    sel.sort()
    o = recs[sel, 0:3].astype(np.float64)
    dir_ = recs[sel, 3:6].astype(np.float64)
    L = o.shape[0]

    lo = np.stack([clox, cloy, cloz], 1).astype(np.float64)  # (NC, 3)
    hi = np.stack([chix, chiy, chiz], 1).astype(np.float64)

    # --- bin assignment: origin chunk (nearest AABB) x octant ---
    chunk_of = np.zeros(L, np.int64)
    bs = 1 << 16
    for i in range(0, L, bs):
        sl = slice(i, min(i + bs, L))
        q = np.clip(o[sl, None, :], lo[None], hi[None]) - o[sl, None, :]
        chunk_of[sl] = np.argmin((q * q).sum(-1), axis=1)
    octant = ((dir_[:, 0] >= 0) * 4 + (dir_[:, 1] >= 0) * 2
              + (dir_[:, 2] >= 0)).astype(np.int64)
    # group chunks so bins stay <= 1024 (kernel budget is ~128-512)
    shift = 0
    while -(-nc >> shift) * 8 > 1024:
        shift += 1
    bin_id = (chunk_of >> shift) * 8 + octant
    n_bins = int(bin_id.max()) + 1

    # per-bin chunk order: by AABB distance from the bin's origin centroid
    bin_orders = np.tile(np.arange(nc), (n_bins, 1))
    for b in range(n_bins):
        m = bin_id == b
        if not m.any():
            continue
        c = o[m].mean(0)
        q = np.clip(c[None], lo, hi) - c[None]
        bin_orders[b] = np.argsort((q * q).sum(-1), kind="stable")

    # per-ray tnear for the ideal order + the slab test pieces
    eps = 1.0e-12
    sgn = np.where(dir_ >= 0, 1.0, -1.0)
    invd = 1.0 / (sgn * np.maximum(np.abs(dir_), eps))  # (L,3)

    def slabs(cids):
        """tnear/tfar of each ray vs its chunk cids (L,)."""
        t0 = (lo[cids] - o) * invd
        t1 = (hi[cids] - o) * invd
        tnear = np.minimum(t0, t1).max(1)
        tfar = np.maximum(t0, t1).min(1)
        return tnear, tfar

    def sphere_best(cids, bt):
        """min hit t over the chunk's spheres per ray (MAX_T if none)."""
        ids = cids[:, None] * cs + np.arange(cs)[None, :]  # (L, cs)
        cx, cy, cz = scx[ids], scy[ids], scz[ids]
        kqs = kq[ids]
        od = (o * dir_).sum(1)[:, None]
        oo = (o * o).sum(1)[:, None]
        cd = cx * dir_[:, 0:1] + cy * dir_[:, 1:2] + cz * dir_[:, 2:3]
        co = cx * o[:, 0:1] + cy * o[:, 1:2] + cz * o[:, 2:3]
        bq = od - cd
        cq = oo - 2.0 * co + kqs
        disc = bq * bq - cq
        sq = np.sqrt(np.maximum(disc, 0.0))
        t0 = -bq - sq
        t1 = -bq + sq
        ts = np.where(t0 > MIN_T, t0, t1)
        valid = (disc > 0.0) & (ts > MIN_T)
        return np.where(valid, ts, MAX_T).min(1)

    def simulate(order_per_ray):
        """order_per_ray: (L, NC) visit order. Returns per-ray entered
        bool (L, NC in visit positions mapped back to chunk ids)."""
        bt = np.full(L, MAX_T)
        entered = np.zeros((L, nc), bool)
        for k in range(nc):
            cids = order_per_ray[:, k]
            tnear, tfar = slabs(cids)
            enter = (tfar >= tnear) & (tfar > MIN_T) & (tnear < bt)
            if enter.any():
                tbest = sphere_best(cids, bt)
                bt = np.where(enter, np.minimum(bt, tbest), bt)
                entered[np.arange(L), cids] |= enter
        return entered

    def report(name, entered):
        per_ray = entered.sum(1)
        # tile union: group rays by bin, tiles of 4096
        order = np.argsort(bin_id, kind="stable")
        ent_sorted = entered[order]
        unions = []
        for i in range(0, L - 4095, 4096):
            unions.append(ent_sorted[i:i + 4096].any(0).sum())
        print(json.dumps({
            "order": name,
            "mean_entered_per_ray": round(float(per_ray.mean()), 1),
            "tile_union_entered_mean": round(float(np.mean(unions)), 1)
            if unions else None,
            "n_chunks": nc,
            "tests_per_exec_iter": round(float(np.mean(unions)) * cs, 0)
            if unions else None,
        }), flush=True)

    glob = np.tile(np.arange(nc), (L, 1))
    report("global", simulate(glob))

    report("bin", simulate(bin_orders[bin_id]))

    # ideal: per-ray tnear sort (clamp unhittables to the end)
    t0 = (lo[None] - o[:, None]) * invd[:, None]
    t1 = (hi[None] - o[:, None]) * invd[:, None]
    tnear_all = np.minimum(t0, t1).max(2)
    tfar_all = np.maximum(t0, t1).min(2)
    miss = (tfar_all < tnear_all) | (tfar_all < MIN_T)
    keyv = np.where(miss, 1e18, tnear_all)
    ideal = np.argsort(keyv, axis=1, kind="stable")
    report("perray", simulate(ideal))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
