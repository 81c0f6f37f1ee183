"""Offline design-space sweep for the K1 sweep structure (round 3).

sim_order.py established (RTiOW cut 3): per-ray entered chunks ~3.7/16
with visit order irrelevant, but the 4096-ray tile union saturates at 15
even under chunk x octant binning — diffuse scatter spreads each bin's
rays over many distinct chunk subsets. This sweep maps where the union
approaches the per-ray floor across:

    chunk size   32 (current) | 8 (finer leaves, 4x chunk count)
    bin key      chunkxoct (8 dirs) | chunkxcone (26-dir quantization)
    group size   128 | 512 | 1024 | 4096 rays sharing one cull decision

reporting tests-per-executed-iteration = union x chunk_size (the kernel
sweep cost driver) and the per-ray floor. Visit order is the global
front-to-back order (measured equivalent to ideal per-ray on RTiOW); for
scenes where order matters the per-bin order is applied when binning.

    python benchmarks/sim_design.py /tmp/pool_rtiow_cut3.npz [n_rays]
"""
from __future__ import annotations

import json
import sys

import numpy as np

MIN_T = 1.0e-3
MAX_T = 1.0e8


def main() -> int:
    path = sys.argv[1]
    n_sample = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    d = np.load(path)
    recs = d["recs"]
    scx, scy, scz, srad = d["s_attrs"].astype(np.float64)
    kq = d["kq"].astype(np.float64)
    cs0 = int(d["chunk_size"])
    ns = scx.shape[0]
    rng = np.random.default_rng(0)
    sel = rng.choice(recs.shape[0], size=min(n_sample, recs.shape[0]),
                     replace=False)
    sel.sort()
    o = recs[sel, 0:3].astype(np.float64)
    dir_ = recs[sel, 3:6].astype(np.float64)
    L = o.shape[0]

    eps = 1.0e-12
    sgn = np.where(dir_ >= 0, 1.0, -1.0)
    invd = 1.0 / (sgn * np.maximum(np.abs(dir_), eps))
    od = (o * dir_).sum(1)
    oo = (o * o).sum(1)

    def chunk_bounds(cs):
        nc = ns // cs
        cx = scx[: nc * cs].reshape(nc, cs)
        cy = scy[: nc * cs].reshape(nc, cs)
        cz = scz[: nc * cs].reshape(nc, cs)
        r = np.abs(srad[: nc * cs].reshape(nc, cs))
        lo = np.stack([(cx - r).min(1), (cy - r).min(1), (cz - r).min(1)], 1)
        hi = np.stack([(cx + r).max(1), (cy + r).max(1), (cz + r).max(1)], 1)
        return nc, lo, hi

    def simulate(cs, order_per_ray):
        nc, lo, hi = chunk_bounds(cs)
        bt = np.full(L, MAX_T)
        entered = np.zeros((L, nc), bool)
        ar = np.arange(L)
        for k in range(nc):
            cids = order_per_ray[:, k]
            t0 = (lo[cids] - o) * invd
            t1 = (hi[cids] - o) * invd
            tnear = np.minimum(t0, t1).max(1)
            tfar = np.maximum(t0, t1).min(1)
            enter = (tfar >= tnear) & (tfar > MIN_T) & (tnear < bt)
            if enter.any():
                ids = cids[:, None] * cs + np.arange(cs)[None, :]
                cd = (scx[ids] * dir_[:, 0:1] + scy[ids] * dir_[:, 1:2]
                      + scz[ids] * dir_[:, 2:3])
                co = (scx[ids] * o[:, 0:1] + scy[ids] * o[:, 1:2]
                      + scz[ids] * o[:, 2:3])
                bq = od[:, None] - cd
                cq = oo[:, None] - 2.0 * co + kq[ids]
                disc = bq * bq - cq
                sq = np.sqrt(np.maximum(disc, 0.0))
                ts = np.where(-bq - sq > MIN_T, -bq - sq, -bq + sq)
                ts = np.where((disc > 0.0) & (ts > MIN_T), ts, MAX_T).min(1)
                bt = np.where(enter, np.minimum(bt, ts), bt)
                entered[ar, cids] |= enter
        return entered

    # --- bin keys ---
    def origin_chunk(cs):
        nc, lo, hi = chunk_bounds(cs)
        out = np.zeros(L, np.int64)
        bs = 1 << 14
        for i in range(0, L, bs):
            sl = slice(i, min(i + bs, L))
            q = (np.clip(o[sl, None, :], lo[None], hi[None])
                 - o[sl, None, :])
            out[sl] = np.argmin((q * q).sum(-1), axis=1)
        return out

    octant = ((dir_[:, 0] >= 0) * 4 + (dir_[:, 1] >= 0) * 2
              + (dir_[:, 2] >= 0)).astype(np.int64)
    # 26-direction cone id: nearest of the 3x3x3-minus-center directions
    g = np.stack(np.meshgrid(*[[-1, 0, 1]] * 3, indexing="ij"),
                 -1).reshape(-1, 3).astype(np.float64)
    g = g[(g != 0).any(1)]
    g /= np.linalg.norm(g, axis=1, keepdims=True)
    cone = np.argmax(dir_ @ g.T, axis=1).astype(np.int64)

    oc32 = origin_chunk(32)

    def report(tag, cs, key):
        nc, _, _ = chunk_bounds(cs)
        glob = np.broadcast_to(np.arange(nc), (L, nc))
        entered = simulate(cs, glob)
        per_ray = entered.sum(1)
        order = np.argsort(key, kind="stable") if key is not None else \
            np.arange(L)
        ent = entered[order]
        line = {"config": tag, "chunk_size": cs, "n_chunks": nc,
                "per_ray_entered": round(float(per_ray.mean()), 1),
                "per_ray_tests": round(float(per_ray.mean()) * cs, 0)}
        for gsz in (32, 128, 512, 1024, 4096):
            unions = [ent[i:i + gsz].any(0).sum()
                      for i in range(0, L - gsz + 1, gsz)]
            line[f"tests_u{gsz}"] = round(float(np.mean(unions)) * cs, 0)
        print(json.dumps(line), flush=True)

    report("home/cs32", 32, None)
    report("chunkxoct/cs32", 32, oc32 * 8 + octant)
    report("chunkxcone/cs32", 32, oc32 * 26 + cone)
    report("home/cs8", 8, None)
    report("chunkxoct/cs8", 8, oc32 * 8 + octant)
    report("chunkxcone/cs8", 8, oc32 * 26 + cone)
    # transposed-sweep candidate: 128-sphere pages tested by 32-ray groups
    report("home/cs128", 128, None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
