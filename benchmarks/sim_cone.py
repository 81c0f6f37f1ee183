"""Offline sim: can a CHEAP conservative group cull test replace the
exact any-lane slab test at finer granularity? (round 3)

The kernel's per-chunk cull (megakernel._make_bounce bound_possible) is
an EXACT any-lane slab test over the whole (32,128) tile: ~11 vector ops
on 4 vregs + an any-reduce + a lax.cond (~90 cycles) per chunk. That
cost is why finer cull granularity (per 8-sublane sub-block: subcull)
and branchless lists both measured SLOWER despite sweeping fewer
spheres (docs/PERF.md round 3).

This sim replays the sweep on dumped cut-3 pools with a much cheaper
conservative test evaluated per RAY GROUP:

    group state: live-origin AABB, per-octant presence mask (8 bits),
                 group-max best-t
    chunk test:  reject if the chunk is behind the group for every
                 present octant, or if the Euclidean lower bound on the
                 arrival time (sqrt of summed per-axis gaps; valid since
                 |d| = 1) exceeds group-max best-t.

The test is ~15 vector ops per OCTANT per 128 chunks when chunk AABBs
are laid across lanes — two orders of magnitude cheaper than the exact
test — so it could be affordable per (8,128) row block and per cs8/cs16
chunk. The question is tightness: how many more chunk entries does it
admit than the exact union at the same granularity?

Sequential replay: chunks are visited in the global front-to-back order
(measured equivalent to per-ray ideal, sim_order.py); per-ray best-t
evolves only when the group decider sweeps the chunk, exactly like the
kernel. Reported: swept sphere tests per ray.

    python benchmarks/sim_cone.py /tmp/pool_rtiow_cut3.npz [n_rays]
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
    ns = scx.shape[0]
    rng = np.random.default_rng(0)
    sel = rng.choice(recs.shape[0], size=min(n_sample, recs.shape[0]),
                     replace=False)
    sel.sort()  # home order
    o = recs[sel, 0:3].astype(np.float64)
    dir_ = recs[sel, 3:6].astype(np.float64)
    L = o.shape[0]

    eps = 1.0e-12
    sgn = np.where(dir_ >= 0, 1.0, -1.0)
    invd = 1.0 / (sgn * np.maximum(np.abs(dir_), eps))
    od = (o * dir_).sum(1)
    oo = (o * o).sum(1)
    octant = ((dir_[:, 0] >= 0) * 4 + (dir_[:, 1] >= 0) * 2
              + (dir_[:, 2] >= 0)).astype(np.int64)

    def chunk_bounds(cs):
        nc = ns // cs
        cx = scx[: nc * cs].reshape(nc, cs)
        cy = scy[: nc * cs].reshape(nc, cs)
        cz = scz[: nc * cs].reshape(nc, cs)
        r = np.abs(srad[: nc * cs].reshape(nc, cs))
        lo = np.stack([(cx - r).min(1), (cy - r).min(1), (cz - r).min(1)], 1)
        hi = np.stack([(cx + r).max(1), (cy + r).max(1), (cz + r).max(1)], 1)
        return nc, lo, hi

    # front-to-back chunk order from the camera-ish mean origin (matches
    # the host order the kernel bakes in)
    def f2b_order(lo, hi):
        center = 0.5 * (lo + hi)
        p = o.mean(0)
        return np.argsort(((center - p) ** 2).sum(1), kind="stable")

    def sweep_chunk(cid, cs, gsl, enter_rays, bt):
        ids = cid * cs + np.arange(cs)
        cd = (scx[ids] * dir_[gsl, 0:1] + scy[ids] * dir_[gsl, 1:2]
              + scz[ids] * dir_[gsl, 2:3])
        co = (scx[ids] * o[gsl, 0:1] + scy[ids] * o[gsl, 1:2]
              + scz[ids] * o[gsl, 2:3])
        bq = od[gsl, None] - cd
        cq = oo[gsl, None] - 2.0 * co + kq[ids]
        disc = bq * bq - cq
        sq = np.sqrt(np.maximum(disc, 0.0))
        ts = np.where(-bq - sq > MIN_T, -bq - sq, -bq + sq)
        ts = np.where((disc > 0.0) & (ts > MIN_T), ts, MAX_T).min(1)
        return np.minimum(bt, ts)

    def run(cs, gsz, decider):
        nc, lo, hi = chunk_bounds(cs)
        order = f2b_order(lo, hi)
        total_chunks = 0
        n_groups = 0
        for g0 in range(0, L - gsz + 1, gsz):
            gsl = slice(g0, g0 + gsz)
            bt = np.full(gsz, MAX_T)
            og = o[gsl]
            olo, ohi = og.min(0), og.max(0)
            present = np.zeros(8, bool)
            present[np.unique(octant[gsl])] = True
            n_groups += 1
            for cid in order:
                if decider == "exact":
                    t0 = (lo[cid] - og) * invd[gsl]
                    t1 = (hi[cid] - og) * invd[gsl]
                    tnear = np.minimum(t0, t1).max(1)
                    tfar = np.maximum(t0, t1).min(1)
                    enter = ((tfar >= tnear) & (tfar > MIN_T)
                             & (tnear < bt)).any()
                else:  # cone
                    btm = bt.max()
                    enter = False
                    for oc in range(8):
                        if not present[oc]:
                            continue
                        s = np.array([1 if oc & 4 else -1,
                                      1 if oc & 2 else -1,
                                      1 if oc & 1 else -1], float)
                        # per-axis: chunk entirely behind the box for
                        # this octant?
                        behind = np.where(s > 0, hi[cid] < olo,
                                          lo[cid] > ohi).any()
                        if behind:
                            continue
                        gap = np.where(s > 0,
                                       np.maximum(lo[cid] - ohi, 0.0),
                                       np.maximum(olo - hi[cid], 0.0))
                        if np.sqrt((gap * gap).sum()) < btm:
                            enter = True
                            break
                if enter:
                    bt = sweep_chunk(cid, cs, gsl, None, bt)
                    total_chunks += 1
        tests_per_ray = total_chunks * cs / n_groups
        return tests_per_ray

    out = {"pool": path, "rays": L}
    for cs in (32, 16, 8):
        for gsz in (4096, 1024, 256):
            for decider in ("exact", "cone"):
                key = f"{decider}/cs{cs}/g{gsz}"
                out[key] = round(run(cs, gsz, decider), 0)
                print(json.dumps({key: out[key]}), flush=True)
    print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
