"""Probe: can the closest-hit sweep ride the MXU?

The tile-uniform sweep is VPU-bound at ~23 ops per (sphere, ray) pair
(megakernel.sphere_ts). Its two dot products (c.d and c.o) are matmuls in
disguise: with rays COMP-MAJOR (components along sublanes, rays along
lanes), one in-kernel jnp.dot of A [2S, 8] x B [8, R] yields cd and -2co
for every (sphere, ray) pair at MXU rates, leaving ~14 VPU ops on an
[S, R] matrix plus a 5-step sublane roll-argmin — ~10x less VPU work per
chunk. Blockers this probe measures on chip:

  P1  in-kernel jnp.reshape (32,128) <-> (1,4096): does Mosaic lower it?
      (round-2 notes say cross-lane relayout casts fail; re-probe.)
  P2  jnp.concatenate of (1,4096) rows -> (6,4096): lowers?
  P3  dot correctness: A[64,8] @ B[8,4096] precision=highest vs numpy
      f32 FMA-order reference (max ulp delta) and bf16-default error.
  P4  elementwise throughput on (1,4096) vs (8,512) vs (32,128): is the
      (1,N) layout sublane-sparse (8x waste) or packed?
  P5  end-to-end sweep microbench: per-sphere broadcast sweep (today's
      form) vs MXU dot + [S,R] t-matrix + sublane roll-argmin, identical
      geometry, timed over many iterations.
  P6  XLA-level (R,16,128) -> (16, R*128) transpose cost (the dual-view
      pool bridge that avoids every in-kernel cast).

Run on the TPU:  python benchmarks/probe_mxu_sweep.py [p1 p2 ...]
"""
from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = bool(int(os.environ.get("WRT_INTERPRET", "0")))
if INTERPRET:
    jax.config.update("jax_platforms", "cpu")
_call = functools.partial(pl.pallas_call, interpret=INTERPRET)

MAX_T = 3.0e38
MIN_T = 1.0e-3


def timed(fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]  # force
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
    return (time.perf_counter() - t0) / iters, out


# ---------------------------------------------------------------- P1/P2

def p1():
    def kernel(x_ref, o_ref):
        flat = x_ref[...].reshape(1, 4096)
        y = flat * 2.0 + 1.0
        o_ref[...] = y.reshape(32, 128)

    x = jnp.arange(4096, dtype=jnp.float32).reshape(32, 128)
    try:
        out = _call(
            kernel, out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32)
        )(x)
        ok = np.allclose(np.asarray(out), np.asarray(x) * 2 + 1)
        print("P1 reshape (32,128)<->(1,4096): LOWERS, correct =", ok)
    except Exception as e:  # noqa: BLE001
        print("P1 reshape: FAILS —", str(e).split("\n")[0][:200])


def p2():
    def kernel(a_ref, o_ref):
        rows = [a_ref[i : i + 1, :] for i in range(6)]
        cat = jnp.concatenate(rows[::-1], axis=0)  # reversed: visible op
        o_ref[...] = cat

    a = jnp.arange(6 * 4096, dtype=jnp.float32).reshape(6, 4096)
    try:
        out = _call(
            kernel, out_shape=jax.ShapeDtypeStruct((6, 4096), jnp.float32)
        )(a)
        ok = np.array_equal(np.asarray(out), np.asarray(a)[::-1])
        print("P2 concat (1,4096)x6 -> (6,4096): LOWERS, correct =", ok)
    except Exception as e:  # noqa: BLE001
        print("P2 concat: FAILS —", str(e).split("\n")[0][:200])


# ------------------------------------------------------------------ P3

def p3():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 8)).astype(np.float32)
    a[:, 6:] = 0.0
    b = rng.standard_normal((8, 4096)).astype(np.float32) * 3.0

    def kernel(prec):
        def k(a_ref, b_ref, o_ref):
            o_ref[...] = jnp.dot(a_ref[...], b_ref[...], precision=prec)

        return _call(
            k, out_shape=jax.ShapeDtypeStruct((64, 4096), jnp.float32)
        )

    # FMA-order f32 reference (the sweep's summation order: x, then +y, +z)
    ref = np.zeros((64, 4096), np.float32)
    for kk in range(8):
        ref += a[:, kk : kk + 1] * b[kk : kk + 1, :]
    for prec in ("highest", None):
        try:
            out = np.asarray(kernel(prec)(jnp.asarray(a), jnp.asarray(b)))
            rel = np.abs(out - ref) / np.maximum(np.abs(ref), 1e-6)
            bit = np.array_equal(out, ref)
            print(f"P3 dot precision={prec}: max rel err {rel.max():.2e}, "
                  f"bit-identical to FMA order: {bit}")
        except Exception as e:  # noqa: BLE001
            print(f"P3 dot precision={prec}: FAILS —",
                  str(e).split("\n")[0][:200])


# ------------------------------------------------------------------ P4

def p4():
    for shape in ((32, 128), (8, 512), (1, 4096), (4, 4096), (32, 4096)):
        def kernel(x_ref, o_ref):
            v = x_ref[...]
            acc = v
            for _ in range(256):
                acc = acc * v + 1.0e-7
            o_ref[...] = acc

        x = jnp.full(shape, 0.999999, jnp.float32)
        call = jax.jit(_call(
            kernel, out_shape=jax.ShapeDtypeStruct(shape, jnp.float32)
        ))
        try:
            dt, _ = timed(call, x, iters=100)
            per = dt / (256 * 2 * np.prod(shape))
            print(f"P4 {shape}: {dt*1e6:8.1f} us/call, "
                  f"{1.0/per/1e12:6.2f} Tops/s")
        except Exception as e:  # noqa: BLE001
            print(f"P4 {shape}: FAILS —", str(e).split("\n")[0][:160])


# ------------------------------------------------------------------ P5

def _scene(n_spheres, n_rays, seed=0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-8, 8, (n_spheres, 3)).astype(np.float32)
    r = rng.uniform(0.2, 1.0, n_spheres).astype(np.float32)
    o = rng.uniform(-1, 1, (3, n_rays)).astype(np.float32)
    d = rng.standard_normal((3, n_rays)).astype(np.float32)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    return c, r, o, d


def _vpu_sweep_kernel(n_spheres, iters):
    """Today's form: per-sphere scalar broadcast over (32,128) planes."""

    def kernel(scx, scy, scz, skq, ox, oy, oz, dx, dy, dz, t_out, i_out):
        f32 = jnp.float32
        oxv, oyv, ozv = ox[...], oy[...], oz[...]
        dxv, dyv, dzv = dx[...], dy[...], dz[...]
        od = oxv * dxv + oyv * dyv + ozv * dzv
        oo = oxv * oxv + oyv * oyv + ozv * ozv

        def body(it, carry):
            bt, bi = carry
            # anti-hoist: the iteration index rides the direction at zero
            # weight (XLA/Mosaic do not fold x + 0*i, unsafe for FP)
            dxj = dxv + it.astype(f32) * 0.0
            items = []
            for s in range(n_spheres):
                cx, cy, cz, kq = scx[0, s], scy[0, s], scz[0, s], skq[0, s]
                cd = cx * dxj + cy * dyv + cz * dzv
                co2 = (cx + cx) * oxv + (cy + cy) * oyv + (cz + cz) * ozv
                b = cd - od
                cq = oo - co2 + kq
                sq = jnp.sqrt(b * b - cq)
                t0 = b - sq
                t1 = b + sq
                ts = jnp.where(t0 > MIN_T, t0, t1)
                valid = (sq > 0.0) & (ts > MIN_T)
                items.append((jnp.where(valid, ts, MAX_T),
                              jnp.full_like(ts, float(s))))
            while len(items) > 1:
                merged = []
                for k in range(0, len(items) - 1, 2):
                    (ta, ia), (tb, ib) = items[k], items[k + 1]
                    take = tb < ta
                    merged.append((jnp.where(take, tb, ta),
                                   jnp.where(take, ib, ia)))
                if len(items) % 2:
                    merged.append(items[-1])
                items = merged
            ta, ia = items[0]
            take = ta < bt
            return (jnp.where(take, ta, bt), jnp.where(take, ia, bi))

        bt = jnp.full((32, 128), MAX_T, f32)
        bi = jnp.full((32, 128), -1.0, f32)
        bt, bi = jax.lax.fori_loop(0, iters, body, (bt, bi))
        t_out[...], i_out[...] = bt, bi

    return kernel


def _mxu_sweep_kernel(n_spheres, iters, precision):
    """MXU form: one dot yields cd/-2co for all (sphere, ray) pairs;
    t-matrix on [S, R]; 5-step sublane roll argmin."""
    assert n_spheres == 32

    def kernel(amat, bmat, t_out, i_out):
        f32 = jnp.float32
        # (8, 4096): rows 0-2 d, 3-5 o, 6 ones (carries kq), 7 zero
        b_all = bmat[...]
        dxv, dyv, dzv = b_all[0:1], b_all[1:2], b_all[2:3]
        oxv, oyv, ozv = b_all[3:4], b_all[4:5], b_all[5:6]
        od = dxv * oxv + dyv * oyv + dzv * ozv  # (1, 4096)
        oo = oxv * oxv + oyv * oyv + ozv * ozv
        # (64, 8): rows 0-31 C (vs d), rows 32-63 [-2C | kq] (vs o | 1)
        a = amat[...]

        def body(it, carry):
            bt, bi = carry
            aj = a + it.astype(f32) * 0.0  # anti-hoist (see VPU form)
            out = jax.lax.dot_general(
                aj, b_all, (((1,), (0,)), ((), ())), precision=precision
            )  # (64, 4096)
            cd = out[0:32]
            m2co_kq = out[32:64]  # -2 c.o + kq, fused into the dot
            b = cd - od  # (32,4096) via sublane broadcast of (1,4096)
            cq = oo + m2co_kq
            sq = jnp.sqrt(b * b - cq)
            t0 = b - sq
            t1 = b + sq
            ts = jnp.where(t0 > MIN_T, t0, t1)
            valid = (sq > 0.0) & (ts > MIN_T)
            ts = jnp.where(valid, ts, MAX_T)
            idx = jax.lax.broadcasted_iota(jnp.int32, (32, 4096), 0).astype(f32)
            for sh in (16, 8, 4, 2, 1):
                rt = pltpu.roll(ts, sh, 0)
                ri = pltpu.roll(idx, sh, 0)
                take = rt < ts
                ts = jnp.where(take, rt, ts)
                idx = jnp.where(take, ri, idx)
            take = ts < bt
            return (jnp.where(take, ts, bt), jnp.where(take, idx, bi))

        bt = jnp.full((32, 4096), MAX_T, f32)
        bi = jnp.full((32, 4096), -1.0, f32)
        bt, bi = jax.lax.fori_loop(0, iters, body, (bt, bi))
        t_out[...], i_out[...] = bt, bi

    return kernel


def p5(precision="highest"):
    n_spheres, n_rays, iters = 32, 4096, 64
    c, r, o, d = _scene(n_spheres, n_rays)
    kq = (c * c).sum(1) - r * r

    # --- VPU form
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    vpu = _call(
        _vpu_sweep_kernel(n_spheres, iters),
        in_specs=[smem(), smem(), smem(), smem()] + [vmem()] * 6,
        out_specs=[vmem()] * 2,
        out_shape=[jax.ShapeDtypeStruct((32, 128), jnp.float32)] * 2,
    )
    planes = [jnp.asarray(v.reshape(32, 128)) for v in (*o, *d)]
    args = ([jnp.asarray(v.reshape(1, -1)) for v in
             (c[:, 0], c[:, 1], c[:, 2], kq)] + planes)
    dt_v, (tv, iv) = timed(jax.jit(lambda *a: vpu(*a)), *args, iters=30)

    # --- MXU form
    amat = np.zeros((64, 8), np.float32)
    amat[0:32, 0:3] = c
    amat[32:64, 3:6] = -2.0 * c
    amat[32:64, 6] = kq
    bmat = np.zeros((8, 4096), np.float32)
    bmat[0:3] = d
    bmat[3:6] = o
    bmat[6] = 1.0
    mxu = _call(
        _mxu_sweep_kernel(n_spheres, iters, precision),
        out_shape=[jax.ShapeDtypeStruct((32, 4096), jnp.float32)] * 2,
    )
    try:
        dt_m, (tm, im) = timed(
            jax.jit(lambda *a: mxu(*a)),
            jnp.asarray(amat), jnp.asarray(bmat), iters=30)
    except Exception as e:  # noqa: BLE001
        print("P5 MXU form: FAILS —", str(e).split("\n")[0][:300])
        return

    tv_f = np.asarray(tv).reshape(-1)
    tm_f = np.asarray(tm)[0, :]
    im_f = np.asarray(im)[0, :]
    iv_f = np.asarray(iv).reshape(-1)
    agree = np.mean(np.isclose(tv_f, tm_f, rtol=1e-5, atol=1e-5))
    bit = np.array_equal(tv_f, tm_f)
    idx_agree = np.mean((iv_f == im_f) | ~np.isfinite(tv_f))
    sw = n_spheres * n_rays * iters
    print(f"P5 precision={precision}:")
    print(f"   VPU sweep: {dt_v*1e6:9.1f} us  "
          f"({sw/dt_v/1e9:7.2f} Gtest/s)")
    print(f"   MXU sweep: {dt_m*1e6:9.1f} us  "
          f"({sw/dt_m/1e9:7.2f} Gtest/s)  speedup x{dt_v/dt_m:.2f}")
    print(f"   t agree(1e-5): {agree:.4f}  bit-identical: {bit}  "
          f"idx agree: {idx_agree:.4f}")


def _rowdot_sweep_kernel(n_spheres, iters, precision):
    """Integration-friendly MXU form: rays stay in today's (32,128)
    plane layout; per pool row r, B_r = sublane-concat of the six
    (1,128) component rows (+ ones row for kq), one (64,8)x(8,128) dot
    per row per chunk, sublane roll-argmin, rows reassembled by concat.
    No layout change anywhere — a drop-in sweep replacement."""
    assert n_spheres == 32

    def kernel(amat, ox, oy, oz, dx, dy, dz, t_out, i_out):
        f32 = jnp.float32
        oxv, oyv, ozv = ox[...], oy[...], oz[...]
        dxv, dyv, dzv = dx[...], dy[...], dz[...]
        od = oxv * dxv + oyv * dyv + ozv * dzv
        oo = oxv * oxv + oyv * oyv + ozv * ozv
        a = amat[...]  # (64, 8)
        ones = jnp.ones((1, 128), f32)
        zeros = jnp.zeros((1, 128), f32)

        def body(it, carry):
            bt, bi = carry
            aj = a + it.astype(f32) * 0.0  # anti-hoist
            out_rows_t = []
            out_rows_i = []
            for r in range(32):
                b_r = jnp.concatenate(
                    [dxv[r:r + 1], dyv[r:r + 1], dzv[r:r + 1],
                     oxv[r:r + 1], oyv[r:r + 1], ozv[r:r + 1],
                     ones, zeros], axis=0)  # (8, 128)
                out = jax.lax.dot_general(
                    aj, b_r, (((1,), (0,)), ((), ())), precision=precision
                )  # (64, 128)
                cd = out[0:32]
                m2co_kq = out[32:64]
                b = cd - od[r:r + 1]
                cq = oo[r:r + 1] + m2co_kq
                sq = jnp.sqrt(b * b - cq)
                t0 = b - sq
                t1 = b + sq
                ts = jnp.where(t0 > MIN_T, t0, t1)
                valid = (sq > 0.0) & (ts > MIN_T)
                ts = jnp.where(valid, ts, MAX_T)
                idx = jax.lax.broadcasted_iota(jnp.int32, (32, 128), 0).astype(f32)
                for sh in (16, 8, 4, 2, 1):
                    rt = pltpu.roll(ts, sh, 0)
                    ri = pltpu.roll(idx, sh, 0)
                    take = rt < ts
                    ts = jnp.where(take, rt, ts)
                    idx = jnp.where(take, ri, idx)
                out_rows_t.append(ts[0:1])
                out_rows_i.append(idx[0:1])
            ta = jnp.concatenate(out_rows_t, axis=0)  # (32, 128)
            ia = jnp.concatenate(out_rows_i, axis=0)
            take = ta < bt
            return (jnp.where(take, ta, bt), jnp.where(take, ia, bi))

        bt = jnp.full((32, 128), MAX_T, f32)
        bi = jnp.full((32, 128), -1.0, f32)
        bt, bi = jax.lax.fori_loop(0, iters, body, (bt, bi))
        t_out[...], i_out[...] = bt, bi

    return kernel


def p7(precision="highest"):
    n_spheres, n_rays, iters = 32, 4096, 64
    c, r, o, d = _scene(n_spheres, n_rays)
    kq = (c * c).sum(1) - r * r
    amat = np.zeros((64, 8), np.float32)
    amat[0:32, 0:3] = c
    amat[32:64, 3:6] = -2.0 * c
    amat[32:64, 6] = kq
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    rowdot = _call(
        _rowdot_sweep_kernel(n_spheres, iters, precision),
        in_specs=[vmem()] * 7,
        out_specs=[vmem()] * 2,
        out_shape=[jax.ShapeDtypeStruct((32, 128), jnp.float32)] * 2,
    )
    planes = [jnp.asarray(v.reshape(32, 128)) for v in (*o, *d)]
    try:
        dt, (tr_, ir_) = timed(
            jax.jit(lambda *a: rowdot(*a)), jnp.asarray(amat), *planes,
            iters=30)
    except Exception as e:  # noqa: BLE001
        print("P7 rowdot form: FAILS —", str(e).split("\n")[0][:300])
        return
    # reference: numpy closest-hit
    cd = c @ d
    co = c @ o
    od = (o * d).sum(0)
    oo = (o * o).sum(0)
    b = cd - od[None]
    cq = oo[None] - 2 * co + kq[:, None]
    disc = b * b - cq
    sq = np.sqrt(np.maximum(disc, 0))
    t0 = b - sq
    t1 = b + sq
    ts = np.where(t0 > MIN_T, t0, t1)
    valid = (disc > 0) & (ts > MIN_T)
    ts_all = np.where(valid, ts, MAX_T)
    ref_t = ts_all.min(0)
    got_t = np.asarray(tr_).reshape(-1)
    agree = np.mean(np.isclose(ref_t, got_t, rtol=1e-4, atol=1e-4))
    sw = n_spheres * n_rays * iters
    print(f"P7 rowdot precision={precision}: {dt*1e6:9.1f} us "
          f"({sw/dt/1e9:7.2f} Gtest/s)  t agree(1e-4): {agree:.4f}")


def _chunked_vpu_kernel(n_chunks, cs, iters):
    """Chunked VPU sweep: fori over chunks with dynamic SMEM scalar
    reads — the shape of the real culled sweep (no cull conds here)."""

    def kernel(scx, scy, scz, skq, ox, oy, oz, dx, dy, dz, t_out, i_out):
        f32 = jnp.float32
        oxv, oyv, ozv = ox[...], oy[...], oz[...]
        dxv, dyv, dzv = dx[...], dy[...], dz[...]
        od = oxv * dxv + oyv * dyv + ozv * dzv
        oo = oxv * oxv + oyv * oyv + ozv * ozv

        def chunk_body(c, carry, dxj):
            bt, bi = carry
            items = []
            for j in range(cs):
                s = c * cs + j
                cx, cy, cz, kq = scx[0, s], scy[0, s], scz[0, s], skq[0, s]
                cd = cx * dxj + cy * dyv + cz * dzv
                co2 = (cx + cx) * oxv + (cy + cy) * oyv + (cz + cz) * ozv
                b = cd - od
                cq = oo - co2 + kq
                sq = jnp.sqrt(b * b - cq)
                t0 = b - sq
                t1 = b + sq
                ts = jnp.where(t0 > MIN_T, t0, t1)
                valid = (sq > 0.0) & (ts > MIN_T)
                items.append((jnp.where(valid, ts, MAX_T),
                              jnp.full_like(ts, float(j)) + c.astype(f32)
                              * float(cs)))
            while len(items) > 1:
                merged = []
                for k in range(0, len(items) - 1, 2):
                    (ta, ia), (tb, ib) = items[k], items[k + 1]
                    take = tb < ta
                    merged.append((jnp.minimum(ta, tb),
                                   jnp.where(take, ib, ia)))
                if len(items) % 2:
                    merged.append(items[-1])
                items = merged
            ta, ia = items[0]
            take = ta < bt
            return (jnp.where(take, ta, bt), jnp.where(take, ia, bi))

        def body(it, carry):
            dxj = dxv + it.astype(f32) * 0.0
            return jax.lax.fori_loop(
                0, n_chunks, lambda c, cr: chunk_body(c, cr, dxj), carry)

        bt = jnp.full((32, 128), MAX_T, f32)
        bi = jnp.full((32, 128), -1.0, f32)
        bt, bi = jax.lax.fori_loop(0, iters, body, (bt, bi))
        t_out[...], i_out[...] = bt, bi

    return kernel


def _chunked_mxu_kernel(n_chunks, cs, iters, precision):
    """Integration-exact MXU sweep: amats (n_chunks, 8, 2cs) VMEM input,
    dynamic chunk indexing, per-row dot_general(A_T, B_r) contracting
    sublanes, sublane-half tree argmin, rows reassembled by concat."""

    def kernel(amats, ox, oy, oz, dx, dy, dz, t_out, i_out):
        f32 = jnp.float32
        oxv, oyv, ozv = ox[...], oy[...], oz[...]
        dxv, dyv, dzv = dx[...], dy[...], dz[...]
        od = oxv * dxv + oyv * dyv + ozv * dzv
        oo = oxv * oxv + oyv * oyv + ozv * ozv
        ones = jnp.ones((1, 128), f32)
        zeros = jnp.zeros((1, 128), f32)
        brows = [
            jnp.concatenate(
                [dxv[r:r + 1], dyv[r:r + 1], dzv[r:r + 1],
                 oxv[r:r + 1], oyv[r:r + 1], ozv[r:r + 1],
                 ones, zeros], axis=0)
            for r in range(32)
        ]

        def chunk_body(c, carry, anti):
            bt, bi = carry
            a_t = amats[c] + anti  # (8, 2cs) dynamic chunk slice
            rows_t, rows_i = [], []
            for r in range(32):
                out = jax.lax.dot_general(
                    a_t, brows[r], (((0,), (0,)), ((), ())),
                    precision=precision)  # (2cs, 128)
                b = out[0:cs] - od[r:r + 1]
                cq = oo[r:r + 1] + out[cs:2 * cs]
                sq = jnp.sqrt(b * b - cq)
                t0 = b - sq
                t1 = b + sq
                ts = jnp.where(t0 > MIN_T, t0, t1)
                valid = (sq > 0.0) & (ts > MIN_T)
                ts = jnp.where(valid, ts, MAX_T)  # (cs, 128)
                idx = jax.lax.broadcasted_iota(jnp.int32, (cs, 128), 0).astype(f32)
                h = cs
                while h > 1:
                    h //= 2
                    lo_t, hi_t = ts[0:h], ts[h:2 * h]
                    lo_i, hi_i = idx[0:h], idx[h:2 * h]
                    take = hi_t < lo_t
                    ts = jnp.minimum(lo_t, hi_t)
                    idx = jnp.where(take, hi_i, lo_i)
                rows_t.append(ts)
                rows_i.append(idx + c.astype(f32) * float(cs))
            ta = jnp.concatenate(rows_t, axis=0)  # (32, 128)
            ia = jnp.concatenate(rows_i, axis=0)
            take = ta < bt
            return (jnp.where(take, ta, bt), jnp.where(take, ia, bi))

        def body(it, carry):
            anti = it.astype(f32) * 0.0
            return jax.lax.fori_loop(
                0, n_chunks, lambda c, cr: chunk_body(c, cr, anti), carry)

        bt = jnp.full((32, 128), MAX_T, f32)
        bi = jnp.full((32, 128), -1.0, f32)
        bt, bi = jax.lax.fori_loop(0, iters, body, (bt, bi))
        t_out[...], i_out[...] = bt, bi

    return kernel


def p8(precision="highest", n_chunks=10, cs=32):
    n_rays, iters = 4096, 16
    n_spheres = n_chunks * cs
    c, r, o, d = _scene(n_spheres, n_rays)
    kq = (c * c).sum(1) - r * r
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    vmem = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)  # noqa: E731
    planes = [jnp.asarray(v.reshape(32, 128)) for v in (*o, *d)]

    vpu = _call(
        _chunked_vpu_kernel(n_chunks, cs, iters),
        in_specs=[smem()] * 4 + [vmem()] * 6,
        out_specs=[vmem()] * 2,
        out_shape=[jax.ShapeDtypeStruct((32, 128), jnp.float32)] * 2,
    )
    args = [jnp.asarray(v.reshape(1, -1)) for v in
            (c[:, 0], c[:, 1], c[:, 2], kq)] + planes
    dt_v, (tv, iv) = timed(jax.jit(lambda *a: vpu(*a)), *args, iters=20)

    amats = np.zeros((n_chunks, 8, 2 * cs), np.float32)
    for ci in range(n_chunks):
        blk = c[ci * cs:(ci + 1) * cs]
        amats[ci, 0:3, 0:cs] = blk.T
        amats[ci, 3:6, cs:2 * cs] = -2.0 * blk.T
        amats[ci, 6, cs:2 * cs] = kq[ci * cs:(ci + 1) * cs]
    mxu = _call(
        _chunked_mxu_kernel(n_chunks, cs, iters, precision),
        in_specs=[vmem()] * 7,
        out_specs=[vmem()] * 2,
        out_shape=[jax.ShapeDtypeStruct((32, 128), jnp.float32)] * 2,
    )
    try:
        dt_m, (tm, im) = timed(
            jax.jit(lambda *a: mxu(*a)), jnp.asarray(amats), *planes,
            iters=20)
    except Exception as e:  # noqa: BLE001
        print(f"P8 MXU chunked (cs={cs}): FAILS —",
              str(e).split("\n")[0][:300])
        return
    tvf, tmf = np.asarray(tv).ravel(), np.asarray(tm).ravel()
    ivf, imf = np.asarray(iv).ravel(), np.asarray(im).ravel()
    agree = np.mean(np.isclose(tvf, tmf, rtol=1e-4, atol=1e-4))
    idx_agree = np.mean((ivf == imf) | (tvf >= MAX_T))
    sw = n_spheres * n_rays * iters
    print(f"P8 cs={cs} x {n_chunks} chunks, precision={precision}:")
    print(f"   VPU: {dt_v*1e6:9.1f} us ({sw/dt_v/1e9:7.2f} Gtest/s)")
    print(f"   MXU: {dt_m*1e6:9.1f} us ({sw/dt_m/1e9:7.2f} Gtest/s)  "
          f"speedup x{dt_v/dt_m:.2f}")
    print(f"   t agree(1e-4): {agree:.4f}  idx agree: {idx_agree:.4f}")


# ------------------------------------------------------------------ P6

def p6():
    for rows in (4096, 16384):
        x = jnp.zeros((rows, 16, 128), jnp.float32)

        @jax.jit
        def t1(x):
            return x.transpose(1, 0, 2).reshape(16, -1)

        @jax.jit
        def t2(y):
            return y.reshape(16, -1, 128).transpose(1, 0, 2)

        dt_a, y = timed(t1, x, iters=20)
        dt_b, _ = timed(t2, y, iters=20)
        mb = x.size * 4 / 1e6
        print(f"P6 pool transpose {rows} rows ({mb:.0f} MB): "
              f"to comp-major {dt_a*1e3:.2f} ms, back {dt_b*1e3:.2f} ms "
              f"({mb/1e3/dt_a:.0f} GB/s)")


ALL = {"p1": p1, "p2": p2, "p3": p3, "p4": p4, "p5": p5,
       "p5bf16": functools.partial(p5, precision=None), "p6": p6,
       "p7": p7, "p7bf16": functools.partial(p7, precision=None),
       "p8": p8, "p8bf16": functools.partial(p8, precision=None),
       "p8c16": functools.partial(p8, cs=16, n_chunks=20)}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print("device:", jax.devices()[0])
    for n in names:
        ALL[n]()
