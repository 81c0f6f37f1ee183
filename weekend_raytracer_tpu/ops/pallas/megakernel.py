"""Fused Pallas TPU megakernel: the whole path trace in one kernel launch.

This is the TPU-native equivalent of the reference's WGSL fragment shader
(src/raytracer/raytracer.wgsl:50-172) — the one "device kernel" component of
SURVEY.md §2 — re-architected for the VPU instead of a SIMT rasterizer:

 - grid over pixel tiles; each program owns a (TSUB, 128) lane block of
   pixels with all per-ray state (origin/direction/throughput/color SoA
   component registers) resident in vector registers/VMEM;
 - sphere attributes live in SMEM and stream through a fori_loop
   closest-hit sweep carrying only (best_t, best_idx); the winner's
   attributes are then fetched with per-lane gathers along lanes over an
   attr-major VMEM LUT (the reference's storage-buffer indexing,
   raytracer.wgsl:358-362 — rebuilt on the one random-access primitive
   Mosaic supports, walking just the winners' [min,max] row span);
 - the bounce loop is a while_loop with a whole-tile liveness early-exit
   (the reference's per-thread `break` on miss, wgsl:167, becomes a
   per-tile exit — profitable because paths in a tile terminate together);
 - RNG is the same jenkins+PCG u32 recurrence as ops/rng.py with
   independent per-(pixel, sample) seeds (rng.init_sample_state), so a
   path's draws depend only on its own bounce index: live-ray draws are
   bit-identical across this kernel, the XLA scan, the wavefront pool,
   and the NumPy oracle at any spp. (Images still differ from the XLA
   path at last-ulp silhouettes — the intersection arithmetic is
   reassociated — so cross-backend gates stay statistical.);
 - materials are evaluated branchlessly and one-hot selected (the WGSL
   `switch`, wgsl:174-202).

Texture support: solid albedos are prefolded from the material table
(including both checkerboard colors); image textures are sampled in-kernel
from a packed-RGB8 LUT pool via per-lane gathers along lanes, mipped to
<=8192 texels per texture (build_kernel_texture_pool; the wgsl
textureLookup capability at raytracer.wgsl:377-387). The XLA wavefront
path remains the full-resolution reference.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import materials as _mat
from ...models.camera import CameraBasis
from ...models.sky import SkyState
from ..intersect import MAX_T, MIN_T
from ..tracer import Scene

EPS = 1.0e-3
N_PRIORS = 4  # largest-|radius| spheres pre-swept to seed best-t
PI = 3.14159265358979
FRAC_1_PI = 1.0 / PI
TWO_PI = 2.0 * PI

# Material model ids and the error color, derived from the single source
# of truth so a renumbering can't silently desynchronize the kernel.
_LAMBERTIAN = float(_mat.LAMBERTIAN)
_METAL = float(_mat.METAL)
_DIELECTRIC = float(_mat.DIELECTRIC)
_CHECKERBOARD = float(_mat.CHECKERBOARD)
_EMISSIVE = float(_mat.EMISSIVE)
_PINK = _mat.ERROR_PINK


HALF_PI = 0.5 * PI


def atan2_approx(y, x):
    """Four-quadrant arctangent (Mosaic has no atan2 lowering).

    Octant reduction + Abramowitz & Stegun 4.4.49 minimax polynomial on
    [0, 1] (|err| <= ~1e-5 rad): ample for texture-coordinate mapping.
    """
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    swap = ay > ax
    num = jnp.minimum(ax, ay)
    den = jnp.maximum(ax, ay)
    z = num / jnp.maximum(den, 1.0e-30)
    z2 = z * z
    r = z * (0.9998660 + z2 * (-0.3302995 + z2 * (
        0.1801410 + z2 * (-0.0851330 + z2 * 0.0208351))))
    r = jnp.where(swap, HALF_PI - r, r)
    r = jnp.where(x < 0.0, PI - r, r)
    return jnp.where(y < 0.0, -r, r)


def acos_approx(x):
    """Polynomial arccos (max err ~7e-5 rad; Mosaic has no acos lowering).

    Abramowitz & Stegun 4.4.45 form on |x| with reflection for x < 0.
    """
    ax = jnp.abs(x)
    p = 1.5707288 + ax * (-0.2121144 + ax * (0.0742610 + ax * (-0.0187293)))
    f = jnp.sqrt(jnp.maximum(0.0, 1.0 - ax)) * p
    return jnp.where(x >= 0.0, f, PI - f)


def _rng_next(state):
    """One PCG step (same integer recurrence as ops/rng.py)."""
    old = state + jnp.uint32(747796405) + jnp.uint32(2891336453)
    shift = (old >> 28) + jnp.uint32(4)
    word = ((old >> shift) ^ old) * jnp.uint32(277803737)
    return (word >> 22) ^ word


def _rng_float(state):
    state = _rng_next(state)
    top = jax.lax.bitcast_convert_type(state >> 8, jnp.int32)
    return state, top.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _jenkins(x):
    x = x + (x << 10)
    x = x ^ (x >> 6)
    x = x + (x << 3)
    x = x ^ (x >> 11)
    x = x + (x << 15)
    return x


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _camera_ray(cam_ref, xf, yf, inv_w, inv_h, state):
    """Jittered thin-lens camera ray for pixel centers (xf, yf): 4 RNG
    draws + basis math (reference cameraMakeRay + disk sampling,
    raytracer.wgsl:105-122, 456-478). Returns (state, o, d) with d unit.

    Shared by the fused megakernel and the wavefront/regroup K0 kernels so
    ray generation is bit-identical across every Pallas entry point.
    """
    ex, ey, ez = cam_ref[0], cam_ref[1], cam_ref[2]
    hx, hy, hz = cam_ref[3], cam_ref[4], cam_ref[5]
    vx, vy, vz = cam_ref[6], cam_ref[7], cam_ref[8]
    ux, uy, uz = cam_ref[9], cam_ref[10], cam_ref[11]
    wx, wy, wz = cam_ref[12], cam_ref[13], cam_ref[14]
    lx, ly, lz = cam_ref[15], cam_ref[16], cam_ref[17]
    lens_r = cam_ref[18]
    state, ju = _rng_float(state)
    state, jv = _rng_float(state)
    state, dr = _rng_float(state)
    state, da = _rng_float(state)
    su = (xf + ju) * inv_w
    sv = 1.0 - (yf + jv) * inv_h
    lr = jnp.sqrt(dr)
    la = TWO_PI * da
    lens_x = lens_r * lr * jnp.cos(la)
    lens_y = lens_r * lr * jnp.sin(la)
    ox = ex + lens_x * ux + lens_y * wx
    oy = ey + lens_x * uy + lens_y * wy
    oz = ez + lens_x * uz + lens_y * wz
    dx = lx + su * hx + sv * vx - ox
    dy = ly + su * hy + sv * vy - oy
    dz = lz + su * hz + sv * vz - oz
    inv_len = jax.lax.rsqrt(
        jnp.maximum(1.0e-24, _dot3(dx, dy, dz, dx, dy, dz))
    )
    return state, ox, oy, oz, dx * inv_len, dy * inv_len, dz * inv_len



def sky_channel(p, idx, cos_theta, gamma, cos_gamma):
    """One channel of the HW-form radiance (raytracer.wgsl:316-343)."""
    p0, p1, p2 = p[idx + 0], p[idx + 1], p[idx + 2]
    p3, p4, p5 = p[idx + 3], p[idx + 4], p[idx + 5]
    p6, p7, p8 = p[idx + 6], p[idx + 7], p[idx + 8]
    exp_m = jnp.exp(p4 * gamma)
    ray_m = cos_gamma * cos_gamma
    mie_base = 1.0 + p8 * p8 - 2.0 * p8 * cos_gamma
    mie = (1.0 + ray_m) / (mie_base * jnp.sqrt(mie_base))
    zen = jnp.sqrt(cos_theta)
    lhs = 1.0 + p0 * jnp.exp(p1 / (cos_theta + 0.01))
    rhs = p2 + p3 * exp_m + p5 * ray_m + p6 * mie + p7 * zen
    return lhs * rhs

def _inc(carry, pos):
    """Increment the scalar stats counter at tuple position ``pos``."""
    lst = list(carry)
    lst[pos] = lst[pos] + jnp.int32(1)
    return tuple(lst)


def build_frustum_lists(basis: CameraBasis, chunk_bounds, tiles_x: int,
                        tiles_y: int, tile_w: int, tile_h: int,
                        width: int, height: int, row_offset=0,
                        full_height: int | None = None):
    """Per-tile primary-ray chunk lists (XLA-side, cheap, fully traced).

    Bounce-0 rays of a screen tile all lie inside the tile's thin-lens
    frustum, which is known before the kernel runs — so the kernel's
    bounce-0 sweep can visit a precomputed chunk list with ZERO in-kernel
    AABB tests (the "lever not pulled" of docs/PERF.md r1). The test is
    conservative, so results are bit-identical: a chunk is dropped only
    when NO tile ray can hit it.

    Geometry: 4 side planes through the eye containing the screen-rect
    edges (jitter-expanded by one pixel) + a near plane along the central
    direction. Aperture makes the beam a spindle (waist at the focus
    plane, re-expanding beyond), handled by relaxing each plane test per
    chunk by lens_r * (1 + D/focus) with D the chunk's farthest-corner
    distance — a bound on any ray's lateral deviation from the pinhole
    frustum at distance D.

    Returns (n_tiles, 1 + NCP) i32: per tile [count, chunk ids..., pad].
    """
    (clox, cloy, cloz, chix, chiy, chiz) = chunk_bounds
    ncp = clox.shape[0]
    eye = basis.eye
    hvec = basis.horizontal
    vvec = basis.vertical
    llc = basis.lower_left_corner
    lens_r = basis.lens_radius

    tx = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32) % tiles_x
    ty = jnp.arange(tiles_x * tiles_y, dtype=jnp.int32) // tiles_x
    # pixel rects (clamped like the kernel's padded lanes) + 1px jitter
    x0 = (tx * tile_w).astype(jnp.float32)
    x1 = jnp.minimum((tx + 1) * tile_w - 1, width - 1).astype(
        jnp.float32) + 1.0
    if full_height is None:
        full_height = height
    roff = jnp.asarray(row_offset).astype(jnp.float32)
    y0 = (ty * tile_h).astype(jnp.float32) + roff
    y1 = (jnp.minimum((ty + 1) * tile_h - 1, height - 1).astype(jnp.float32)
          + 1.0 + roff)
    su0, su1 = x0 / width, x1 / width
    # y grows downward; shard bands live at a global row offset
    sv1, sv0 = 1.0 - y0 / full_height, 1.0 - y1 / full_height

    def rect_pt(su, sv):
        return (llc[None, :] + su[:, None] * hvec[None, :]
                + sv[:, None] * vvec[None, :] - eye[None, :])  # [T, 3]

    c00 = rect_pt(su0, sv0)
    c10 = rect_pt(su1, sv0)
    c11 = rect_pt(su1, sv1)
    c01 = rect_pt(su0, sv1)
    center = rect_pt(0.5 * (su0 + su1), 0.5 * (sv0 + sv1))
    focus = jnp.linalg.norm(center, axis=-1)  # ~focus distance

    def unit(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1.0e-30)

    planes = []
    for a, b in ((c00, c10), (c10, c11), (c11, c01), (c01, c00)):
        n = unit(jnp.cross(a, b))
        # orient inward (toward the rect center)
        flip = jnp.sum(n * center, axis=-1, keepdims=True) < 0.0
        planes.append(jnp.where(flip, -n, n))
    planes.append(unit(center))  # near plane (dirs all forward of it)

    # chunk AABB corners relative to eye: [NCP, 8, 3]
    xs = jnp.stack([clox, chix], -1)  # [NCP, 2]
    ys = jnp.stack([cloy, chiy], -1)
    zs = jnp.stack([cloz, chiz], -1)
    corners = jnp.stack(
        [jnp.stack([xs[:, i], ys[:, j], zs[:, k]], -1)
         for i in (0, 1) for j in (0, 1) for k in (0, 1)], axis=1,
    ) - eye[None, None, :]
    dmax = jnp.max(jnp.linalg.norm(corners, axis=-1), axis=-1)  # [NCP]
    slack = lens_r * (1.0 + dmax[None, :] / focus[:, None])  # [T, NCP]

    # Reach test: no ray registers a hit beyond MAX_T (best-t starts
    # there), and origins stay within lens_r of the eye — chunks whose
    # AABB is entirely farther are unhittable. This also excludes
    # super_bounds' degenerate far-point padding chunks (lo == hi == 1e9),
    # which the plane tests alone can keep when the camera faces them
    # (their slack grows with distance) — keeping one would make the
    # bounce-0 listed sweep read sphere attrs past the array end.
    lo_box = jnp.stack([clox, cloy, cloz], axis=-1)  # [NCP, 3]
    hi_box = jnp.stack([chix, chiy, chiz], axis=-1)
    nearest = jnp.clip(eye[None, :], lo_box, hi_box)
    dmin = jnp.linalg.norm(nearest - eye[None, :], axis=-1)
    reach = (dmin <= MAX_T + lens_r)[None, :]

    keep = jnp.broadcast_to(reach, (tiles_x * tiles_y, ncp)).copy()
    for p in planes:
        # farthest corner along the inward normal: outside if even it
        # is beyond the relaxed plane
        fmax = jnp.max(jnp.einsum("td,ncd->tnc", p, corners), axis=-1)
        keep &= fmax >= -slack
    cnt = keep.sum(axis=1).astype(jnp.int32)
    cidx = jnp.arange(ncp, dtype=jnp.int32)[None, :]
    order = jnp.argsort(
        jnp.where(keep, cidx, cidx + ncp), axis=1).astype(jnp.int32)
    return jnp.concatenate([cnt[:, None], order], axis=1)


def _make_bounce(scene, bounds, supers, sky_ref, *, num_bounces, chunk_size,
                 n_chunks, super_factor, n_super, n_spheres,
                 stats: bool = False, tex_pool_ref=None, frustum_ref=None,
                 frustum_row=None, retr_lut_ref=None, lut_rows: int = 0,
                 export_hit: bool = False, subcull: int = 0,
                 chunk_list_ref=None, list_groups: int = 4,
                 mxu_ref=None, rowsweep_ref=None):
    """Build the (cond, body) pair for the per-bounce physics while_loop.

    One bounce = culled closest-hit sweep + winner-attribute retrieval +
    [image-texture LUT when tex_pool_ref is given] + branchless material
    scatter + sky on miss (raytracer.wgsl:130-169), operating on SoA
    register blocks of any (S, 128) shape. Shared by the fused megakernel
    (ops/pallas/megakernel.py) and the compacted-wavefront kernels
    (ops/pallas/wavefront.py).

    Carry layout (all [S,128] f32 unless noted):
      (i:i32, ox, oy, oz, dx, dy, dz, tr, tg, tb, cr, cg, cb,
       alive_f, state:u32 [, hit_chunk:f32 when export_hit]
       [, live_sum:f32, chunks:i32, supers:i32 when stats])

    export_hit tracks the morton-chunk id of each lane's most recent hit
    (updated on scattering bounces; exact in f32): the ray-binning key of
    the regrouped wavefront's per-ray-group traversal (docs/PERF.md
    round-3 plan).

    subcull > 0 refines the cull hierarchy below the whole-tile chunk
    test: a chunk whose tile-level test passes is swept per (subcull,
    128) row sub-block, each under its own any-lane slab test —
    divergent tiles then pay only for the sub-blocks that can actually
    see the chunk (union(1024) vs union(4096), docs/PERF.md round-3
    sims). Results are bit-identical: a skipped sub-block is one no ray
    of which can hit the chunk within its current best-t.

    mxu_ref (a VMEM (n_chunks, 8, 2*chunk_size) f32 ref of per-chunk
    A-matrices, built by mxu_sweep_amats) switches the culled chunk
    sweeps to the MXU form: per register row r, one
    dot_general(A_c^T, B_r) against B_r = the sublane-stacked
    [d; o; 1; 0] components of that row yields c.d and (-2 c.o + kq)
    for every (sphere, lane) pair at MXU rates; the remaining ~9 VPU
    ops run on the (chunk_size, 128) candidate matrix and a
    sublane-half tree argmin reduces it. NOT bit-identical to the VPU
    sweep (matmul accumulation order differs from the FMA chain), so
    it is an estimator-visible knob: flip it for all fused backends
    together or not at all (statistical equivalence only).

    chunk_list_ref (an SMEM (n_chunks,) i32 scratch) switches the culled
    sweep to the BRANCHLESS LISTED form: every chunk's any-lane slab
    test runs unconditionally (~11 VPU ops), entered ids are appended to
    the list with a branchless cursor (list[cursor] = c; cursor +=
    enter), and one dynamic-trip fori sweeps the list — replacing the
    per-chunk lax.cond whose ~90-cycle overhead dominates big-scene
    culling (docs/PERF.md round 3). Chunks are tested in list_groups
    front-to-back groups so best-t tightened by earlier groups still
    prunes later ones. Results are bit-identical: a chunk the cond form
    skips has tnear >= current best-t for every live ray, so its spheres
    (inside the AABB, hence t >= tnear) can never win the strict-< merge.

    rowsweep_ref (a VMEM (n_groups*128, 128) f32 ref of per-chunk
    attribute rows, built by rowsweep_tab) switches the culled sweep to
    the ROW-GRANULAR TRAVERSAL form (round 5): the cull granularity
    drops from the whole (S, 128) block to a single 128-lane ROW —
    offline replay put the 128-ray union at ~160 tests/segment vs ~480
    for the 4096-ray tile union on RTiOW cs8 (docs/PERF.md round 3
    sims) — while every VPU op stays full-width. Per front-to-back
    chunk group: (1) an unconditional per-lane slab pass builds the
    per-ROW entered mask M[r, c] (lane roll-reduce, no conds);
    (2) a lane cumsum + 7-step rank-select (_lower_bound) turns M into
    "row r's j-th entered chunk"; (3) a dynamic-trip fori runs
    max-over-rows(count) steps, each fetching EVERY row's own chunk
    attributes with one one-hot precision='highest' matmul against the
    group's table slab (exact selection), broadcasting each sphere's
    attrs to all lanes with constant-index gathers, and running the
    standard strict-< sphere_ts merge. Bit-identical to the cond form:
    each row sweeps a SUPERSET of its sequentially-culled entered set
    (masks freeze best-t at group start; exhausted rows re-test a
    clamped chunk) and a subset of the tile union — and any superset
    of the winning set yields the same strict-< first-index-wins
    winner. The -0.0 matmul caveat (see regroup._make_pack_kernel_v2)
    is void here: a -0.0 attribute fetched as +0.0 feeds products and
    sums whose results are identical for +-0.0 inputs (cx*dx with
    dx != 0 keeps its sign from dx; cq sums are unaffected).
    """
    n_fixed = 16 if export_hit else 15
    textures = tex_pool_ref is not None
    if textures:
        (scx, scy, scz, srad, smid, smx,
         sa1r, sa1g, sa1b, sa2r, sa2g, sa2b,
         st1b, st1w, st1h, st2b, st2w, st2h, skq) = scene
    else:
        (scx, scy, scz, srad, smid, smx,
         sa1r, sa1g, sa1b, sa2r, sa2g, sa2b, skq) = scene
    (clox, cloy, cloz, chix, chiy, chiz, priors_ref) = bounds
    (slox, sloy, sloz, shix, shiy, shiz) = supers
    f32 = jnp.float32
    culling = n_chunks > 0
    two_level = n_super > 0
    sunx, suny, sunz = sky_ref[30], sky_ref[31], sky_ref[32]

    def tex_lookup(base, tw, th, u, v, mask, fr, fg, fb):
        """Per-lane image-texture fetch (reference textureLookup,
        wgsl:377-387 + the tex() UV quantization of reference.py:133-139).

        The packed-RGB8 pool lives in VMEM as (rows, 128) i32; each lane
        computes its texel's (row, col) and the loop walks only
        [min_row, max_row] of the lanes that actually need a fetch,
        broadcasting one pool row at a time and gathering along lanes
        (Mosaic supports per-lane gather on the lane dim only). Lanes with
        solid textures (base < 0) keep their prefolded albedo.
        """
        uu = jnp.clip(u, 0.0, 1.0)
        vv = 1.0 - jnp.clip(v, 0.0, 1.0)
        j = jnp.minimum(jnp.floor(uu * tw), tw - 1.0)
        i = jnp.minimum(jnp.floor(vv * th), th - 1.0)
        valid = mask & (base >= 0.0)
        flat = jnp.where(valid, base * 128.0 + i * tw + j, 0.0)
        flat_i = flat.astype(jnp.int32)
        row = flat_i >> 7
        col = flat_i & 127
        big = jnp.int32(1 << 30)
        rlo = jnp.min(jnp.where(valid, row, big))
        rhi = jnp.max(jnp.where(valid, row, -1))

        def body(r, acc):
            # packed values are < 2^24, exactly representable in f32, so
            # the i32 -> f32 convert for the (f32-proven) lane gather is
            # lossless
            vec = jnp.broadcast_to(
                tex_pool_ref[pl.ds(r, 1), :], row.shape
            ).astype(f32)
            g = jnp.take_along_axis(vec, col, axis=1)
            return jnp.where(row == r, g, acc)

        # zero-trip when no lane needs a fetch (rlo > rhi)
        packed_f = jax.lax.fori_loop(
            rlo, rhi + 1, body, jnp.zeros(row.shape, f32))
        packed = packed_f.astype(jnp.int32)
        tr_ = ((packed >> 16) & 255).astype(f32) * f32(1.0 / 255.0)
        tg_ = ((packed >> 8) & 255).astype(f32) * f32(1.0 / 255.0)
        tb_ = (packed & 255).astype(f32) * f32(1.0 / 255.0)
        return (jnp.where(valid, tr_, fr), jnp.where(valid, tg_, fg),
                jnp.where(valid, tb_, fb))

    def sphere_ts(s, carry):
        """Hit parameter for sphere s (MAX_T when invalid); fully
        independent per sphere. The quadratic uses the expanded form
        b = c.d - o.d, c = |o|^2 - 2 o.c + kq with kq = |c|^2 - r^2
        precomputed per sphere: 4 scalar reads, ~23 VPU ops. The 2 o.c
        doubling rides the SCALAR unit (c2 = c + c per component, exact)
        so the VPU skips the 2.0 * co multiply: fl(2c.o_i) = 2 fl(c.o_i)
        and the sum sequence is unchanged, hence cq is bit-identical."""
        (_, _, ox, oy, oz, dx, dy, dz, od, oo) = carry[:10]
        cx, cy, cz, kq = scx[s], scy[s], scz[s], skq[s]
        cd = cx * dx + cy * dy + cz * dz
        co2 = (cx + cx) * ox + (cy + cy) * oy + (cz + cz) * oz
        b = cd - od  # -(o-c).d: roots are b -+ sqrt(disc), no negate
        cq = oo - co2 + kq
        disc = b * b - cq
        # No max(disc, 0): sqrt of a negative gives NaN (or 0/inf on an
        # exotic lowering), and every such value fails the sq > 0 guard
        # below, so misses still resolve to MAX_T. sq > 0 <=> disc > 0
        # exactly (IEEE sqrt is monotone, sqrt(0) = 0), preserving the
        # strict-discriminant semantics of ops/intersect.py bit-for-bit.
        sq = jnp.sqrt(disc)
        t0 = b - sq
        t1 = b + sq
        # prefer the near root; t1 >= t0 so "t0 in range but beyond
        # best while t1 is closer" cannot happen (same semantics as
        # the two-test form in ops/intersect.py)
        ts = jnp.where(t0 > MIN_T, t0, t1)
        valid = (sq > 0.0) & (ts > MIN_T)
        return jnp.where(valid, ts, MAX_T)

    def sweep_span_tree(base, count, carry):
        """Closest hit over spheres [base, base+count): per-sphere ts
        values are independent, so the running min is reassociated as
        a balanced tree — no serial select chain, the VPU runs at
        issue rate instead of select-latency rate. Tie-breaking stays
        first-index-wins (strict < at every merge)."""
        items = []
        for j in range(count):
            s = base + j
            items.append((sphere_ts(s, carry), s.astype(f32)))
        while len(items) > 1:
            merged = []
            for k in range(0, len(items) - 1, 2):
                (ta, ia), (tb, ib) = items[k], items[k + 1]
                take_b = tb < ta
                merged.append((
                    jnp.minimum(ta, tb), jnp.where(take_b, ib, ia)
                ))
            if len(items) % 2:
                merged.append(items[-1])
            items = merged
        tm, im = items[0]
        bt, bidx = carry[0], carry[1]
        better = tm < bt
        return (jnp.where(better, tm, bt), jnp.where(better, im, bidx),
                *carry[2:])

    def bounce_cond(carry):
        i = carry[0]
        alive_f = carry[13]
        # alive mask carried as f32 0/1: Mosaic can't legalize i1
        # vectors in while carries.
        return (i < num_bounces) & (jnp.max(alive_f) > 0.0)

    def bounce_body(carry):
        (i, ox, oy, oz, dx, dy, dz,
         tr, tg, tb, cr, cg, cb, alive_f, state) = carry[:15]
        hit_chunk = carry[15] if export_hit else None
        stat_carry = carry[n_fixed:]  # (live_sum, chunks, supers)
        alive = alive_f > 0.5

        zero = jnp.zeros_like(ox)
        one = jnp.ones_like(ox)
        od = _dot3(ox, oy, oz, dx, dy, dz)
        oo = _dot3(ox, oy, oz, ox, oy, oz)
        init = (jnp.full_like(ox, MAX_T),
                jnp.full_like(ox, -1.0),
                ox, oy, oz, dx, dy, dz, od, oo)
        if stats:
            # trailing scalar counters (chunks entered, supers entered);
            # sweep_span_tree passes carry[2:] through untouched
            init = init + (jnp.int32(0), jnp.int32(0))
        # Robust inverse direction for AABB slab tests (signed epsilon
        # avoids inf*0 NaNs when a component is exactly zero).
        eps_d = jnp.float32(1.0e-12)
        sgn_x = jnp.where(dx >= 0.0, 1.0, -1.0)
        sgn_y = jnp.where(dy >= 0.0, 1.0, -1.0)
        sgn_z = jnp.where(dz >= 0.0, 1.0, -1.0)
        inv_dx = 1.0 / (sgn_x * jnp.maximum(jnp.abs(dx), eps_d))
        inv_dy = 1.0 / (sgn_y * jnp.maximum(jnp.abs(dy), eps_d))
        inv_dz = 1.0 / (sgn_z * jnp.maximum(jnp.abs(dz), eps_d))

        def slab_hit(bt, oxs, oys, ozs, ixs, iys, izs, als,
                     lox_, loy_, loz_, hix_, hiy_, hiz_):
            """Can any live lane of this row span enter the AABB closer
            than its current best-t? Standard slab test with min/max swap
            folded into the signed inverse direction."""
            tx0 = (lox_ - oxs) * ixs
            tx1 = (hix_ - oxs) * ixs
            ty0 = (loy_ - oys) * iys
            ty1 = (hiy_ - oys) * iys
            tz0 = (loz_ - ozs) * izs
            tz1 = (hiz_ - ozs) * izs
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(tx0, tx1), jnp.minimum(ty0, ty1)),
                jnp.minimum(tz0, tz1),
            )
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(tx0, tx1), jnp.maximum(ty0, ty1)),
                jnp.maximum(tz0, tz1),
            )
            return jnp.any(
                als & (tfar >= tnear) & (tfar > MIN_T) & (tnear < bt)
            )

        def bound_possible(bt, lox_, loy_, loz_, hix_, hiy_, hiz_):
            return slab_hit(bt, ox, oy, oz, inv_dx, inv_dy, inv_dz, alive,
                            lox_, loy_, loz_, hix_, hiy_, hiz_)

        S = ox.shape[0]
        use_sub = subcull > 0 and S > subcull and S % subcull == 0
        use_mxu = mxu_ref is not None and culling and not use_sub

        if use_mxu:
            cs = chunk_size
            ones_row = jnp.ones((1, 128), f32)
            zeros_row = jnp.zeros((1, 128), f32)
            # per-row [d; o; 1; 0] component stacks, hoisted per bounce
            brows = [
                jnp.concatenate(
                    [dx[r:r + 1], dy[r:r + 1], dz[r:r + 1],
                     ox[r:r + 1], oy[r:r + 1], oz[r:r + 1],
                     ones_row, zeros_row], axis=0)
                for r in range(S)
            ]

            def sweep_chunk(c, carry):
                bt0, bi0 = carry[0], carry[1]
                od_c, oo_c = carry[8], carry[9]
                a_t = mxu_ref[c]  # (8, 2cs): [C^T | 0] over [0 | -2C^T;kq]
                rows_t, rows_i = [], []
                for r in range(S):
                    out = jax.lax.dot_general(
                        a_t, brows[r], (((0,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST)  # (2cs, 128)
                    b = out[0:cs] - od_c[r:r + 1]
                    cq = oo_c[r:r + 1] + out[cs:2 * cs]
                    sq = jnp.sqrt(b * b - cq)
                    t0 = b - sq
                    t1 = b + sq
                    ts = jnp.where(t0 > MIN_T, t0, t1)
                    ts = jnp.where((sq > 0.0) & (ts > MIN_T), ts, MAX_T)
                    # int iota + convert: Mosaic's tpu.iota rejects f32
                    # results (caught by AOT TPU lowering, round 4)
                    idx = jax.lax.broadcasted_iota(
                        jnp.int32, (cs, 128), 0).astype(f32)
                    h = cs
                    # sublane-half tree argmin; NOTE on exact t ties the
                    # half-tree may keep a different sphere index than the
                    # VPU pairwise merge (acceptable: the knob is only
                    # statistically equivalent anyway)
                    while h > 1:
                        h //= 2
                        take = ts[h:2 * h] < ts[0:h]
                        idx = jnp.where(take, idx[h:2 * h], idx[0:h])
                        ts = jnp.minimum(ts[0:h], ts[h:2 * h])
                    rows_t.append(ts)
                    rows_i.append(idx)
                ta = jnp.concatenate(rows_t, axis=0)  # (S, 128)
                ia = (jnp.concatenate(rows_i, axis=0)
                      + c.astype(f32) * f32(cs))
                better = ta < bt0
                return (jnp.where(better, ta, bt0),
                        jnp.where(better, ia, bi0), *carry[2:])
        else:
            def sweep_chunk(c, carry):
                return sweep_span_tree(c * chunk_size, chunk_size, carry)

        if culling:
            # seed best-t from the largest spheres before any cull test
            for p in range(N_PRIORS):
                sp = priors_ref[p]
                tsp = sphere_ts(sp, init)
                bt0, bi0 = init[0], init[1]
                bet = tsp < bt0
                init = (jnp.where(bet, tsp, bt0),
                        jnp.where(bet, sp.astype(f32), bi0), *init[2:])

        def chunk_body(c, carry):
            def taken(cr):
                if use_sub:
                    # per-sub-block slab tests + sub-block sweeps: only
                    # row spans that can see the chunk pay for it
                    new_bt, new_bi = [], []
                    for k in range(S // subcull):
                        sl = slice(k * subcull, (k + 1) * subcull)
                        sub = tuple(v[sl] for v in cr[:10])
                        sub_pos = slab_hit(
                            sub[0], sub[2], sub[3], sub[4],
                            inv_dx[sl], inv_dy[sl], inv_dz[sl], alive[sl],
                            clox[c], cloy[c], cloz[c],
                            chix[c], chiy[c], chiz[c])
                        sub = jax.lax.cond(
                            sub_pos,
                            lambda sc: sweep_span_tree(
                                c * chunk_size, chunk_size, sc),
                            lambda sc: sc,
                            sub)
                        new_bt.append(sub[0])
                        new_bi.append(sub[1])
                    cr = (jnp.concatenate(new_bt, 0),
                          jnp.concatenate(new_bi, 0)) + cr[2:]
                else:
                    cr = sweep_chunk(c, cr)
                return _inc(cr, -2) if stats else cr

            return jax.lax.cond(
                bound_possible(carry[0], clox[c], cloy[c], cloz[c],
                               chix[c], chiy[c], chiz[c]),
                taken,
                lambda cr: cr,
                carry,
            )

        if rowsweep_ref is not None and culling:
            # Row-granular traversal (see the factory docstring). All
            # primitives are chip-proven: pltpu.roll reductions, the
            # 7-step lane binary search, one-hot precision=highest
            # matmuls, and lane-axis take_along_axis.
            n_groups_r = rowsweep_groups(n_chunks)
            gsz_r = -(-n_chunks // n_groups_r)
            cs_r = chunk_size
            S_r = ox.shape[0]
            lane_r = jax.lax.broadcasted_iota(jnp.int32, (S_r, 128), 1)

            def _lanemax(x):
                # cyclic roll max-reduce: every lane ends with the row max
                for s in (1, 2, 4, 8, 16, 32, 64):
                    x = jnp.maximum(x, pltpu.roll(x, s, 1))
                return x

            def _lanesum_inc(x):
                # inclusive lane cumsum (Hillis-Steele, as regroup's)
                for s in (1, 2, 4, 8, 16, 32, 64):
                    sh = pltpu.roll(x, s, 1)
                    x = x + jnp.where(lane_r >= s, sh, 0.0)
                return x

            def _rank_select(c, target):
                # smallest lane j (per row) with c[row, j] >= target
                lo = jnp.zeros(c.shape, jnp.int32)
                hi = jnp.full(c.shape, c.shape[-1] - 1, jnp.int32)
                for _ in range(7):
                    mid = (lo + hi) >> 1
                    v = jnp.take_along_axis(c, mid, axis=-1)
                    ge = v >= target
                    hi = jnp.where(ge, mid, hi)
                    lo = jnp.where(ge, lo, mid + 1)
                return lo

            def full_sweep(carry0):
                cr = carry0
                for g in range(n_groups_r):
                    c_lo = g * gsz_r
                    c_hi = min((g + 1) * gsz_r, n_chunks)
                    if c_lo >= c_hi:
                        continue
                    cg = c_hi - c_lo
                    bt0 = cr[0]

                    def mask_body(c, m, bt0=bt0, c_lo=c_lo):
                        # per-lane slab test (slab_hit without the
                        # block-wide any), roll-reduced to a per-row bit
                        tx0 = (clox[c] - ox) * inv_dx
                        tx1 = (chix[c] - ox) * inv_dx
                        ty0 = (cloy[c] - oy) * inv_dy
                        ty1 = (chiy[c] - oy) * inv_dy
                        tz0 = (cloz[c] - oz) * inv_dz
                        tz1 = (chiz[c] - oz) * inv_dz
                        tnear = jnp.maximum(
                            jnp.maximum(jnp.minimum(tx0, tx1),
                                        jnp.minimum(ty0, ty1)),
                            jnp.minimum(tz0, tz1))
                        tfar = jnp.minimum(
                            jnp.minimum(jnp.maximum(tx0, tx1),
                                        jnp.maximum(ty0, ty1)),
                            jnp.maximum(tz0, tz1))
                        e = (alive & (tfar >= tnear) & (tfar > MIN_T)
                             & (tnear < bt0)).astype(f32)
                        return jnp.where(lane_r == (c - c_lo),
                                         _lanemax(e), m)

                    M = jax.lax.fori_loop(c_lo, c_hi, mask_body,
                                          jnp.zeros((S_r, 128), f32))
                    csum = _lanesum_inc(M)
                    kvec = csum[:, 127:128]
                    trip = jnp.max(kvec).astype(jnp.int32)

                    def step(j, cr2, g=g, cg=cg, c_lo=c_lo, csum=csum):
                        bt2, bi2 = cr2[0], cr2[1]
                        od_c, oo_c = cr2[8], cr2[9]
                        target = jnp.broadcast_to(
                            (j + 1).astype(f32), (S_r, 128))
                        sel = jnp.minimum(_rank_select(csum, target),
                                          cg - 1)
                        p = (lane_r == sel).astype(f32)
                        tg = rowsweep_ref[g * 128:(g + 1) * 128, :]
                        w = jax.lax.dot_general(
                            p, tg, (((1,), (0,)), ((), ())),
                            precision=jax.lax.Precision.HIGHEST)
                        chunk_f = (sel + c_lo).astype(f32)
                        items = []
                        for k in range(cs_r):
                            ga = [jnp.take_along_axis(
                                w, jnp.full((S_r, 128), a * cs_r + k,
                                            jnp.int32), axis=1)
                                for a in range(4)]
                            cxk, cyk, czk, kqk = ga
                            # sphere_ts with per-row vector attributes:
                            # identical value sequence (exact doubling,
                            # same FMA order), so bit-identical ts
                            cd = cxk * dx + cyk * dy + czk * dz
                            co2 = ((cxk + cxk) * ox + (cyk + cyk) * oy
                                   + (czk + czk) * oz)
                            b = cd - od_c
                            cq = oo_c - co2 + kqk
                            sq = jnp.sqrt(b * b - cq)
                            t0 = b - sq
                            t1 = b + sq
                            ts = jnp.where(t0 > MIN_T, t0, t1)
                            ts = jnp.where((sq > 0.0) & (ts > MIN_T),
                                           ts, MAX_T)
                            items.append(
                                (ts, chunk_f * f32(cs_r) + f32(k)))
                        while len(items) > 1:
                            merged = []
                            for q in range(0, len(items) - 1, 2):
                                (ta, ia), (tb, ib) = items[q], items[q + 1]
                                take_b = tb < ta
                                merged.append((jnp.minimum(ta, tb),
                                               jnp.where(take_b, ib, ia)))
                            if len(items) % 2:
                                merged.append(items[-1])
                            items = merged
                        tm, im = items[0]
                        better = tm < bt2
                        return (jnp.where(better, tm, bt2),
                                jnp.where(better, im, bi2), *cr2[2:])

                    cr = jax.lax.fori_loop(0, trip, step, cr)
                    if stats:
                        # rowsweep's cost driver is STEPS (each = cs_r
                        # row-divergent sphere tests), not chunk entries
                        lst = list(cr)
                        lst[-2] = lst[-2] + trip
                        cr = tuple(lst)
                return cr
        elif chunk_list_ref is not None and culling:
            def full_sweep(carry0):
                n_groups = list_groups if n_chunks >= 4 * list_groups else 1
                gsz = -(-n_chunks // n_groups)
                cr = carry0
                for g in range(n_groups):
                    c_lo = g * gsz
                    c_hi = min((g + 1) * gsz, n_chunks)
                    if c_lo >= c_hi:
                        continue
                    bt0 = cr[0]

                    def test_body(c, cursor, bt0=bt0):
                        enter = bound_possible(
                            bt0, clox[c], cloy[c], cloz[c],
                            chix[c], chiy[c], chiz[c])
                        chunk_list_ref[cursor] = c
                        return cursor + enter.astype(jnp.int32)

                    cursor = jax.lax.fori_loop(
                        c_lo, c_hi, test_body, jnp.int32(0))

                    def sweep_body(j, cr2):
                        c = chunk_list_ref[j]
                        return sweep_chunk(c, cr2)

                    cr = jax.lax.fori_loop(0, cursor, sweep_body, cr)
                    if stats:
                        lst = list(cr)
                        lst[-2] = lst[-2] + cursor
                        cr = tuple(lst)
                return cr
        elif two_level:
            def super_body(sc, carry):
                def taken(cr):
                    if stats:
                        cr = _inc(cr, -1)
                    return jax.lax.fori_loop(
                        sc * super_factor, (sc + 1) * super_factor,
                        chunk_body, cr,
                    )

                return jax.lax.cond(
                    bound_possible(carry[0], slox[sc], sloy[sc], sloz[sc],
                                   shix[sc], shiy[sc], shiz[sc]),
                    taken,
                    lambda cr: cr,
                    carry,
                )

            def full_sweep(carry0):
                return jax.lax.fori_loop(0, n_super, super_body, carry0)
        elif culling:
            def full_sweep(carry0):
                return jax.lax.fori_loop(0, n_chunks, chunk_body, carry0)
        if culling:
            if frustum_ref is not None:
                # Bounce 0: visit the precomputed per-tile frustum chunk
                # list — no in-kernel AABB tests at all (the list is
                # conservative, so results are bit-identical).
                def listed_sweep(carry0):
                    # rows are blocked 8 tiles at a time (Mosaic requires
                    # >=8-row SMEM blocks); the caller passes t % 8
                    trow = frustum_row

                    def lbody(j, c2):
                        c = frustum_ref[trow, 1 + j]
                        c2 = sweep_chunk(c, c2)
                        return _inc(c2, -2) if stats else c2

                    return jax.lax.fori_loop(
                        0, frustum_ref[trow, 0], lbody, carry0)

                res = jax.lax.cond(i == 0, listed_sweep, full_sweep, init)
            else:
                res = full_sweep(init)
        elif n_spheres <= 64:
            res = sweep_span_tree(jnp.int32(0), n_spheres, init)
        else:
            # Unculled big scene (chunk_size=0 override): a rolled loop
            # over fixed-size spans — python-unrolling thousands of
            # sphere evaluations would explode the trace/compile.
            span = 32
            pad_n = -(-n_spheres // span) * span  # guarded by wrapper pad

            def span_body(i, carry):
                return sweep_span_tree(i * span, span, carry)

            res = jax.lax.fori_loop(0, pad_n // span, span_body, init)
        if stats:
            live_sum, chunks_tot, supers_tot = stat_carry
            live_sum = live_sum + jnp.sum(alive_f)
            chunks_tot = chunks_tot + res[-2]
            supers_tot = supers_tot + res[-1]
            stat_carry = (live_sum, chunks_tot, supers_tot)
        bt, bidx = res[0], res[1]
        hit = bt < MAX_T

        # --- winner-attribute retrieval: blend the 12 per-sphere
        # attributes of each lane's best sphere, visiting only chunks
        # that contain some lane's winner (coherent tiles touch 1-3).
        def retrieve_span(lo, hi, carry):
            def body(s, cr):
                m = bidx == s.astype(f32)
                vals = (scx[s], scy[s], scz[s], srad[s], smid[s], smx[s],
                        sa1r[s], sa1g[s], sa1b[s],
                        sa2r[s], sa2g[s], sa2b[s])
                if textures:
                    vals = vals + (st1b[s], st1w[s], st1h[s],
                                   st2b[s], st2w[s], st2h[s])
                return tuple(
                    jnp.where(m, v, old) for v, old in zip(vals, cr)
                )
            return jax.lax.fori_loop(lo, hi, body, carry)

        rinit = (zero, zero, zero, one, zero, zero,
                 zero, zero, zero, zero, zero, zero)
        if textures:
            # tex descriptor attrs; base = -1 marks "no image texture"
            neg1 = jnp.full_like(zero, -1.0)
            rinit = rinit + (neg1, zero, zero, neg1, zero, zero)
        if retr_lut_ref is not None:
            # per-lane gather over the attr-major LUT: walk only the
            # winners' [min,max] row span (tex_lookup's proven pattern),
            # one gather per (row, attr) — orders of magnitude fewer ops
            # than cond-visiting every winner's chunk on diverged tiles
            n_ra = len(rinit)
            winner = alive & hit
            idxh = jnp.where(winner, bidx, 0.0).astype(jnp.int32)
            row_b = idxh >> 7
            col_b = idxh & 127
            bigr = jnp.int32(1 << 30)
            rlo_r = jnp.min(jnp.where(winner, row_b, bigr))
            rhi_r = jnp.max(jnp.where(winner, row_b, -1))

            def retr_body(r, accs):
                out = []
                for a in range(n_ra):
                    vec = jnp.broadcast_to(
                        retr_lut_ref[pl.ds(a * lut_rows + r, 1), :],
                        row_b.shape)
                    g = jnp.take_along_axis(vec, col_b, axis=1)
                    out.append(jnp.where(row_b == r, g, accs[a]))
                return tuple(out)

            gathered = jax.lax.fori_loop(rlo_r, rhi_r + 1, retr_body,
                                         (zero,) * n_ra)
            # non-winner lanes keep rinit's defaults (radius 1 guards the
            # 1/brad normal; tex base -1 = no image fetch)
            rres = tuple(
                jnp.where(winner, g, init)
                for g, init in zip(gathered, rinit)
            )
        elif culling:
            def retr_chunk(c, carry):
                lo_f = (c * chunk_size).astype(f32)
                hi_f = ((c + 1) * chunk_size).astype(f32)
                present = (bidx >= lo_f) & (bidx < hi_f)
                return jax.lax.cond(
                    jnp.any(present),
                    lambda cr: retrieve_span(
                        c * chunk_size, (c + 1) * chunk_size, cr),
                    lambda cr: cr,
                    carry,
                )
            rres = jax.lax.fori_loop(0, n_chunks, retr_chunk, rinit)
        else:
            rres = retrieve_span(0, n_spheres, rinit)
        (bcx, bcy, bcz, brad, bmid, bmx,
         b1r, b1g, b1b, b2r, b2g, b2b) = rres[:12]
        px = ox + bt * dx
        py = oy + bt * dy
        pz = oz + bt * dz
        inv_r = 1.0 / brad
        nx = (px - bcx) * inv_r
        ny = (py - bcy) * inv_r
        nz = (pz - bcz) * inv_r

        if textures:
            # spherical UV of the hit (sphereIntersection, wgsl:431-440)
            # + image fetch replacing the prefolded albedos
            (w1b, w1w, w1h, w2b, w2w, w2h) = rres[12:18]
            need = alive & hit
            theta = acos_approx(jnp.clip(-ny, -1.0, 1.0))
            phi = atan2_approx(-nz, nx) + PI
            u = phi * f32(1.0 / TWO_PI)
            v = theta * FRAC_1_PI
            b1r, b1g, b1b = tex_lookup(w1b, w1w, w1h, u, v, need,
                                       b1r, b1g, b1b)
            b2r, b2g, b2b = tex_lookup(w2b, w2w, w2h, u, v, need,
                                       b2r, b2g, b2b)

        state, r1 = _rng_float(state)
        state, r2 = _rng_float(state)
        state, r3 = _rng_float(state)
        state, r4 = _rng_float(state)

        # --- diffuse direction (pixarOnb + cosine hemisphere) ---
        sgn = jnp.where(nz >= 0.0, 1.0, -1.0)
        a = -1.0 / (sgn + nz)
        bb = nx * ny * a
        t1x = 1.0 + sgn * nx * nx * a
        t1y = sgn * bb
        t1z = -sgn * nx
        t2x = bb
        t2y = sgn + ny * ny * a
        t2z = -ny
        sqr2 = jnp.sqrt(r2)
        zl = jnp.sqrt(jnp.maximum(0.0, 1.0 - r2))
        phi = TWO_PI * r1
        xl = jnp.cos(phi) * sqr2
        yl = jnp.sin(phi) * sqr2
        difx = xl * t1x + yl * t2x + zl * nx
        dify = xl * t1y + yl * t2y + zl * ny
        difz = xl * t1z + yl * t2z + zl * nz
        ndw = _dot3(nx, ny, nz, difx, dify, difz)
        lam_ratio = (FRAC_1_PI * jnp.maximum(EPS, ndw)) / jnp.maximum(
            EPS, ndw * FRAC_1_PI
        )

        # --- unit-ball point (metal fuzz / missing material) ---
        rr = jnp.power(r1, 1.0 / 3.0)
        cth = 1.0 - 2.0 * r2
        sth = jnp.sqrt(jnp.maximum(0.0, 1.0 - cth * cth))
        ph3 = TWO_PI * r3
        ballx = rr * sth * jnp.cos(ph3)
        bally = rr * sth * jnp.sin(ph3)
        ballz = rr * cth

        # --- metal ---
        ddn2 = 2.0 * _dot3(dx, dy, dz, nx, ny, nz)
        rflx = dx - ddn2 * nx
        rfly = dy - ddn2 * ny
        rflz = dz - ddn2 * nz
        metx = rflx + bmx * ballx
        mety = rfly + bmx * bally
        metz = rflz + bmx * ballz

        # --- dielectric (RTiOW-correct; see ops/scatter.py) ---
        ddn = 0.5 * ddn2
        front = ddn < 0.0
        osx = jnp.where(front, nx, -nx)
        osy = jnp.where(front, ny, -ny)
        osz = jnp.where(front, nz, -nz)
        eta = jnp.where(front, 1.0 / bmx, bmx)
        cosine = jnp.where(front, -ddn, bmx * ddn)
        dt = _dot3(dx, dy, dz, osx, osy, osz)
        disc_d = 1.0 - eta * eta * (1.0 - dt * dt)
        can_refract = disc_d > 0.0
        sqd = jnp.sqrt(jnp.maximum(disc_d, 0.0))
        refx = eta * (dx - dt * osx) - sqd * osx
        refy = eta * (dy - dt * osy) - sqd * osy
        refz = eta * (dz - dt * osz) - sqd * osz
        r0 = (1.0 - bmx) / (1.0 + bmx)
        r0 = r0 * r0
        omc = 1.0 - jnp.clip(cosine, 0.0, 1.0)
        omc2 = omc * omc
        schlick = r0 + (1.0 - r0) * omc2 * omc2 * omc
        reflect_prob = jnp.where(can_refract, schlick, 1.0)
        use_reflect = r4 < reflect_prob
        dlx = jnp.where(use_reflect, rflx, refx)
        dly = jnp.where(use_reflect, rfly, refy)
        dlz = jnp.where(use_reflect, rflz, refz)

        # --- checkerboard albedo (3D sine parity, wgsl:300-307) ---
        sines = jnp.sin(5.0 * px) * jnp.sin(5.0 * py) * jnp.sin(5.0 * pz)
        even = sines < 0.0
        chkr = jnp.where(even, b1r, b2r)
        chkg = jnp.where(even, b1g, b2g)
        chkb = jnp.where(even, b1b, b2b)

        # --- select by material id ---
        is_lam = bmid == _LAMBERTIAN
        is_met = bmid == _METAL
        is_die = bmid == _DIELECTRIC
        is_chk = bmid == _CHECKERBOARD
        is_dif = is_lam | is_chk

        def sel(m, yes, no):
            return jnp.where(m, yes, no)

        missx = nx + ballx
        missy = ny + bally
        missz = nz + ballz
        ndx = sel(is_dif, difx, sel(is_met, metx, sel(is_die, dlx, missx)))
        ndy = sel(is_dif, dify, sel(is_met, mety, sel(is_die, dly, missy)))
        ndz = sel(is_dif, difz, sel(is_met, metz, sel(is_die, dlz, missz)))

        att_r = sel(is_lam, b1r * lam_ratio,
                    sel(is_chk, chkr * lam_ratio,
                        sel(is_met, b1r, sel(is_die, 1.0, _PINK[0]))))
        att_g = sel(is_lam, b1g * lam_ratio,
                    sel(is_chk, chkg * lam_ratio,
                        sel(is_met, b1g, sel(is_die, 1.0, _PINK[1]))))
        att_b = sel(is_lam, b1b * lam_ratio,
                    sel(is_chk, chkb * lam_ratio,
                        sel(is_met, b1b, sel(is_die, 1.0, _PINK[2]))))

        inv_len = jax.lax.rsqrt(
            jnp.maximum(1.0e-24, _dot3(ndx, ndy, ndz, ndx, ndy, ndz))
        )
        ndx = ndx * inv_len
        ndy = ndy * inv_len
        ndz = ndz * inv_len

        # --- sky on miss (HW-form distribution) ---
        cos_theta = jnp.abs(jnp.clip(dy, -1.0, 1.0))
        cos_gamma = jnp.clip(
            _dot3(dx, dy, dz, sunx, suny, sunz), -1.0, 1.0
        )
        gamma = acos_approx(cos_gamma)
        sky_r = sky_ref[27] * sky_channel(sky_ref, 0, cos_theta, gamma, cos_gamma)
        sky_g = sky_ref[28] * sky_channel(sky_ref, 9, cos_theta, gamma, cos_gamma)
        sky_b = sky_ref[29] * sky_channel(sky_ref, 18, cos_theta, gamma, cos_gamma)

        active = alive & hit
        miss = alive & (~hit)
        # emissive area light: the path ends here with x * albedo
        lit = active & (bmid == _EMISSIVE)
        scattering = active & (bmid != _EMISSIVE)
        tr = jnp.where(scattering, tr * att_r, tr)
        tg = jnp.where(scattering, tg * att_g, tg)
        tb = jnp.where(scattering, tb * att_b, tb)
        cr = jnp.where(miss, sky_r, cr)
        cg = jnp.where(miss, sky_g, cg)
        cb = jnp.where(miss, sky_b, cb)
        cr = jnp.where(lit, bmx * b1r, cr)
        cg = jnp.where(lit, bmx * b1g, cg)
        cb = jnp.where(lit, bmx * b1b, cb)
        ox = jnp.where(scattering, px, ox)
        oy = jnp.where(scattering, py, oy)
        oz = jnp.where(scattering, pz, oz)
        dx = jnp.where(scattering, ndx, dx)
        dy = jnp.where(scattering, ndy, dy)
        dz = jnp.where(scattering, ndz, dz)
        out = (i + 1, ox, oy, oz, dx, dy, dz,
               tr, tg, tb, cr, cg, cb,
               jnp.where(scattering, 1.0, 0.0).astype(f32),
               state)
        if export_hit:
            # chunk of this bounce's winner (exact: chunk_size is a power
            # of two and sphere counts stay far below 2^24)
            if n_chunks > 0:
                chk = jnp.floor(bidx * f32(1.0 / chunk_size))
            else:
                chk = jnp.zeros_like(bidx)
            out = out + (jnp.where(scattering, chk, hit_chunk),)
        return out + stat_carry

    return bounce_cond, bounce_body


def _make_kernel(width: int, height: int, spp: int, num_bounces: int,
                 n_spheres: int, tsub: int, chunk_size: int, n_chunks: int,
                 block_w: int, tiles_x: int, super_factor: int,
                 n_super: int, full_height: int, stats: bool = False,
                 textures: bool = False, retr: bool = False,
                 lut_rows: int = 0, subcull: int = 0,
                 listed: bool = False, mxu: bool = False):
    """chunk_size/n_chunks > 0 enable morton-chunk culled intersection
    (ops/bvh.py): whole-tile AABB slab tests skip chunk bodies (and, for
    big scenes, whole super-chunks of chunks).

    Lanes map to 2D screen blocks of block_h x block_w pixels (not scanline
    runs) so each tile's rays form a narrow cone — the coherence that makes
    tile-granularity culling effective.
    """
    tile = tsub * 128
    block_h = tile // block_w
    f32 = jnp.float32
    assert block_w & (block_w - 1) == 0, "block_w must be a power of two"
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
        acc_in, acc_out = rest[0], rest[1]
        maybe_stats_ref = rest[2:]
        list_ref = rest[-1] if listed else None
        t = pl.program_id(0)
        frame = meta_ref[0]  # uint32 scalar
        clear = meta_ref[1] == jnp.uint32(1)
        # Row offset of this shard within the full image (uint32 scalar;
        # nonzero under shard_map row sharding). RNG seeding and camera
        # aiming use GLOBAL coordinates so sharded renders reproduce the
        # single-device image.
        row_off = meta_ref[2]

        rows = jax.lax.broadcasted_iota(jnp.int32, (tsub, 128), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (tsub, 128), 1)
        lane = rows * 128 + cols
        tx = t % tiles_x
        ty = t // tiles_x
        x = tx * block_w + (lane & (block_w - 1))
        y = ty * block_h + (lane >> bw_shift)
        # clamp padded lanes to the local block (their outputs are dropped)
        x = jnp.minimum(x, width - 1)
        y = jnp.minimum(y, height - 1)
        y_gu = jax.lax.bitcast_convert_type(y, jnp.uint32) + row_off
        y_g = jax.lax.bitcast_convert_type(y_gu, jnp.int32)
        pix = y_g * width + x
        xf = x.astype(f32)
        yf = y_g.astype(f32)

        pix_u32 = jax.lax.bitcast_convert_type(pix, jnp.uint32)
        frame_hash = _jenkins(frame)

        bounce_cond, bounce_body = _make_bounce(
            scene, bounds, supers, sky_ref,
            num_bounces=num_bounces, chunk_size=chunk_size,
            n_chunks=n_chunks, super_factor=super_factor, n_super=n_super,
            n_spheres=n_spheres, stats=stats, tex_pool_ref=tex_pool_ref,
            retr_lut_ref=retr_lut_ref, lut_rows=lut_rows, subcull=subcull,
            chunk_list_ref=list_ref, mxu_ref=mxu_ref,
        )

        inv_w = f32(1.0 / width)
        inv_h = f32(1.0 / full_height)  # camera aims in full-image space

        tot_r = jnp.zeros((tsub, 128), f32)
        tot_g = jnp.zeros((tsub, 128), f32)
        tot_b = jnp.zeros((tsub, 128), f32)


        if stats:
            st_iters = jnp.int32(0)
            st_live = jnp.float32(0.0)
            st_chunks = jnp.int32(0)
            st_supers = jnp.int32(0)

        for s in range(spp):
            # Independent per-sample seed (ops/rng.py init_sample_state):
            # draws depend only on (pixel, frame, sample, bounce), so the
            # whole-tile bounce exit can't shift later samples' streams and
            # results are bit-identical to the XLA path for live rays.
            mix = jnp.uint32((0x9E3779B9 * (s + 1)) & 0xFFFFFFFF)
            state = _jenkins(pix_u32 ^ frame_hash ^ mix)
            # Jittered screen sample + thin-lens ray (wgsl:105-122, 456-478)
            state, ox, oy, oz, dx, dy, dz = _camera_ray(
                cam_ref, xf, yf, inv_w, inv_h, state)

            one = jnp.ones((tsub, 128), f32)
            zero = jnp.zeros((tsub, 128), f32)
            carry = (jnp.int32(0), ox, oy, oz, dx, dy, dz,
                     one, one, one, zero, zero, zero,
                     one, state)
            if stats:
                carry = carry + (jnp.float32(0.0), jnp.int32(0), jnp.int32(0))
            carry = jax.lax.while_loop(bounce_cond, bounce_body, carry)
            tr, tg, tb = carry[7], carry[8], carry[9]
            cr, cg, cb = carry[10], carry[11], carry[12]
            state = carry[14]
            if stats:
                st_iters = st_iters + carry[0]
                st_live = st_live + carry[15]
                st_chunks = st_chunks + carry[16]
                st_supers = st_supers + carry[17]
            tot_r = tot_r + tr * cr
            tot_g = tot_g + tg * cg
            tot_b = tot_b + tb * cb

        base_r = jnp.where(clear, 0.0, acc_in[0])
        base_g = jnp.where(clear, 0.0, acc_in[1])
        base_b = jnp.where(clear, 0.0, acc_in[2])
        acc_out[0] = base_r + tot_r
        acc_out[1] = base_g + tot_g
        acc_out[2] = base_b + tot_b
        if stats:
            # one (8,128) block per tile, stat r broadcast across row r
            # (VMEM blocks must be (8,128)-aligned; SMEM outputs can't take
            # sub-8 blocks)
            rows = [st_iters.astype(f32), st_live,
                    st_chunks.astype(f32), st_supers.astype(f32)]
            block = jnp.concatenate(
                [jnp.full((1, 128), v, f32) for v in rows]
                + [jnp.zeros((4, 128), f32)], axis=0,
            )
            maybe_stats_ref[0][0] = block

    return kernel


def _is_cpu() -> bool:
    return jax.default_backend() == "cpu"


# Scene-size threshold above which the MXU chunk sweep defaults ON
# (mirrors default_cuts' measured-points pattern). None = never: the
# round-4 chip session measured the MXU sweep LOSING at every chunk
# size on both headline scenes (RTiOW 1080p 631->400 Mrays/s at cs16,
# 370 at cs32; random10k 4K 180->94 at cs64, 77 at cs128 — docs/
# PERF.md "MXU chunk sweep: measured on chip"), so the knob stays a
# measurement tool and must never default on.
MXU_DEFAULT_MIN_SPHERES: int | None = None


def _default_mxu_sweep(n_spheres: int | None = None) -> bool:
    """Default for the MXU chunk sweep. WRT_MXU_SWEEP=0/1 forces either
    way; otherwise scenes with >= MXU_DEFAULT_MIN_SPHERES spheres (whose
    frames are sweep-dominated) default on once that constant is set."""
    import os

    env = os.environ.get("WRT_MXU_SWEEP")
    if env is not None:
        return env == "1"
    return (MXU_DEFAULT_MIN_SPHERES is not None and n_spheres is not None
            and n_spheres >= MXU_DEFAULT_MIN_SPHERES)


def pack_camera(basis: CameraBasis) -> jnp.ndarray:
    """Camera basis as the 20-float SMEM vector the kernels read."""
    return jnp.concatenate([
        basis.eye, basis.horizontal, basis.vertical, basis.u, basis.v,
        basis.lower_left_corner, basis.lens_radius[None],
        jnp.zeros((1,), jnp.float32),
    ]).astype(jnp.float32)


def pack_sky(sky: SkyState) -> jnp.ndarray:
    """Sky state as the 33-float SMEM vector (27 params + 3 radiances +
    sun direction)."""
    return jnp.concatenate([
        sky.params.reshape(27), sky.radiances, sky.sun_direction
    ]).astype(jnp.float32)


def build_kernel_texture_pool(mat, budget_texels: int = 8192):
    """Pack the image textures into the kernel LUT pool.

    Each image texture is mipped (box filter, or strided sampling when the
    scale doesn't divide) until w*h <= budget_texels, quantized to packed
    RGB8 int32 (the source images are 8-bit anyway), and laid out
    row-major in 128-texel rows aligned to row boundaries. The in-kernel
    lookup walks only the rows the tile's winning texels live in,
    per-lane-gathering along lanes (benchmarks/probe_mosaic.py).

    Returns (pool [rows,128] i32, desc1 [M,3] f32, desc2 [M,3] f32) where a
    descriptor is (base_row * 1.0, kernel_w, kernel_h), base_row = -1 for
    solid textures; or None when no material has an image texture.
    Implements the device half of the reference's textureLookup
    (raytracer.wgsl:377-387) for the fused kernels.
    """
    import numpy as _np

    meta = mat.tex_meta
    if not meta:
        return None
    kern_descs = {}  # (w, h, off) -> (base_row, wk, hk)
    chunks = []
    next_row = 0
    for d1, d2 in meta:
        for d in (d1, d2):
            w, h, off = d
            if w * h <= 1 or d in kern_descs:
                continue
            k = 0
            while (w >> k) * (h >> k) > budget_texels:
                k += 1
            s = 1 << k
            tex = mat.pool[off:off + w * h].reshape(h, w, 3)
            if k:
                if w % s == 0 and h % s == 0:
                    tex = tex.reshape(h // s, s, w // s, s, 3).mean((1, 3))
                else:
                    tex = tex[::s, ::s]
            hk, wk = int(tex.shape[0]), int(tex.shape[1])
            q = (jnp.clip(tex, 0.0, 1.0) * 255.0 + 0.5).astype(jnp.int32)
            packed = ((q[..., 0] << 16) | (q[..., 1] << 8) | q[..., 2])
            flat = packed.reshape(-1)
            pad = (-flat.shape[0]) % 128
            if pad:
                flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
            kern_descs[d] = (next_row, wk, hk)
            chunks.append(flat)
            next_row += flat.shape[0] // 128
    if not chunks:
        return None
    pool = jnp.concatenate(chunks).reshape(-1, 128)
    pad_rows = (-pool.shape[0]) % 8
    if pad_rows:
        pool = jnp.concatenate(
            [pool, jnp.zeros((pad_rows, 128), jnp.int32)])

    def desc_arr(slot):
        out = _np.full((len(meta), 3), -1.0, _np.float32)
        for m, pair in enumerate(meta):
            d = pair[slot]
            if d in kern_descs:
                base, wk, hk = kern_descs[d]
                out[m] = (float(base), float(wk), float(hk))
        return jnp.asarray(out)

    return pool, desc_arr(0), desc_arr(1)


def default_chunk_size(n_spheres: int) -> int:
    """Measured optimum (docs/PERF.md round 3, cuts (2,4,6) + spp fold):
    16 for mid-size scenes, 32 at 10k scale. RTiOW spp16: 16 -> 617.4
    vs 32 -> 601.5 vs 8 -> 542.8 Mrays/s (finer cull precision wins
    once the LUT-gather retrieval removed the per-chunk walk cost);
    random10k: 32 -> 174.7 vs 64 -> 168.2 vs 16 -> 161.7 (per-chunk
    fixed costs dominate at 313+ chunks)."""
    return 16 if n_spheres <= 2048 else 32


DEFAULT_TEXTURE_BUDGET = 8192  # texels per texture in the in-kernel LUT


def prepare_scene_arrays(scene: Scene, basis: CameraBasis,
                         chunk_size: int, super_factor: int,
                         budget_texels: int = DEFAULT_TEXTURE_BUDGET):
    """Build the 13 per-sphere SMEM attribute arrays (+ prefolded material
    attributes and the quadratic constant kq = |c|^2 - r^2) and the
    morton-chunk / super-chunk AABB arrays for tile-granularity culling.

    Returns (s_attrs, chunk_arrays, super_arrays, n_spheres, n_chunks,
    n_super, tex_pool, retr_lut): sphere/chunk/super SMEM arrays, padded
    counts, the packed texture LUT pool (or None), and the attr-major
    winner-retrieval LUT (or None when culling is off; rows per attr =
    ceil(n_spheres/128)). Shared by the megakernel and both wavefront
    variants (ops/pallas/wavefront.py, ops/pallas/regroup.py).

    For scenes with image textures, s_attrs carries 6 extra per-sphere
    texture-descriptor attributes (tex1/tex2 base row, width, height — -1
    base for solid textures) and tex_pool is the packed LUT pool;
    otherwise tex_pool is None and s_attrs has the 13 base attributes.
    """
    sph = scene.spheres
    mat = scene.materials
    midx = sph.material_idx
    s_attrs = (
        sph.centers[:, 0], sph.centers[:, 1], sph.centers[:, 2], sph.radii,
        mat.ids[midx].astype(jnp.float32), mat.x[midx],
        mat.albedo1[midx, 0], mat.albedo1[midx, 1], mat.albedo1[midx, 2],
        mat.albedo2[midx, 0], mat.albedo2[midx, 1], mat.albedo2[midx, 2],
    )
    tex_pool = None
    if not mat.all_solid:
        built = build_kernel_texture_pool(mat, budget_texels)
        if built is not None:
            tex_pool, desc1, desc2 = built
            s_attrs = s_attrs + (
                desc1[midx, 0], desc1[midx, 1], desc1[midx, 2],
                desc2[midx, 0], desc2[midx, 1], desc2[midx, 2],
            )
    n_spheres = int(sph.centers.shape[0])
    # 13th attribute: kq (appended after the chunk sort so it rides the
    # same reorder)

    # Morton-chunk culling pays off once there are a few chunks' worth of
    # spheres; tiny scenes stay on the plain sweep.
    use_culling = chunk_size > 0 and n_spheres >= 2 * chunk_size
    z1 = jnp.zeros((1,), jnp.float32)
    super_arrays = (z1,) * 6
    n_super = 0
    if use_culling:
        from ..bvh import build_chunks, order_front_to_back, super_bounds

        chunked = build_chunks(s_attrs, chunk_size)
        # Visit near chunks first: tightens best-t early so far bounds
        # fail the cull (pure permutation, identical results).
        chunked = order_front_to_back(chunked, basis.eye, chunk_size)
        s_attrs = chunked.attrs
        n_spheres = int(s_attrs[0].shape[0])
        n_chunks = n_spheres // chunk_size
        chunk_arrays = chunked.bounds
        if n_chunks >= 2 * super_factor:
            chunk_arrays, super_arrays = super_bounds(chunked, super_factor)
            n_super = int(chunk_arrays[0].shape[0]) // super_factor
    else:
        chunk_arrays = (z1,) * 6
        n_chunks = 0
        if n_spheres > 64:
            # the kernel's rolled unculled sweep reads 32-sphere spans;
            # pad with duplicates of the last sphere (harmless for
            # closest-hit) so the final span stays in bounds
            pad_s = (-n_spheres) % 32
            if pad_s:
                s_attrs = tuple(
                    jnp.concatenate([a, jnp.broadcast_to(a[-1], (pad_s,))])
                    for a in s_attrs
                )
                n_spheres = int(s_attrs[0].shape[0])

    cx_, cy_, cz_, rad_ = s_attrs[0], s_attrs[1], s_attrs[2], s_attrs[3]
    kq = cx_ * cx_ + cy_ * cy_ + cz_ * cz_ - rad_ * rad_
    s_attrs = s_attrs + (kq,)
    if n_chunks > 0:
        # Prior spheres: the N_PRIORS largest (|radius| — hollow-glass
        # shells have negative radii) are swept BEFORE the chunk loop to
        # seed best-t, so the `tnear < best_t` term of the cull test bites
        # even for omnidirectional post-bounce tiles (e.g. the radius-500
        # ground sphere bounds every downward ray almost immediately).
        # Duplicate tests are harmless: the chunk sweep re-tests them with
        # identical ts and the strict-< merge keeps the same winner.
        _, prior_idx = jax.lax.top_k(jnp.abs(rad_), N_PRIORS)
        chunk_arrays = chunk_arrays + (prior_idx.astype(jnp.int32),)
    else:
        chunk_arrays = chunk_arrays + (jnp.zeros((N_PRIORS,), jnp.int32),)

    # Winner-attribute LUT: every retrieval attribute (all of s_attrs but
    # the sweep-only kq) laid out attr-major in 128-lane rows, so the
    # kernels fetch each lane's winning sphere's attributes with per-lane
    # gathers along lanes over the winners' [min,max] row span — instead
    # of cond-walking every chunk containing any winner (which costs
    # chunk_size x n_attr selects per visited chunk and dominates
    # retrieval on diverged post-cut tiles).
    retr_lut = None
    if n_chunks > 0:
        pad_cols = (-n_spheres) % 128
        planes = []
        for a in s_attrs[:-1]:
            col = (jnp.concatenate([a, jnp.zeros((pad_cols,), a.dtype)])
                   if pad_cols else a)
            planes.append(col.reshape(-1, 128))
        retr_lut = jnp.concatenate(planes, axis=0).astype(jnp.float32)
    return (s_attrs, chunk_arrays, super_arrays, n_spheres, n_chunks,
            n_super, tex_pool, retr_lut)


def mxu_sweep_amats(s_attrs, chunk_size: int, n_chunks: int):
    """Per-chunk A-matrices for the MXU closest-hit sweep: (n_chunks, 8,
    2*chunk_size) f32 where columns [0, cs) hold C^T in rows 0-2 (dotted
    against the ray direction) and columns [cs, 2cs) hold -2 C^T in rows
    3-5 plus kq = |c|^2 - r^2 in row 6 (dotted against [o; 1]) — one
    dot_general per register row then yields c.d and (-2 c.o + kq) for
    every sphere of the chunk at once (see _make_bounce's mxu_ref)."""
    cx, cy, cz, kq = s_attrs[0], s_attrs[1], s_attrs[2], s_attrs[-1]
    cs = chunk_size
    c3 = jnp.stack([cx, cy, cz], 0).reshape(3, n_chunks, cs)
    c3 = c3.transpose(1, 0, 2)  # (n_chunks, 3, cs)
    a = jnp.zeros((n_chunks, 8, 2 * cs), jnp.float32)
    a = a.at[:, 0:3, 0:cs].set(c3)
    a = a.at[:, 3:6, cs:].set(-2.0 * c3)
    a = a.at[:, 6, cs:].set(kq.reshape(n_chunks, cs))
    return a


def rowsweep_groups(n_chunks: int) -> int:
    """Chunk-group count for the row-granular sweep: ~4 front-to-back
    groups (so best-t tightened by earlier groups still prunes later
    ones), more when 128 lanes can't hold a group's entered-mask."""
    return max(-(-n_chunks // 128), min(4, n_chunks))


def rowsweep_tab(s_attrs, chunk_size: int, n_chunks: int):
    """Chunk-attribute table for the row-granular sweep (round 5):
    (n_groups * 128, 128) f32 where row g*128 + i holds, for chunk
    c = g*gsz + i of front-to-back group g, the four sphere_ts inputs
    of its spheres packed along lanes — lane a*cs + k = attr a
    (cx, cy, cz, kq) of sphere c*cs + k. A one-hot (S, 128) row-select
    matmul against a group's 128-row slab fetches EVERY row's own
    chunk attributes in one precision='highest' dot_general (exact:
    each output lane receives exactly one table element), after which
    constant-index lane gathers broadcast each sphere's attrs to all
    128 ray lanes. Padding rows/lanes are zero and never selected
    (ranks clamp to the group's live chunk count)."""
    cx, cy, cz, kq = s_attrs[0], s_attrs[1], s_attrs[2], s_attrs[-1]
    cs = chunk_size
    if cs * 4 > 128:
        raise ValueError(f"rowsweep needs chunk_size <= 32, got {cs}")
    n_groups = rowsweep_groups(n_chunks)
    gsz = -(-n_chunks // n_groups)
    attrs = jnp.stack([cx, cy, cz, kq], 0).reshape(4, n_chunks, cs)
    attrs = attrs.transpose(1, 0, 2).reshape(n_chunks, 4 * cs)
    tab = jnp.zeros((n_groups, 128, 128), jnp.float32)
    pad_c = n_groups * gsz - n_chunks
    if pad_c:
        attrs = jnp.concatenate(
            [attrs, jnp.zeros((pad_c, 4 * cs), jnp.float32)])
    tab = tab.at[:, :gsz, : 4 * cs].set(
        attrs.reshape(n_groups, gsz, 4 * cs))
    return tab.reshape(n_groups * 128, 128)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "spp", "num_bounces", "tsub",
                     "chunk_size", "block_w", "super_factor", "full_height",
                     "interpret", "stats", "budget_texels", "subcull",
                     "listed", "mxu_sweep"),
)
def _render_image_pallas_jit(
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
    tsub: int = 32,
    chunk_size: int | None = None,
    block_w: int = 64,
    super_factor: int = 16,
    row_offset: jnp.ndarray | int = 0,
    full_height: int | None = None,
    interpret: bool | None = None,
    stats: bool = False,
    budget_texels: int = DEFAULT_TEXTURE_BUDGET,
    subcull: int = 0,
    listed: bool = False,
    mxu_sweep: bool = False,
) -> jnp.ndarray:
    """One progressive frame via the fused megakernel; drop-in for
    ops.tracer.render_image. Image textures are sampled in-kernel from a
    packed LUT pool, mipped to <=budget_texels texels per texture (full
    resolution stays on the XLA gather path; see
    build_kernel_texture_pool and docs/PERF.md for the budget's
    quality/speed trade-off).

    stats=True additionally returns a [n_tiles, 8] f32 array of per-tile
    instrumentation (0: bounce iterations summed over samples, 1: live-lane
    sum over iterations, 2: chunk bodies entered, 3: super bodies entered)
    for performance analysis — adds scalar counters to the hot loop, so
    keep it off for production renders."""
    if interpret is None:
        interpret = _is_cpu()
    if full_height is None:
        full_height = height
    if chunk_size is None:
        chunk_size = default_chunk_size(int(scene.spheres.centers.shape[0]))
    n = width * height
    tile = tsub * 128
    block_h = tile // block_w
    wp = -(-width // block_w) * block_w
    hp = -(-height // block_h) * block_h
    tiles_x = wp // block_w
    n_tiles = tiles_x * (hp // block_h)

    # Static lane-order <-> scanline permutation (pure Python/NumPy; baked
    # into the compiled step as constants).
    import numpy as _np

    t_ids = _np.arange(n_tiles)[:, None]
    lanes = _np.arange(tile)[None, :]
    lx = (t_ids % tiles_x) * block_w + (lanes & (block_w - 1))
    ly = (t_ids // tiles_x) * block_h + (lanes >> (block_w.bit_length() - 1))
    perm = (ly * wp + lx).reshape(-1)  # lane slot -> padded pixel index
    inv_perm = _np.argsort(perm).astype(_np.int32)  # padded pixel -> lane slot
    perm = jnp.asarray(perm.astype(_np.int32))
    inv_perm = jnp.asarray(inv_perm)

    (s_attrs, chunk_arrays, super_arrays,
     n_spheres, n_chunks, n_super, tex_pool, retr_lut) = prepare_scene_arrays(
        scene, basis, chunk_size, super_factor, budget_texels)

    cam_vec = pack_camera(basis)
    sky_vec = pack_sky(sky)
    meta = jnp.stack([
        frame.astype(jnp.uint32),
        clear.astype(jnp.uint32),
        jnp.asarray(row_offset).astype(jnp.uint32),
    ])

    # [n, 3] scanline -> padded 2D -> tile-lane order channel planes
    acc2d = accum.T.reshape(3, height, width)
    acc2d = jnp.pad(acc2d, ((0, 0), (0, hp - height), (0, wp - width)))
    acc = acc2d.reshape(3, hp * wp)[:, perm].reshape(3, n_tiles * tsub, 128)

    textures = tex_pool is not None
    retr = retr_lut is not None
    lut_rows = -(-n_spheres // 128)  # LUT rows per attribute
    # Branchless chunk lists measured SLOWER than the cond form (they
    # bypass the super level: RTiOW 532->526, random10k 153->113 Mrays/s
    # — docs/PERF.md round 3), so the default stays the cond sweep.
    listed = bool(listed) and n_chunks > 0
    # the sublane-half argmin needs a power-of-two chunk (review finding:
    # a 24-sphere chunk would silently drop candidates in the tree)
    mxu = (bool(mxu_sweep) and n_chunks > 0 and subcull == 0
           and chunk_size & (chunk_size - 1) == 0)
    kernel = _make_kernel(width, height, spp, num_bounces, n_spheres, tsub,
                          chunk_size, n_chunks, block_w, tiles_x,
                          super_factor, n_super, full_height, stats=stats,
                          retr=retr, lut_rows=lut_rows,
                          textures=textures, subcull=subcull,
                          listed=listed, mxu=mxu)
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)
    acc_spec = pl.BlockSpec((3, tsub, 128), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_specs = acc_spec
    out_shape = jax.ShapeDtypeStruct((3, n_tiles * tsub, 128), jnp.float32)
    if stats:
        out_specs = (acc_spec, pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                                            memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.float32))
    pool_inputs = []
    pool_specs = []
    if textures:
        pool_inputs = [tex_pool]
        pool_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)]
    if retr:
        pool_inputs.append(retr_lut)
        pool_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    if mxu:
        pool_inputs.append(mxu_sweep_amats(s_attrs, chunk_size, n_chunks))
        pool_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
    n_in = 3 + len(s_attrs) + 13 + len(pool_inputs)
    list_scratch = ([pltpu.SMEM((max(n_chunks, 1),), jnp.int32)]
                    if listed else [])
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=([smem(), smem(), smem()] + [smem()] * len(s_attrs)
                  + [smem()] * 13 + pool_specs + [
            pl.BlockSpec((3, tsub, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ]),
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={n_in: 0},
        scratch_shapes=list_scratch,
        interpret=interpret,
    )(meta, cam_vec, sky_vec, *s_attrs, *chunk_arrays, *super_arrays,
      *pool_inputs, acc)

    if stats:
        out, stats_arr = out
        stats_arr = stats_arr[:, :, 0]  # stat r broadcast across lanes
    out2d = out.reshape(3, -1)[:, inv_perm].reshape(3, hp, wp)
    img = out2d[:, :height, :width].reshape(3, n).T
    if stats:
        return img, stats_arr
    return img


def _wrapper_n_spheres(args, kwargs):
    """Scene sphere count from a render_image_* wrapper's call: all three
    fused entries share the (accum, frame, clear, scene, ...) order."""
    scene = args[3] if len(args) > 3 else kwargs.get("scene")
    return None if scene is None else int(scene.spheres.centers.shape[0])


def render_image_pallas(*args, mxu_sweep: bool | None = None, **kwargs):
    """Public entry: resolves the scene-size/env default eagerly so the
    jit cache keys on the concrete bool (an env flip mid-process would
    otherwise be silently ignored via the cached None trace)."""
    if mxu_sweep is None:
        mxu_sweep = _default_mxu_sweep(_wrapper_n_spheres(args, kwargs))
    return _render_image_pallas_jit(*args, mxu_sweep=bool(mxu_sweep),
                                    **kwargs)


render_image_pallas.__wrapped__ = _render_image_pallas_jit
