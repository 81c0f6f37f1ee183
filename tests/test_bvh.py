"""Morton-chunk acceleration structure tests (ops/bvh.py)."""
import jax.numpy as jnp
import numpy as np

from weekend_raytracer_tpu.ops.bvh import (
    build_chunks,
    morton_codes,
    order_front_to_back,
    super_bounds,
)


def _attrs(n, seed=0):
    rs = np.random.RandomState(seed)
    c = (rs.rand(n, 3) * 20 - 10).astype(np.float32)
    r = rs.uniform(0.1, 0.5, n).astype(np.float32)
    extra = [rs.rand(n).astype(np.float32) for _ in range(8)]
    return tuple(jnp.asarray(a) for a in
                 (c[:, 0], c[:, 1], c[:, 2], r, *extra))


def test_morton_locality():
    """Morton-adjacent codes correspond to spatially nearby points."""
    attrs = _attrs(512)
    lo = jnp.array([-10.0, -10.0, -10.0])
    hi = jnp.array([10.0, 10.0, 10.0])
    codes = np.asarray(morton_codes(attrs[0], attrs[1], attrs[2], lo, hi))
    order = np.argsort(codes)
    pts = np.stack([np.asarray(a) for a in attrs[:3]], 1)[order]
    step = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    rs = np.random.RandomState(1)
    rand_pairs = np.linalg.norm(
        pts[rs.permutation(512)] - pts[rs.permutation(512)], axis=1)
    assert step.mean() < 0.5 * rand_pairs.mean()


def test_chunks_are_permutation_and_conservative():
    n, cs = 500, 32
    attrs = _attrs(n)
    scene = build_chunks(attrs, cs)
    s = scene.attrs[0].shape[0]
    assert s % cs == 0 and s >= n
    # every original sphere present (attrs[4] is a unique-ish random tag)
    orig = set(np.asarray(attrs[4]).round(6).tolist())
    got = set(np.asarray(scene.attrs[4]).round(6).tolist())
    assert orig == got
    # chunk AABBs contain every member sphere entirely
    nc = s // cs
    cx = np.asarray(scene.attrs[0]).reshape(nc, cs)
    cy = np.asarray(scene.attrs[1]).reshape(nc, cs)
    cz = np.asarray(scene.attrs[2]).reshape(nc, cs)
    cr = np.abs(np.asarray(scene.attrs[3]).reshape(nc, cs))
    lox, loy, loz, hix, hiy, hiz = (np.asarray(b) for b in scene.bounds)
    tol = 1e-4
    assert (cx - cr >= lox[:, None] - tol).all()
    assert (cy - cr >= loy[:, None] - tol).all()
    assert (cz - cr >= loz[:, None] - tol).all()
    assert (cx + cr <= hix[:, None] + tol).all()
    assert (cy + cr <= hiy[:, None] + tol).all()
    assert (cz + cr <= hiz[:, None] + tol).all()


def test_front_to_back_ordering():
    attrs = _attrs(256)
    scene = build_chunks(attrs, 32)
    eye = jnp.array([0.0, 0.0, -50.0])
    ordered = order_front_to_back(scene, eye, 32)
    ocx = 0.5 * (np.asarray(ordered.bounds[0]) + np.asarray(ordered.bounds[3]))
    ocy = 0.5 * (np.asarray(ordered.bounds[1]) + np.asarray(ordered.bounds[4]))
    ocz = 0.5 * (np.asarray(ordered.bounds[2]) + np.asarray(ordered.bounds[5]))
    d2 = ocx ** 2 + ocy ** 2 + (ocz + 50.0) ** 2
    assert (np.diff(d2) >= -1e-3).all()
    # same sphere set, same chunk bound multiset
    np.testing.assert_allclose(
        sorted(np.asarray(scene.bounds[0]).tolist()),
        sorted(np.asarray(ordered.bounds[0]).tolist()), rtol=1e-6)


def test_super_bounds_conservative():
    attrs = _attrs(1024)
    scene = build_chunks(attrs, 32)
    padded, supers = super_bounds(scene, 8)
    assert padded[0].shape[0] % 8 == 0
    nsc = padded[0].shape[0] // 8
    for axis in range(3):
        clo = np.asarray(padded[axis]).reshape(nsc, 8)
        chi = np.asarray(padded[3 + axis]).reshape(nsc, 8)
        real = clo <= chi  # skip inverted (padding) boxes
        slo = np.asarray(supers[axis])[:, None].repeat(8, 1)
        shi = np.asarray(supers[3 + axis])[:, None].repeat(8, 1)
        assert (clo[real] >= slo[real] - 1e-4).all()
        assert (chi[real] <= shi[real] + 1e-4).all()


def test_pallas_10k_scene_interpret():
    """The two-level path renders a 10k-sphere scene correctly (tiny)."""
    import jax

    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
    from weekend_raytracer_tpu.ops.pallas.megakernel import render_image_pallas
    from weekend_raytracer_tpu.ops.tracer import render_image

    w, h = 32, 16
    desc = scenes.random_spheres(2000)
    scene = desc.build()
    basis = CameraBasis.create(scenes.random_spheres_camera(), (w, h))
    sky = to_sky_state(SkyParams())
    # Dense-silhouette scene: the kernel's expanded quadratic and the XLA
    # path's oc-form differ by ulps at |c|^2 ~ 1e8, so per-sample paths
    # diverge chaotically at sphere edges — compare statistically.
    from weekend_raytracer_tpu.ops.tonemap import to_srgb_u8

    def run(fn):
        acc = jnp.zeros((w * h, 3), jnp.float32)
        frames, spp = 8, 4
        for f in range(frames):
            acc = fn(acc, jnp.uint32(f), jnp.bool_(f == 0), scene, sky,
                     basis, width=w, height=h, spp=spp, num_bounces=4)
        return np.asarray(acc) / (frames * spp)

    a = run(render_image)
    b = run(render_image_pallas)
    ta = np.asarray(to_srgb_u8(a.reshape(h, w, 3))).astype(np.float32) / 255
    tb = np.asarray(to_srgb_u8(b.reshape(h, w, 3))).astype(np.float32) / 255
    rmse = float(np.sqrt(((ta - tb) ** 2).mean()))
    assert rmse < 0.02, rmse


def test_super_bounds_padding_is_degenerate_far_box():
    """Pad chunks must be zero-extent far boxes (lo == hi == 1e9), never
    inverted boxes: the kernel slab test min/max-normalizes an inverted
    box into an infinite one that always passes, making the sweep read
    sphere attributes out of bounds on real TPU SMEM (review finding)."""
    attrs = _attrs(330)  # 330/32 -> 11 chunks, padded to 16 for factor 8
    scene = build_chunks(attrs, 32)
    padded, supers = super_bounds(scene, 8)
    nc_real = scene.bounds[0].shape[0]
    for lo_arr, hi_arr in zip(padded[:3], padded[3:]):
        lo_pad = np.asarray(lo_arr)[nc_real:]
        hi_pad = np.asarray(hi_arr)[nc_real:]
        assert (lo_pad == hi_pad).all()
        assert (lo_pad >= 1e8).all()
