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
    # chunk bounds contain every member sphere entirely
    nc = s // cs
    cx = np.asarray(scene.attrs[0]).reshape(nc, cs)
    cy = np.asarray(scene.attrs[1]).reshape(nc, cs)
    cz = np.asarray(scene.attrs[2]).reshape(nc, cs)
    cr = np.asarray(scene.attrs[3]).reshape(nc, cs)
    d = np.sqrt((cx - np.asarray(scene.chunk_cx)[:, None]) ** 2
                + (cy - np.asarray(scene.chunk_cy)[:, None]) ** 2
                + (cz - np.asarray(scene.chunk_cz)[:, None]) ** 2)
    assert ((d + np.abs(cr)) ** 2 <= np.asarray(scene.chunk_r2)[:, None] * (1 + 1e-5)).all()


def test_front_to_back_ordering():
    attrs = _attrs(256)
    scene = build_chunks(attrs, 32)
    eye = jnp.array([0.0, 0.0, -50.0])
    ordered = order_front_to_back(scene, eye, 32)
    d2 = (np.asarray(ordered.chunk_cx) - 0.0) ** 2 + \
         (np.asarray(ordered.chunk_cy)) ** 2 + \
         (np.asarray(ordered.chunk_cz) + 50.0) ** 2
    assert (np.diff(d2) >= -1e-3).all()
    # same sphere set, same chunk bound multiset
    np.testing.assert_allclose(
        sorted(np.asarray(scene.chunk_r2).tolist()),
        sorted(np.asarray(ordered.chunk_r2).tolist()), rtol=1e-6)


def test_super_bounds_conservative():
    attrs = _attrs(1024)
    scene = build_chunks(attrs, 32)
    (ccx, ccy, ccz, cr2), (sx, sy, sz, sr2) = super_bounds(scene, 8)
    assert ccx.shape[0] % 8 == 0
    nsc = ccx.shape[0] // 8
    gx = np.asarray(ccx).reshape(nsc, 8)
    gy = np.asarray(ccy).reshape(nsc, 8)
    gz = np.asarray(ccz).reshape(nsc, 8)
    gr = np.sqrt(np.asarray(cr2).reshape(nsc, 8))
    d = np.sqrt((gx - np.asarray(sx)[:, None]) ** 2
                + (gy - np.asarray(sy)[:, None]) ** 2
                + (gz - np.asarray(sz)[:, None]) ** 2)
    # skip padded far chunks (radius 0 at 1e9) for containment check of
    # real chunks only
    real = gr > 0
    lhs = (d + gr) ** 2
    assert (lhs[real] <= (np.asarray(sr2)[:, None] * (1 + 1e-5)).repeat(8, 1)[real]).all()


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
