"""Pallas megakernel vs XLA wavefront equivalence (interpret mode on CPU).

Per-sample Monte-Carlo paths diverge chaotically under any last-ulp float
difference (normalize rounding, fused ops), so equivalence is asserted at
the levels that are stable: bit-exact RNG, deterministic first-hit geometry,
and statistical agreement of converged images (SURVEY.md §4: "Pallas-kernel
vs jitted-JAX equivalence on CPU backend").
"""
import jax.numpy as jnp
import numpy as np
import pytest

from weekend_raytracer_tpu.models import scenes
from weekend_raytracer_tpu.models.camera import CameraBasis
from weekend_raytracer_tpu.models.materials import Material
from weekend_raytracer_tpu.models.sky import SkyParams, SkyState, to_sky_state
from weekend_raytracer_tpu.models.spheres import Sphere
from weekend_raytracer_tpu.models.scenes import SceneDesc
from weekend_raytracer_tpu.ops.pallas.megakernel import acos_approx, render_image_pallas
from weekend_raytracer_tpu.ops.tracer import render_image
from weekend_raytracer_tpu.ops.tonemap import to_srgb_u8


def _setup(name, w, h):
    desc = scenes.SCENES[name][0]()
    cam = scenes.SCENES[name][1]()
    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    sky = to_sky_state(SkyParams())
    return scene, sky, basis


def _run(fn, scene, sky, basis, w, h, frames, spp, bounces, **kw):
    acc = jnp.zeros((w * h, 3), jnp.float32)
    for f in range(frames):
        acc = fn(acc, jnp.uint32(f), jnp.bool_(f == 0), scene, sky, basis,
                 width=w, height=h, spp=spp, num_bounces=bounces, **kw)
    return np.asarray(acc) / (frames * spp)


def test_acos_approx_accuracy():
    x = np.linspace(-1.0, 1.0, 4001)
    got = np.asarray(acos_approx(jnp.asarray(x, jnp.float32)))
    err = np.abs(got - np.arccos(x))
    assert err.max() < 2e-4


@pytest.mark.parametrize("name", ["three", "rtiow"])
def test_statistical_equivalence(name):
    w, h = 48, 32
    scene, sky, basis = _setup(name, w, h)
    a = _run(render_image, scene, sky, basis, w, h, frames=8, spp=4, bounces=8)
    b = _run(render_image_pallas, scene, sky, basis, w, h, frames=8, spp=4,
             bounces=8)
    ta = np.asarray(to_srgb_u8(a.reshape(h, w, 3))).astype(np.float32) / 255
    tb = np.asarray(to_srgb_u8(b.reshape(h, w, 3))).astype(np.float32) / 255
    rmse = float(np.sqrt(((ta - tb) ** 2).mean()))
    assert rmse < 5e-3, rmse
    # linear-space mean radiance agreement
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 1e-3


def test_first_hit_geometry_identical():
    """1 bounce + constant sky + no lens: color is a binary hit/miss mask
    per pixel-sample; both paths must agree except at sub-ulp silhouette
    pixels."""
    desc = SceneDesc(
        materials=[Material.lambertian((0.3, 0.4, 0.5))],
        spheres=[Sphere((0.0, 0.0, -3.0), 1.0, 0)],
    )
    from weekend_raytracer_tpu.models.camera import Camera

    cam = Camera.look_at((0, 0, 1), (0, 0, -3), vfov_degrees=40.0, aperture=0.0)
    w, h = 64, 48
    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    params = np.zeros((3, 9), np.float32)
    params[:, 2] = 1.0
    sky = SkyState.from_raw(params, np.ones(3), np.array([0.0, 1.0, 0.0]))
    a = _run(render_image, scene, sky, basis, w, h, frames=1, spp=1, bounces=1)
    b = _run(render_image_pallas, scene, sky, basis, w, h, frames=1, spp=1,
             bounces=1)
    mismatch = (np.abs(a - b) > 1e-6).any(axis=-1).mean()
    assert mismatch < 0.01, mismatch


def test_accumulation_and_clear_semantics():
    w, h = 32, 16
    scene, sky, basis = _setup("three", w, h)
    acc = jnp.ones((w * h, 3), jnp.float32) * 7.0  # stale data
    out1 = render_image_pallas(acc, jnp.uint32(0), jnp.bool_(True), scene,
                               sky, basis, width=w, height=h, spp=1,
                               num_bounces=2)
    # clear=True must discard the stale 7.0
    assert float(np.asarray(out1).min()) < 1.0
    out2 = render_image_pallas(out1, jnp.uint32(1), jnp.bool_(False), scene,
                               sky, basis, width=w, height=h, spp=1,
                               num_bounces=2)
    # accumulation is additive
    assert float(np.asarray(out2).mean()) > float(np.asarray(out1).mean())


def test_padding_tiles():
    """Pixel counts not divisible by the tile size must round-trip."""
    w, h = 30, 17  # 510 pixels, tile = 1024
    scene, sky, basis = _setup("single", w, h)
    out = render_image_pallas(
        jnp.zeros((w * h, 3), jnp.float32), jnp.uint32(0), jnp.bool_(True),
        scene, sky, basis, width=w, height=h, spp=1, num_bounces=2,
    )
    assert out.shape == (w * h, 3)
    assert bool(jnp.isfinite(out).all())


def test_renderer_pallas_backend():
    from weekend_raytracer_tpu import RenderParams, Renderer, SamplingParams

    params = RenderParams(
        camera=scenes.three_spheres_camera(),
        viewport_size=(32, 18),
        sampling=SamplingParams(max_samples_per_pixel=4,
                                num_samples_per_pixel=2, num_bounces=4),
    )
    r = Renderer(scenes.three_spheres(), params, backend="pallas")
    stats = r.render()
    assert stats.samples_per_pixel == 4
    img = r.image()
    assert img.shape == (18, 32, 3)


def test_emissive_in_kernel():
    """Emissive termination matches the XLA path in the fused kernel."""
    from weekend_raytracer_tpu.models.camera import Camera

    desc = SceneDesc(
        materials=[
            Material.lambertian((0.7, 0.7, 0.7)),
            Material.emissive((1.0, 0.8, 0.5), intensity=8.0),
        ],
        spheres=[
            Sphere((0.0, -100.5, 0.0), 100.0, 0),
            Sphere((0.0, 2.5, 0.0), 1.0, 1),
        ],
    )
    cam = Camera.look_at((0, 1.5, 5.0), (0, 1.0, 0.0), vfov_degrees=45.0)
    w, h = 48, 32
    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    params = np.zeros((3, 9), np.float32)
    params[:, 2] = 1.0
    sky = SkyState.from_raw(params, np.zeros(3), np.array([0.0, 1.0, 0.0]))
    a = _run(render_image, scene, sky, basis, w, h, frames=8, spp=4, bounces=6)
    b = _run(render_image_pallas, scene, sky, basis, w, h, frames=8, spp=4,
             bounces=6)
    assert a.mean() > 0.01  # the light illuminates the scene
    # silhouette pixels of the bright light flip hit/miss chaotically at
    # low spp; compare the mean and the non-silhouette body of the image
    assert abs(a.mean() - b.mean()) / a.mean() < 0.02
    diff = np.abs(a - b).max(axis=-1)
    body = diff < 0.5  # exclude light-edge outlier pixels
    assert body.mean() > 0.90
    ta = np.asarray(to_srgb_u8(a.reshape(h, w, 3))).astype(np.float32) / 255
    tb = np.asarray(to_srgb_u8(b.reshape(h, w, 3))).astype(np.float32) / 255
    # A small bright light is a high-variance integrand: once paths
    # diverge at its silhouette the two 64-sample estimates are
    # quasi-independent, so allow Monte-Carlo-level deviation.
    rmse = float(np.sqrt(((ta - tb)[body.reshape(h, w)] ** 2).mean()))
    assert rmse < 0.08, rmse


@pytest.mark.parametrize("seed", [11, 29])
def test_random_scene_fuzz_equivalence(seed):
    """Randomized small scenes (all material kinds, random geometry) must
    agree statistically between the fused kernel and the XLA path."""
    rs = np.random.RandomState(seed)
    materials = [
        Material.checkerboard(tuple(rs.rand(3)), tuple(rs.rand(3))),
        Material.dielectric(1.3 + 0.4 * rs.rand()),
        Material.emissive(tuple(0.5 + 0.5 * rs.rand(3)), intensity=3.0),
    ]
    spheres = [Sphere((0.0, -200.5, 0.0), 200.0, 0)]
    for i in range(40):
        materials.append(
            Material.metal(tuple(rs.rand(3)), fuzz=0.5 * rs.rand())
            if rs.rand() < 0.3 else Material.lambertian(tuple(rs.rand(3)))
        )
        spheres.append(Sphere(
            (float(rs.uniform(-6, 6)), float(rs.uniform(0.2, 1.0)),
             float(rs.uniform(-6, 6))),
            float(rs.uniform(0.15, 0.6)), 3 + i))
    spheres.append(Sphere((0.0, 4.0, 0.0), 1.0, 2))  # the light
    desc = SceneDesc(materials=materials, spheres=spheres)

    from weekend_raytracer_tpu.models.camera import Camera

    cam = Camera.look_at((0, 2.5, 9.0), (0, 0.5, 0), vfov_degrees=45.0,
                         aperture=0.05, focus_distance=9.0)
    w, h = 48, 32
    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    sky = to_sky_state(SkyParams(turbidity=3.0 + 4.0 * rs.rand(),
                                 zenith_degrees=float(rs.uniform(20, 80))))
    a = _run(render_image, scene, sky, basis, w, h, frames=8, spp=4, bounces=6)
    b = _run(render_image_pallas, scene, sky, basis, w, h, frames=8, spp=4,
             bounces=6)
    assert abs(a.mean() - b.mean()) / max(a.mean(), 1e-6) < 0.03
    diff = np.abs(a - b).max(axis=-1)
    assert (diff < 0.5).mean() > 0.9  # body agrees; silhouettes may flip


@pytest.mark.parametrize("tsub,block_w", [(8, 32), (16, 64)])
def test_tiling_parameter_smoke(tsub, block_w):
    """Non-default tile shapes must render correctly (lane<->pixel mapping
    and padding are tiling-dependent)."""
    w, h = 40, 28
    scene, sky, basis = _setup("three", w, h)
    out = render_image_pallas(
        jnp.zeros((w * h, 3), jnp.float32), jnp.uint32(0), jnp.bool_(True),
        scene, sky, basis, width=w, height=h, spp=1, num_bounces=3,
        tsub=tsub, block_w=block_w,
    )
    ref = render_image(
        jnp.zeros((w * h, 3), jnp.float32), jnp.uint32(0), jnp.bool_(True),
        scene, sky, basis, width=w, height=h, spp=1, num_bounces=3,
    )
    close = np.isclose(np.asarray(out), np.asarray(ref),
                       rtol=1e-2, atol=1e-3).all(-1)
    assert close.mean() > 0.97, close.mean()


def test_megakernel_stats_output():
    """stats=True returns per-tile instrumentation without changing the
    image (used by benchmarks/kernel_stats.py for perf analysis)."""
    import jax.numpy as jnp

    from weekend_raytracer_tpu.models import scenes
    from weekend_raytracer_tpu.models.camera import CameraBasis
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
    from weekend_raytracer_tpu.ops.pallas.megakernel import render_image_pallas

    w, h = 128, 72
    scene = scenes.rtiow_final().build()
    basis = CameraBasis.create(scenes.rtiow_final_camera(), (w, h))
    sky = to_sky_state(SkyParams())
    acc = jnp.zeros((w * h, 3), jnp.float32)
    args = (acc, jnp.uint32(0), jnp.bool_(True), scene, sky, basis)
    kw = dict(width=w, height=h, spp=2, num_bounces=8)
    img_stats, st = render_image_pallas(*args, stats=True, **kw)
    img = render_image_pallas(*args, **kw)
    np.testing.assert_array_equal(np.asarray(img_stats), np.asarray(img))
    st = np.asarray(st)
    assert st.shape[1] == 8
    assert (st[:, 0] >= 1).all() and (st[:, 0] <= 16).all()  # iters
    assert (st[:, 1] > 0).all()  # live-lane sums
    assert (st[:, 2] >= st[:, 0]).all()  # >= 1 chunk per iteration
