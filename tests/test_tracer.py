"""End-to-end tracer tests: oracle parity, physics sanity, determinism."""
import jax.numpy as jnp
import numpy as np
import pytest

from weekend_raytracer_tpu import (
    Camera,
    CameraBasis,
    Material,
    RenderParams,
    Renderer,
    SamplingParams,
    SceneDesc,
    Sphere,
    render_image,
)
from weekend_raytracer_tpu.models import scenes
from weekend_raytracer_tpu.models.sky import SkyState
from weekend_raytracer_tpu.ops.tracer import render_pixels

from oracle_np import OracleTracer


def _constant_sky(rgb=(1.0, 1.0, 1.0)):
    params = np.zeros((3, 9), np.float32)
    params[:, 2] = 1.0
    return SkyState.from_raw(params, np.asarray(rgb), np.array([0.0, 1.0, 0.0]))


def _render_xla(desc, cam, w, h, spp, bounces, sky=None, frame=0):
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state

    scene = desc.build()
    basis = CameraBasis.create(cam, (w, h))
    sky = sky if sky is not None else to_sky_state(SkyParams())
    idx = jnp.arange(w * h, dtype=jnp.int32)
    acc = render_pixels(idx, jnp.uint32(frame), scene, sky, basis, w, h,
                        spp, bounces)
    return np.asarray(acc).reshape(h, w, 3)


def _rmse(a, b):
    return float(np.sqrt(np.mean((a - b) ** 2)))


def _assert_oracle_match(got, want, close_frac=0.98):
    """MC paths diverge chaotically at isolated pixels under any last-ulp
    backend difference (fusion, FMA); assert that the overwhelming majority
    of pixels are float-precision identical and the rest are bounded."""
    close = np.isclose(got, want, rtol=1e-2, atol=1e-3).all(axis=-1)
    assert close.mean() > close_frac, close.mean()
    assert _rmse(got[close], want[close]) < 1e-4


@pytest.mark.parametrize("name,w,h", [("single", 40, 24), ("three", 40, 24)])
def test_matches_numpy_oracle(name, w, h):
    """Golden-image parity with the independent NumPy oracle (bit-matched
    RNG, so tolerances are float-precision only)."""
    desc = scenes.SCENES[name][0]()
    cam = scenes.SCENES[name][1]()
    spp, bounces = 4, 6
    got = _render_xla(desc, cam, w, h, spp, bounces) / spp
    oracle = OracleTracer(desc, cam, w, h)
    want = oracle.render(spp, bounces) / spp
    _assert_oracle_match(got, want)


def test_matches_oracle_with_image_textures():
    desc = scenes.textured_spheres()
    cam = scenes.textured_spheres_camera()
    got = _render_xla(desc, cam, 32, 18, 2, 4) / 2
    oracle = OracleTracer(desc, cam, 32, 18)
    want = oracle.render(2, 4) / 2
    _assert_oracle_match(got, want)


def test_furnace_white_lambertian():
    """A white lambertian sphere under a constant unit sky keeps radiance
    near 1 (energy conservation; slightly under due to bounce truncation)."""
    desc = SceneDesc(
        materials=[Material.lambertian((1.0, 1.0, 1.0))],
        spheres=[Sphere((0.0, 0.0, -2.0), 1.0, 0)],
    )
    cam = Camera.look_at((0, 0, 1), (0, 0, -2), vfov_degrees=25.0)
    img = _render_xla(desc, cam, 32, 32, 64, 32, sky=_constant_sky()) / 64
    center = img[12:20, 12:20]  # sphere interior pixels
    assert center.mean() > 0.93
    assert center.mean() <= 1.01


def test_dark_lambertian_absorbs():
    desc = SceneDesc(
        materials=[Material.lambertian((0.1, 0.1, 0.1))],
        spheres=[Sphere((0.0, 0.0, -2.0), 1.0, 0)],
    )
    cam = Camera.look_at((0, 0, 1), (0, 0, -2), vfov_degrees=25.0)
    img = _render_xla(desc, cam, 32, 32, 16, 8, sky=_constant_sky()) / 16
    assert img[12:20, 12:20].mean() < 0.2


def test_metal_mirror_reflects_sky():
    """A perfect mirror under a constant sky returns exactly the sky color
    scaled by its albedo."""
    desc = SceneDesc(
        materials=[Material.metal((0.8, 0.9, 1.0), fuzz=0.0)],
        spheres=[Sphere((0.0, 0.0, -2.0), 1.0, 0)],
    )
    cam = Camera.look_at((0, 0, 1), (0, 0, -2), vfov_degrees=20.0)
    img = _render_xla(desc, cam, 16, 16, 4, 4, sky=_constant_sky((2.0, 2.0, 2.0))) / 4
    center = img[7, 7]
    np.testing.assert_allclose(center, [1.6, 1.8, 2.0], rtol=1e-3)


def test_deterministic_across_runs():
    desc = scenes.three_spheres()
    cam = scenes.three_spheres_camera()
    a = _render_xla(desc, cam, 24, 16, 2, 4, frame=7)
    b = _render_xla(desc, cam, 24, 16, 2, 4, frame=7)
    np.testing.assert_array_equal(a, b)


def test_frames_differ():
    desc = scenes.three_spheres()
    cam = scenes.three_spheres_camera()
    a = _render_xla(desc, cam, 24, 16, 2, 4, frame=0)
    b = _render_xla(desc, cam, 24, 16, 2, 4, frame=1)
    assert (a != b).any()


def test_pixel_batching_invariant():
    """render_image must give identical results regardless of pixel_batch."""
    desc = scenes.three_spheres()
    cam = scenes.three_spheres_camera()
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state

    scene = desc.build()
    w, h = 32, 16
    basis = CameraBasis.create(cam, (w, h))
    sky = to_sky_state(SkyParams())
    acc0 = jnp.zeros((w * h, 3), jnp.float32)
    full = render_image(acc0, jnp.uint32(0), jnp.bool_(True), scene, sky,
                        basis, w, h, 2, 4, pixel_batch=None)
    batched = render_image(acc0, jnp.uint32(0), jnp.bool_(True), scene, sky,
                           basis, w, h, 2, 4, pixel_batch=128)
    np.testing.assert_allclose(np.asarray(full), np.asarray(batched),
                               rtol=1e-5, atol=1e-6)


def test_sphere_chunking_invariant():
    desc = scenes.rtiow_final()
    cam = scenes.rtiow_final_camera()
    a = _render_xla(desc, cam, 16, 9, 1, 3)
    from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state

    scene = desc.build()
    basis = CameraBasis.create(cam, (16, 9))
    idx = jnp.arange(16 * 9, dtype=jnp.int32)
    b = np.asarray(render_pixels(idx, jnp.uint32(0), scene,
                                 to_sky_state(SkyParams()), basis, 16, 9, 1, 3,
                                 sphere_chunk=64)).reshape(9, 16, 3)
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_emissive_light_terminates_path():
    """A camera ray hitting an emissive sphere returns exactly its
    radiance (throughput 1 at the first bounce) under a black sky."""
    desc = SceneDesc(
        materials=[Material.emissive((1.0, 0.5, 0.25), intensity=6.0)],
        spheres=[Sphere((0.0, 0.0, -3.0), 1.0, 0)],
    )
    cam = Camera.look_at((0, 0, 1), (0, 0, -3), vfov_degrees=10.0)
    img = _render_xla(desc, cam, 16, 16, 4, 8, sky=_constant_sky((0, 0, 0))) / 4
    center = img[8, 8]
    np.testing.assert_allclose(center, [6.0, 3.0, 1.5], rtol=1e-4)


def test_emissive_illuminates_diffuse():
    """A diffuse floor under only an emissive light picks up indirect
    radiance (non-zero) and matches the oracle."""
    desc = SceneDesc(
        materials=[
            Material.lambertian((0.8, 0.8, 0.8)),
            Material.emissive((1.0, 1.0, 1.0), intensity=10.0),
        ],
        spheres=[
            Sphere((0.0, -100.5, 0.0), 100.0, 0),
            Sphere((0.0, 3.0, 0.0), 1.5, 1),
        ],
    )
    cam = Camera.look_at((0, 1.0, 6.0), (0, 0.0, 0.0), vfov_degrees=40.0)
    got = _render_xla(desc, cam, 24, 16, 8, 6, sky=_constant_sky((0, 0, 0))) / 8
    assert got.mean() > 0.05  # light reaches the floor
    oracle = OracleTracer(desc, cam, 24, 16, sky_state=_constant_sky((0, 0, 0)))
    want = oracle.render(8, 6) / 8
    _assert_oracle_match(got, want)
