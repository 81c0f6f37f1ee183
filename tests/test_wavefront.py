"""Compacted-wavefront tracer tests (interpret mode on CPU).

The load-bearing property is phase invariance: compacting/regrouping live
rays between bounce phases must not change a single bit of any pixel —
guaranteed by per-(pixel,sample) RNG seeding and row-granular records.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from weekend_raytracer_tpu.models import scenes
from weekend_raytracer_tpu.models.camera import CameraBasis
from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
from weekend_raytracer_tpu.ops.pallas.megakernel import render_image_pallas
from weekend_raytracer_tpu.ops.pallas.wavefront import render_image_wavefront
from weekend_raytracer_tpu.ops.tracer import render_image

W, H = 96, 40


@pytest.fixture(scope="module")
def rtiow():
    scene = scenes.rtiow_final().build()
    basis = CameraBasis.create(scenes.rtiow_final_camera(), (W, H))
    return scene, to_sky_state(SkyParams()), basis


def _args(scene, sky, basis, frame=0, clear=True):
    acc = jnp.zeros((W * H, 3), jnp.float32)
    return (acc, jnp.uint32(frame), jnp.bool_(clear), scene, sky, basis)


def test_wavefront_phase_invariance(rtiow):
    """Any compaction schedule — including none — produces bit-identical
    images: regrouping only changes *which tile* executes a ray."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=8)
    ref = np.asarray(render_image_wavefront(*_args(scene, sky, basis),
                                            phase_cuts=(), **kw))
    for cuts in [(2,), (4,), (2, 4), (1, 2, 3, 4, 5, 6, 7)]:
        out = np.asarray(render_image_wavefront(*_args(scene, sky, basis),
                                                phase_cuts=cuts, **kw))
        np.testing.assert_array_equal(out, ref, err_msg=str(cuts))


def test_wavefront_matches_megakernel(rtiow):
    """Same physics code as the fused megakernel -> near-bitwise agreement
    (different spp layout reorders the 4-sample sum, so last-ulp only)."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=8)
    wf = np.asarray(render_image_wavefront(*_args(scene, sky, basis),
                                           phase_cuts=(2,), **kw))
    mk = np.asarray(render_image_pallas(*_args(scene, sky, basis), **kw))
    assert np.isclose(wf, mk, rtol=1e-3, atol=1e-4).all(-1).mean() > 0.999
    assert abs(wf.mean() - mk.mean()) / mk.mean() < 1e-4


def test_wavefront_matches_xla(rtiow):
    """Statistical agreement with the independent XLA wavefront (different
    intersection formulation -> silhouette samples may flip)."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=4, num_bounces=8)
    wf = np.asarray(render_image_wavefront(*_args(scene, sky, basis),
                                           phase_cuts=(2,), **kw))
    xla = np.asarray(render_image(*_args(scene, sky, basis), **kw))
    close = np.isclose(wf, xla, rtol=1e-2, atol=1e-3).all(-1)
    assert close.mean() > 0.95, close.mean()
    assert abs(wf.mean() - xla.mean()) / xla.mean() < 5e-3


def test_wavefront_small_scene_and_spp():
    """Unculled sweep path (5 spheres) + spp=2 lane folding."""
    scene = scenes.three_spheres().build()
    basis = CameraBasis.create(scenes.three_spheres_camera(), (W, H))
    sky = to_sky_state(SkyParams())
    kw = dict(width=W, height=H, spp=2, num_bounces=6)
    wf = np.asarray(render_image_wavefront(*_args(scene, sky, basis),
                                           phase_cuts=(3,), **kw))
    mk = np.asarray(render_image_pallas(*_args(scene, sky, basis), **kw))
    assert np.isfinite(wf).all()
    assert np.isclose(wf, mk, rtol=1e-3, atol=1e-4).all(-1).mean() > 0.999


def test_wavefront_progressive_accumulation(rtiow):
    """clear=False adds onto the incoming accumulator."""
    scene, sky, basis = rtiow
    kw = dict(width=W, height=H, spp=2, num_bounces=4, phase_cuts=(2,))
    f0 = render_image_wavefront(*_args(scene, sky, basis, frame=0), **kw)
    f01 = render_image_wavefront(
        f0, jnp.uint32(1), jnp.bool_(False), scene, sky, basis, **kw)
    f1 = np.asarray(render_image_wavefront(
        *_args(scene, sky, basis, frame=1), **kw))
    np.testing.assert_allclose(np.asarray(f01), np.asarray(f0) + f1,
                               rtol=1e-5, atol=1e-5)


def test_wavefront_rejects_bad_spp(rtiow):
    scene, sky, basis = rtiow
    with pytest.raises(ValueError):
        render_image_wavefront(*_args(scene, sky, basis), width=W, height=H,
                               spp=3, num_bounces=4)
