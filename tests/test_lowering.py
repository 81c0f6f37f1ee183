"""AOT Mosaic lowering checks (no chip needed).

Interpret-mode tests validate kernel SEMANTICS but never run Mosaic's
MLIR verification — a kernel can pass every interpret test and still
fail to lower on hardware (round 4 caught exactly that: the MXU sweep's
f32 iota was rejected by `tpu.iota` at lowering, which would have
burned an unattended chip-session slot). `jax.export` with
platforms=["tpu"] runs the full Mosaic lowering pipeline locally, so
every knob-combination the chip sessions exercise gets a lowering
gate here.

These are NOT compile tests (no XLA binary is produced) — they verify
the Pallas->Mosaic MLIR stage only, which is where kernel-language
errors surface.
"""
import jax
import jax.numpy as jnp
import pytest
from jax import export

from weekend_raytracer_tpu.models import scenes
from weekend_raytracer_tpu.models.camera import CameraBasis
from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state

W, H = 192, 96


@pytest.fixture(scope="module")
def rtiow():
    scene = scenes.rtiow_final().build()
    basis = CameraBasis.create(scenes.rtiow_final_camera(), (W, H))
    return scene, to_sky_state(SkyParams()), basis


def _export_tpu(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert "tpu_custom_call" in exp.mlir_module()


def test_regroup_mxu_dyn_grid_lowers_for_tpu(rtiow):
    """The most knob-loaded fused config: MXU chunk sweep in K0 AND K1
    plus dynamic grid bounds on pack/K1/combine. One export covers all
    four kernels' Mosaic lowering."""
    from weekend_raytracer_tpu.ops.pallas.regroup import (
        render_image_regrouped,
    )

    scene, sky, basis = rtiow
    accum = jnp.zeros((W * H, 3), jnp.float32)

    def f(accum, frame, clear, scene, sky):
        return render_image_regrouped(
            accum, frame, clear, scene, sky, basis, width=W, height=H,
            spp=8, num_bounces=8, cuts=(2, 4), interpret=False,
            mxu_sweep=True, dyn_grid=True)

    _export_tpu(f, accum, jnp.uint32(0), jnp.asarray(True), scene, sky)


def test_textured_regroup_mxu_lowers_for_tpu():
    """Texture LUT + retrieval LUT + MXU sweep together (the textured
    ladder config's engine with the knob on)."""
    from weekend_raytracer_tpu.ops.pallas.regroup import (
        render_image_regrouped,
    )

    scene = scenes.reference_demo().build()
    basis = CameraBasis.create(scenes.reference_demo_camera(), (W, H))
    sky = to_sky_state(SkyParams())
    accum = jnp.zeros((W * H, 3), jnp.float32)

    def f(accum, frame, clear, scene, sky):
        return render_image_regrouped(
            accum, frame, clear, scene, sky, basis, width=W, height=H,
            spp=8, num_bounces=8, cuts=(2,), interpret=False,
            mxu_sweep=True)

    _export_tpu(f, accum, jnp.uint32(0), jnp.asarray(True), scene, sky)
