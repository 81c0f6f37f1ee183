"""AOT Mosaic lowering checks (no chip needed).

Interpret-mode tests validate kernel SEMANTICS but never run Mosaic's
MLIR verification — a kernel can pass every interpret test and still
fail to lower on hardware (round 4 caught exactly that: the MXU sweep's
f32 iota was rejected by `tpu.iota` at lowering, which would have
burned an unattended chip-session slot). `jax.export` with
platforms=["tpu"] runs the full Mosaic lowering pipeline locally, so
every knob-combination the chip sessions exercise gets a lowering
gate here.

Each export runs in a SUBPROCESS: the TPU lowering machinery must not
share a process with the interpret-mode tests (a full-suite run with
in-process exports segfaulted later CPU executions twice, round 4),
and isolation also keeps the gate honest about import-time state.

These are NOT compile tests (no XLA binary is produced) — they verify
the Pallas->Mosaic MLIR stage only, which is where kernel-language
errors surface.
"""
import subprocess
import sys

_PRELUDE = """
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from jax import export
from weekend_raytracer_tpu.models import scenes
from weekend_raytracer_tpu.models.camera import CameraBasis
from weekend_raytracer_tpu.models.sky import SkyParams, to_sky_state
from weekend_raytracer_tpu.ops.pallas.regroup import render_image_regrouped

W, H = 192, 96


def export_tpu(fn, *args):
    exp = export.export(jax.jit(fn), platforms=["tpu"])(*args)
    assert "tpu_custom_call" in exp.mlir_module()
"""


def _run(body: str) -> None:
    proc = subprocess.run((sys.executable, "-c", _PRELUDE + body),
                          capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stderr[-3000:]


def test_regroup_mxu_dyn_grid_lowers_for_tpu():
    """The most knob-loaded fused config: MXU chunk sweep in K0 AND K1,
    dynamic grid bounds on pack/K1/combine, the windowed-matmul combine
    level, and the matmul-merge pack. One export covers all four
    kernels' Mosaic lowering (the v1 combine/pack kernels keep their
    gate via the textured test below)."""
    _run("""
scene = scenes.rtiow_final().build()
basis = CameraBasis.create(scenes.rtiow_final_camera(), (W, H))
sky = to_sky_state(SkyParams())
accum = jnp.zeros((W * H, 3), jnp.float32)


def f(accum, frame, clear, scene, sky):
    return render_image_regrouped(
        accum, frame, clear, scene, sky, basis, width=W, height=H,
        spp=8, num_bounces=8, cuts=(2, 4), interpret=False,
        mxu_sweep=True, dyn_grid=True, combine_v2=True, pack_v2=True)


export_tpu(f, accum, jnp.uint32(0), jnp.asarray(True), scene, sky)
""")


def test_textured_regroup_mxu_lowers_for_tpu():
    """Texture LUT + retrieval LUT + MXU sweep together (the textured
    ladder config's engine with the knob on)."""
    _run("""
scene = scenes.reference_demo().build()
basis = CameraBasis.create(scenes.reference_demo_camera(), (W, H))
sky = to_sky_state(SkyParams())
accum = jnp.zeros((W * H, 3), jnp.float32)


def f(accum, frame, clear, scene, sky):
    return render_image_regrouped(
        accum, frame, clear, scene, sky, basis, width=W, height=H,
        spp=8, num_bounces=8, cuts=(2,), interpret=False,
        mxu_sweep=True)


export_tpu(f, accum, jnp.uint32(0), jnp.asarray(True), scene, sky)
""")


def test_skip_dead_regroup_lowers_for_tpu():
    """skip_dead's indirect pack + indirect final-combine kernels (the
    prefetched live-tile-list block maps) must pass Mosaic lowering
    before any chip session prices the knob (repo rule: AOT-lower every
    new kernel/knob at production shapes before queueing chip time)."""
    _run("""
scene = scenes.rtiow_final().build()
basis = CameraBasis.create(scenes.rtiow_final_camera(), (W, H))
sky = to_sky_state(SkyParams())
accum = jnp.zeros((W * H, 3), jnp.float32)


def f(accum, frame, clear, scene, sky):
    return render_image_regrouped(
        accum, frame, clear, scene, sky, basis, width=W, height=H,
        spp=8, num_bounces=8, cuts=(2, 4), interpret=False,
        dyn_grid=True, skip_dead=True)


export_tpu(f, accum, jnp.uint32(0), jnp.asarray(True), scene, sky)
""")


def test_rowsweep_regroup_lowers_for_tpu():
    """Row-granular K1 traversal (round 5): the per-row mask roll
    reductions, rank-select binary search, one-hot table matmul, and
    constant-index lane gathers must all pass Mosaic lowering at a
    production-shaped config before any chip session prices the knob."""
    _run("""
scene = scenes.rtiow_final().build()
basis = CameraBasis.create(scenes.rtiow_final_camera(), (W, H))
sky = to_sky_state(SkyParams())
accum = jnp.zeros((W * H, 3), jnp.float32)


def f(accum, frame, clear, scene, sky):
    return render_image_regrouped(
        accum, frame, clear, scene, sky, basis, width=W, height=H,
        spp=8, num_bounces=8, cuts=(2, 4), interpret=False,
        dyn_grid=True, rowsweep=True, rowsweep_k0=True, k1_tsub=8,
        k1_chunk_size=8)


export_tpu(f, accum, jnp.uint32(0), jnp.asarray(True), scene, sky)
""")
