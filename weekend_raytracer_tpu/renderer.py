"""Progressive renderer: accumulation state machine + jitted frame steps.

Capability parity with the reference's ``Raytracer`` orchestrator
(src/raytracer/mod.rs:20-394) and ``RenderProgress`` (mod.rs:615-679):

 - per-frame progressive sample accumulation into a persistent device
   buffer (the reference's image storage buffer, mod.rs:76-85);
 - three-state progress machine: first-frame clear / accumulating / done
   (mod.rs:626-670), driving how many samples each frame contributes;
 - validated parameter updates with change detection: a changed parameter
   bundle re-derives the camera basis + sky state and resets accumulation
   (set_render_params, mod.rs:353-388);
 - progress = accumulated / max samples (mod.rs:390-394).

TPU design: the accumulator lives in HBM as a donated f32 array — it never
returns to the host except for display (the reference's "accumulator never
leaves the device", SURVEY.md §3.3). One jitted step function per
(viewport, spp, bounces, backend) signature renders a whole frame.
"""
from __future__ import annotations

import dataclasses
import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .models.camera import CameraBasis
from .models.params import RenderParams
from .models.scenes import SceneDesc
from .models.sky import to_sky_state
from .ops import tonemap
from .ops.tracer import Scene, render_image


@dataclasses.dataclass
class GpuSamplingParams:
    """Per-frame sampling state handed to the device step (reference
    GpuSamplingParams, mod.rs:898-906)."""

    num_samples_per_pixel: int
    num_bounces: int
    accumulated_samples_per_pixel: int
    clear_accumulated_samples: bool


class RenderProgress:
    """The 3-state accumulation machine (reference mod.rs:615-679)."""

    def __init__(self):
        self._accumulated = 0

    def next_frame(self, sampling) -> GpuSamplingParams:
        current = self._accumulated
        nxt = current + sampling.num_samples_per_pixel
        if current == 0:
            self._accumulated = nxt
            return GpuSamplingParams(
                sampling.num_samples_per_pixel, sampling.num_bounces, nxt, True
            )
        if nxt <= sampling.max_samples_per_pixel:
            self._accumulated = nxt
            return GpuSamplingParams(
                sampling.num_samples_per_pixel, sampling.num_bounces, nxt, False
            )
        return GpuSamplingParams(0, sampling.num_bounces, current, False)

    def reset(self) -> None:
        self._accumulated = 0

    def accumulated_samples(self) -> int:
        return self._accumulated


def _default_pixel_batch(n_pixels: int) -> Optional[int]:
    """Pick a pixel batch bounding the [lanes x sphere_chunk] intersect
    intermediates on the XLA path (render_image pads non-divisible sizes)."""
    if n_pixels <= (1 << 17):
        return None
    return 1 << 16


class Renderer:
    """Owns device scene state and renders progressive frames.

    Parameters
    ----------
    scene : SceneDesc or prebuilt ops.tracer.Scene
    params : RenderParams (validated on construction and on update)
    backend : "xla" (wavefront jitted tracer) or "pallas" (fused kernel)
    """

    def __init__(self, scene, params: RenderParams, backend: str = "auto"):
        from .utils.cache import enable_persistent_cache

        enable_persistent_cache()
        params.validate()
        if isinstance(scene, SceneDesc):
            self._scene_desc = scene
            self._scene: Scene = scene.build()
        else:
            self._scene_desc = None
            self._scene = scene
        if backend == "auto":
            # The fused kernel handles solid/procedural materials; image
            # textures need the gathering XLA path.
            backend = "pallas" if self._scene.materials.all_solid else "xla"
        self.backend = backend
        self._params = params
        self._progress = RenderProgress()
        self._frame_number = 0
        self._derive_device_state()
        self._alloc_accumulator()
        self._step_cache = {}

    # -- state derivation ---------------------------------------------------

    def _derive_device_state(self) -> None:
        self._basis = CameraBasis.create(self._params.camera, self._params.viewport_size)
        self._sky = to_sky_state(self._params.sky)

    def _alloc_accumulator(self) -> None:
        w, h = self._params.viewport_size
        self._accum = jnp.zeros((w * h, 3), dtype=jnp.float32)

    # -- parameter updates (reference mod.rs:353-388) ------------------------

    @property
    def params(self) -> RenderParams:
        return self._params

    def set_render_params(self, params: RenderParams) -> bool:
        """Validate + apply; any change resets accumulation. Returns True
        if the params actually changed (reference early-outs on equality)."""
        if params == self._params:
            return False
        params.validate()
        resize = params.viewport_size != self._params.viewport_size
        self._params = params
        self._derive_device_state()
        if resize:
            self._alloc_accumulator()
        self._progress.reset()
        return True

    # -- progressive rendering ----------------------------------------------

    def _get_step(self, spp: int, bounces: int):
        w, h = self._params.viewport_size
        n_spheres = int(self._scene.spheres.centers.shape[0])
        key = (self.backend, w, h, spp, bounces, n_spheres)
        if key not in self._step_cache:
            if self.backend == "pallas":
                from .ops.pallas.megakernel import render_image_pallas

                fn = partial(
                    render_image_pallas,
                    width=w,
                    height=h,
                    spp=spp,
                    num_bounces=bounces,
                )
            else:
                fn = partial(
                    render_image,
                    width=w,
                    height=h,
                    spp=spp,
                    num_bounces=bounces,
                    pixel_batch=_default_pixel_batch(w * h),
                )
            self._step_cache[key] = jax.jit(fn, donate_argnums=(0,))
        return self._step_cache[key]

    def render_frame(self) -> bool:
        """Render one progressive frame; returns False when converged
        (the reference's 0-spp 'done' state skips device work)."""
        gpu = self._progress.next_frame(self._params.sampling)
        if gpu.num_samples_per_pixel == 0:
            return False
        step = self._get_step(gpu.num_samples_per_pixel, gpu.num_bounces)
        self._accum = step(
            self._accum,
            jnp.uint32(self._frame_number),
            jnp.bool_(gpu.clear_accumulated_samples),
            self._scene,
            self._sky,
            self._basis,
        )
        self._frame_number += 1
        return True

    def sync(self) -> None:
        """Drain queued device work. A tiny readback is used in addition to
        block_until_ready because some PJRT transports (the axon tunnel)
        only guarantee completion on transfer."""
        self._accum.block_until_ready()
        np.asarray(self._accum[:1])

    def render(self, block: bool = True) -> "RenderStats":
        """Render until converged (max spp reached); returns timing stats."""
        t0 = time.perf_counter()
        frames = 0
        while self.render_frame():
            frames += 1
        if block:
            self.sync()
        dt = time.perf_counter() - t0
        w, h = self._params.viewport_size
        s = self._params.sampling
        rays = w * h * self._progress.accumulated_samples() * s.num_bounces
        return RenderStats(
            frames=frames,
            seconds=dt,
            samples_per_pixel=self._progress.accumulated_samples(),
            rays=rays,
            rays_per_sec=rays / dt if dt > 0 else 0.0,
        )

    def progress(self) -> float:
        """Fraction of max spp accumulated (reference mod.rs:390-394)."""
        return (
            self._progress.accumulated_samples()
            / self._params.sampling.max_samples_per_pixel
        )

    def accumulated_samples(self) -> int:
        return self._progress.accumulated_samples()

    # -- checkpoint / resume (SURVEY.md §5: the accumulator + sample count
    # are the render's whole persistent state; the reference keeps them
    # only in GPU memory across frames, mod.rs:615-679) ----------------------

    def save_checkpoint(self, path: str) -> None:
        """Persist the progressive render state to an .npz file."""
        np.savez_compressed(
            path,
            accum=np.asarray(self._accum),
            accumulated_spp=np.int64(self._progress.accumulated_samples()),
            frame_number=np.int64(self._frame_number),
            viewport=np.asarray(self._params.viewport_size, dtype=np.int64),
        )

    def load_checkpoint(self, path: str) -> None:
        """Resume a progressive render saved by save_checkpoint.

        The checkpoint must match the current viewport; parameter changes
        after resume behave exactly like live changes (reset on change).
        """
        data = np.load(path)
        vp = tuple(int(v) for v in data["viewport"])
        if vp != tuple(self._params.viewport_size):
            raise ValueError(
                f"checkpoint viewport {vp} != current {self._params.viewport_size}"
            )
        self._accum = jnp.asarray(data["accum"])
        self._progress._accumulated = int(data["accumulated_spp"])
        self._frame_number = int(data["frame_number"])

    # -- readback ------------------------------------------------------------

    def mean_radiance(self) -> jnp.ndarray:
        """Accumulator / sample count as [H, W, 3] (pre-tonemap)."""
        w, h = self._params.viewport_size
        n = max(1, self._progress.accumulated_samples())
        return (self._accum / n).reshape(h, w, 3)

    def image(self) -> np.ndarray:
        """Tonemapped sRGB uint8 frame [H, W, 3] (the swapchain output:
        uncharted2 of the running mean, wgsl:75-80)."""
        return np.asarray(tonemap.to_srgb_u8(self.mean_radiance()))


@dataclasses.dataclass(frozen=True)
class RenderStats:
    frames: int
    seconds: float
    samples_per_pixel: int
    rays: int
    rays_per_sec: float
