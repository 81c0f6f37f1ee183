"""Multi-chip rendering: pixel-tile + sample sharding over a device mesh.

The reference is single-process/single-GPU — its only "parallelism" is the
implicit one-fragment-per-pixel SIMT dispatch (SURVEY.md §2 checklist). The
TPU-native scaling story replaces that with an explicit 2D ``jax.sharding``
mesh:

 - ``tiles`` axis (data parallel over pixels): the image rows and the
   persistent accumulator are sharded; each chip owns its tile's
   accumulator for the whole progressive render, so no pixel data ever
   moves between chips (pixels are independent).
 - ``spp`` axis (sample parallel): chips along this axis draw decorrelated
   sample batches for the *same* pixels and merge via one ``psum`` over ICI
   — the Ulysses-style alternative noted in SURVEY.md §5.

Collectives ride ICI inside a pod slice; for multi-host deployments
initialize ``jax.distributed`` first and pass the global mesh — the code
below only sees mesh axes. Host transfer remains display-only (tonemapped
frames), mirroring the reference's accumulator-never-leaves-device design.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.camera import CameraBasis
from ..models.sky import SkyState
from ..ops.tracer import Scene, render_pixels

TILE_AXIS = "tiles"
SPP_AXIS = "spp"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    tile_shards: Optional[int] = None,
    spp_shards: int = 1,
) -> Mesh:
    """Build a (tiles, spp) mesh. Defaults to all devices on the tile axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile_shards is None:
        tile_shards = n // spp_shards
    assert tile_shards * spp_shards == n, (tile_shards, spp_shards, n)
    arr = np.asarray(devices).reshape(tile_shards, spp_shards)
    return Mesh(arr, (TILE_AXIS, SPP_AXIS))


def render_image_sharded(
    accum: jnp.ndarray,  # [H*W, 3], sharded over rows on the tile axis
    frame: jnp.ndarray,  # u32 scalar
    clear: jnp.ndarray,  # bool scalar
    scene: Scene,  # replicated (scene data is KBs; TP is N/A by design)
    sky: SkyState,
    basis: CameraBasis,
    *,
    width: int,
    height: int,
    spp: int,
    num_bounces: int,
    mesh: Mesh,
    sphere_chunk: int = 512,
    backend: str = "xla",
) -> jnp.ndarray:
    """One progressive frame over the mesh; returns the new accumulator.

    Semantics match ops.tracer.render_image: ``spp`` is the total samples
    per pixel added this frame, split evenly across the spp axis. Sample
    batches on different spp shards are decorrelated by folding the shard
    index into the RNG frame seed.

    backend="pallas" runs the fused megakernel per shard (each chip owns a
    horizontal band of rows; the kernel seeds RNG and aims the camera in
    global image coordinates via its row_offset input). Requires height
    divisible by the tile-axis size and solid-material scenes.
    """
    n_tiles = mesh.shape[TILE_AXIS]
    n_spp = mesh.shape[SPP_AXIS]
    n_pixels = width * height
    assert n_pixels % n_tiles == 0, (n_pixels, n_tiles)
    assert spp % n_spp == 0, (spp, n_spp)
    block = n_pixels // n_tiles
    local_spp = spp // n_spp
    if backend == "pallas":
        assert height % n_tiles == 0, (height, n_tiles)
    block_rows = height // n_tiles if height % n_tiles == 0 else 0

    def shard_fn(accum_blk, frame, clear, scene, sky, basis):
        tile_idx = jax.lax.axis_index(TILE_AXIS)
        spp_idx = jax.lax.axis_index(SPP_AXIS)
        # Decorrelate sample shards: injective (frame, shard) -> seed frame.
        seed_frame = frame * jnp.uint32(n_spp) + spp_idx.astype(jnp.uint32)
        if backend == "pallas":
            from ..ops.pallas.megakernel import render_image_pallas

            contrib = render_image_pallas(
                jnp.zeros_like(accum_blk), seed_frame, jnp.bool_(True),
                scene, sky, basis,
                width=width, height=block_rows, spp=local_spp,
                num_bounces=num_bounces,
                row_offset=(tile_idx * block_rows).astype(jnp.uint32),
                full_height=height,
            )
        else:
            pixel_idx = tile_idx * block + jnp.arange(block, dtype=jnp.int32)
            contrib = render_pixels(
                pixel_idx, seed_frame, scene, sky, basis, width, height,
                local_spp, num_bounces, sphere_chunk,
            )
        contrib = jax.lax.psum(contrib, SPP_AXIS)
        base = jnp.where(clear, jnp.zeros_like(accum_blk), accum_blk)
        return base + contrib

    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(TILE_AXIS, None),  # accum rows over tiles, replicated over spp
            P(), P(), P(), P(), P(),  # scalars + scene/sky/basis replicated
        ),
        out_specs=P(TILE_AXIS, None),
        check_rep=False,
    )
    return fn(accum, frame, clear, scene, sky, basis)


def sharded_accumulator(width: int, height: int, mesh: Mesh) -> jnp.ndarray:
    """Allocate the [H*W, 3] accumulator sharded over the tile axis."""
    sharding = NamedSharding(mesh, P(TILE_AXIS, None))
    return jnp.zeros((width * height, 3), dtype=jnp.float32, device=sharding)
