"""Probe in-kernel DMA row-gather formulations (binned-wavefront block).

Run serially on the chip; each probe is a variant of "copy N rows of an
HBM-resident array, selected by SMEM indices, into VMEM".
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = " | ".join(str(e).splitlines()[:3])[:300]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}", flush=True)


def probe_single_dma_2d():
    """One DMA: row idx of (64,128) HBM -> (1,128) VMEM scratch."""
    def kernel(idx_ref, hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(
            hbm_ref.at[pl.ds(idx_ref[0], 1), :], scratch, sem,
        )
        cp.start()
        cp.wait()
        out_ref[:] = scratch[:]

    tab = jnp.arange(64 * 128, dtype=jnp.float32).reshape(64, 128)
    idx = jnp.asarray([7], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idx, tab)
    assert np.array_equal(np.asarray(out)[0], np.asarray(tab)[7]), "WRONG"
    return "single 2D-row DMA works"


def probe_single_dma_3d():
    """One DMA: record idx of (64,8,128) HBM -> (8,128) VMEM scratch."""
    def kernel(idx_ref, hbm_ref, out_ref, scratch, sem):
        cp = pltpu.make_async_copy(hbm_ref.at[idx_ref[0]], scratch, sem)
        cp.start()
        cp.wait()
        out_ref[:] = scratch[:]

    tab = jnp.arange(64 * 8 * 128, dtype=jnp.float32).reshape(64, 8, 128)
    idx = jnp.asarray([13], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(idx, tab)
    assert np.array_equal(np.asarray(out), np.asarray(tab)[13]), "WRONG"
    return "single 3D-record DMA works"


def probe_gather32_pipelined():
    """32 row-record DMAs (start all, then wait all) into a (32,8,128)
    VMEM scratch -> the wavefront tile gather."""
    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        def start(j, _):
            pltpu.make_async_copy(
                hbm_ref.at[idx_ref[j]], scratch.at[j], sems.at[j]
            ).start()
            return 0

        jax.lax.fori_loop(0, 32, start, 0, unroll=True)

        def wait(j, _):
            pltpu.make_async_copy(
                hbm_ref.at[idx_ref[j]], scratch.at[j], sems.at[j]
            ).wait()
            return 0

        jax.lax.fori_loop(0, 32, wait, 0, unroll=True)
        out_ref[:] = scratch[:]

    tab = jnp.arange(300 * 8 * 128, dtype=jnp.float32).reshape(300, 8, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 300, size=32, dtype=np.int32))
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((32, 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((32, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((32,)),
        ],
    )(idx, tab)
    expect = np.asarray(tab)[np.asarray(idx)]
    assert np.array_equal(np.asarray(out), expect), "WRONG"
    return "32-record pipelined DMA gather works"


def probe_scatter_dma():
    """Reverse direction: write VMEM records to HBM rows picked by SMEM
    indices (input_output_alias pattern: copy full array in, DMA-overwrite
    selected records)."""
    def kernel(idx_ref, src_ref, hbm_out, sems):
        def start(j, _):
            pltpu.make_async_copy(
                src_ref.at[j], hbm_out.at[idx_ref[j]], sems.at[j]
            ).start()
            return 0

        jax.lax.fori_loop(0, 4, start, 0, unroll=True)

        def wait(j, _):
            pltpu.make_async_copy(
                src_ref.at[j], hbm_out.at[idx_ref[j]], sems.at[j]
            ).wait()
            return 0

        jax.lax.fori_loop(0, 4, wait, 0, unroll=True)

    src = jnp.arange(4 * 8 * 128, dtype=jnp.float32).reshape(4, 8, 128) + 1000
    idx = jnp.asarray([9, 2, 31, 17], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((40, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(idx, src)
    out = np.asarray(out)
    ok = all(
        np.array_equal(out[int(i)], np.asarray(src)[j])
        for j, i in enumerate(np.asarray(idx))
    )
    assert ok, "WRONG"
    return "record scatter DMA works"


def probe_dma_rate():
    """Throughput of record-granularity DMA gather: full pool sweep,
    grid over tiles, 32 record-DMAs per tile (the wavefront access
    pattern). Reports records/s and GB/s."""
    import time

    n_rows, comps = 64800, 11
    pool = jnp.ones((n_rows, comps, 128), jnp.float32)
    n_tiles = n_rows // 32
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(n_rows).astype(np.int32))

    def kernel(idx_ref, hbm_ref, out_ref, scratch, sems):
        t = pl.program_id(0)

        def start(j, _):
            pltpu.make_async_copy(
                hbm_ref.at[idx_ref[t * 32 + j]], scratch.at[j], sems.at[j]
            ).start()
            return 0

        jax.lax.fori_loop(0, 32, start, 0, unroll=True)

        def wait(j, _):
            pltpu.make_async_copy(
                hbm_ref.at[idx_ref[t * 32 + j]], scratch.at[j], sems.at[j]
            ).wait()
            return 0

        jax.lax.fori_loop(0, 32, wait, 0, unroll=True)
        out_ref[:] = jnp.broadcast_to(
            jnp.sum(scratch[:, 0, :], keepdims=True), (8, 128)
        )

    f = jax.jit(lambda p, idx: pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((32, comps, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((32,)),
        ],
    )(idx, p))
    out = f(pool, perm)
    out.block_until_ready(); np.asarray(out[:1, :1])
    reps = 10
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(pool, perm)
    out.block_until_ready(); np.asarray(out[:1, :1])
    dt = (time.perf_counter() - t0) / reps
    nbytes = n_rows * comps * 128 * 4
    return (f"{n_rows/dt/1e6:.2f}M records/s, {nbytes/dt/1e9:.1f} GB/s read, "
            f"{dt*1e3:.2f} ms per full-pool gather")


PROBES = [
    ("single_dma_2d", probe_single_dma_2d),
    ("single_dma_3d", probe_single_dma_3d),
    ("gather32_pipelined", probe_gather32_pipelined),
    ("scatter_dma", probe_scatter_dma),
    ("dma_rate", probe_dma_rate),
]

if __name__ == "__main__":
    only = sys.argv[1:] or None
    for name, fn in PROBES:
        if only and name not in only:
            continue
        run(name, fn)
