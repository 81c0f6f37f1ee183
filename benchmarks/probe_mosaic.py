"""Probe Mosaic/TPU capability gaps that gate kernel designs (round 2).

Each probe compiles a tiny Pallas kernel on the real chip and reports
ok/fail. Findings feed docs/PERF.md and CLAUDE.md. Run serially (the
remote-compile service has a single queue).
"""
import sys
import traceback

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def run(name, fn):
    try:
        out = fn()
        print(f"[ok]   {name}: {out}")
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:200]
        print(f"[FAIL] {name}: {type(e).__name__}: {msg}")


def probe_take_along_sublane():
    """take_along_axis along sublanes (axis=0) of (32,128) f32."""
    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=0)

    tab = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    idx = jnp.broadcast_to(jnp.arange(32, dtype=jnp.int32)[::-1, None], (32, 128))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(tab, idx)
    expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=0)
    assert np.array_equal(np.asarray(out), expect), "WRONG RESULT"
    return "sublane gather works"


def probe_take_along_lane():
    """take_along_axis along lanes (axis=1) of (8,128) f32."""
    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    idx = jnp.broadcast_to(jnp.arange(128, dtype=jnp.int32)[::-1][None, :], (8, 128))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(tab, idx)
    expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), expect), "WRONG RESULT"
    return "lane gather works"


def probe_take_along_lane_32():
    """take_along_axis along lanes (axis=1) of (32,128) f32 (full tile)."""
    def kernel(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take_along_axis(tab_ref[:], idx_ref[:], axis=1)

    tab = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 128, size=(32, 128), dtype=np.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(tab, idx)
    expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), expect), "WRONG RESULT"
    return "lane gather (32,128) works"


def probe_scalar_dynamic_read():
    """Read a VMEM ref at a traced scalar index (ref[i, 0])."""
    def kernel(tab_ref, i_ref, out_ref):
        i = i_ref[0]
        out_ref[0] = tab_ref[i, 0]

    tab = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    i = jnp.array([7], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
    )(tab, i)
    assert float(out[0]) == 7 * 128.0, f"WRONG {out}"
    return "scalar dynamic VMEM read works"


def probe_dynamic_slice_sublane():
    """Dynamic (pl.ds) sublane slice of a VMEM ref with traced start."""
    def kernel(tab_ref, i_ref, out_ref):
        i = i_ref[0]
        out_ref[:] = tab_ref[pl.ds(i * 8, 8), :]

    tab = jnp.arange(32 * 128, dtype=jnp.float32).reshape(32, 128)
    i = jnp.array([2], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(tab, i)
    assert np.array_equal(np.asarray(out), np.asarray(tab)[16:24]), "WRONG"
    return "dynamic sublane slice works"


def probe_manual_dma_gather_rows():
    """In-kernel DMA gather: copy 8 rows of an HBM array picked by SMEM
    indices into VMEM scratch (the binned-relaunch building block)."""
    def kernel(idx_ref, hbm_ref, out_ref):
        def body(scratch, sem):
            def one(j, _):
                cp = pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(idx_ref[j] * 128, 128)],
                    scratch.at[pl.ds(j * 128, 128)],
                    sem,
                )
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, 8, one, 0)
            out_ref[:] = scratch[:].reshape(8, 128)

        pl.run_scoped(
            body,
            pltpu.VMEM((8 * 128,), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )

    tab = jnp.arange(64 * 128, dtype=jnp.float32)
    idx = jnp.asarray([5, 3, 60, 0, 1, 9, 33, 2], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(idx, tab)
    expect = np.asarray(tab).reshape(64, 128)[np.asarray(idx)]
    assert np.array_equal(np.asarray(out), expect), "WRONG"
    return "manual DMA row gather works"


def probe_xla_gather_bw():
    """XLA row-gather bandwidth at several row sizes (regroup feasibility)."""
    import time

    results = []
    for rows, row_elems in [(65536, 128), (8192, 1024), (2048, 4096)]:
        src = jnp.arange(rows * row_elems, dtype=jnp.float32).reshape(rows, row_elems)
        rng = np.random.default_rng(0)
        idx = jnp.asarray(rng.permutation(rows).astype(np.int32))
        f = jax.jit(lambda s, i: jnp.take(s, i, axis=0))
        out = f(src, idx)
        out.block_until_ready()
        np.asarray(out[:1, :1])
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(src, idx)
        out.block_until_ready()
        np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / n
        gb = rows * row_elems * 4 * 2 / 1e9  # read+write
        results.append(f"{rows}x{row_elems}: {gb/dt:.1f} GB/s")
    return "; ".join(results)


def probe_xla_sort_cost():
    """Key+index sort cost at regroup-relevant sizes."""
    import time

    results = []
    for n in [65536, 1 << 20, 1 << 23]:
        rng = np.random.default_rng(0)
        keys = jnp.asarray(rng.integers(0, 1 << 30, size=n, dtype=np.int32))
        f = jax.jit(lambda k: jax.lax.sort(
            (k, jax.lax.iota(jnp.int32, k.shape[0])), num_keys=1))
        out = f(keys)
        jax.block_until_ready(out)
        np.asarray(out[0][:1])
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(keys)
        jax.block_until_ready(out)
        np.asarray(out[0][:1])
        dt = (time.perf_counter() - t0) / reps
        results.append(f"n={n}: {dt*1e3:.2f} ms")
    return "; ".join(results)


def probe_cumsum_lanes():
    """jnp.cumsum along lanes (axis=1) of (32,128) f32."""
    def kernel(x_ref, out_ref):
        out_ref[:] = jnp.cumsum(x_ref[:], axis=1)

    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((32, 128)) < 0.5).astype(np.float32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((32, 128), jnp.float32),
    )(x)
    expect = np.cumsum(np.asarray(x), axis=1)
    assert np.array_equal(np.asarray(out), expect), "WRONG RESULT"
    return "lane cumsum works"


def probe_dynamic_store_leading():
    """Store a (1,128) row into a 3D VMEM scratch at a traced leading
    index (the pack-fold staging write)."""
    def kernel(x_ref, i_ref, out_ref):
        i = i_ref[0]
        out_ref[pl.ds(i, 1), 2, :] = x_ref[:]

    x = jnp.arange(128, dtype=jnp.float32).reshape(1, 128)
    i = jnp.array([5], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((8, 4, 128), jnp.float32),
    )(x, i)
    assert np.array_equal(np.asarray(out)[5, 2], np.arange(128.0)), "WRONG"
    return "dynamic leading-dim VMEM store works"


def probe_dynamic_read_leading_3d():
    """Read a (1,128) row of a 3D VMEM ref at a traced leading index."""
    def kernel(tab_ref, i_ref, out_ref):
        i = i_ref[0]
        out_ref[:] = tab_ref[pl.ds(i, 1), 2, :]

    tab = jnp.arange(8 * 4 * 128, dtype=jnp.float32).reshape(8, 4, 128)
    i = jnp.array([5], dtype=jnp.int32)
    out = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(tab, i)
    assert np.array_equal(np.asarray(out)[0], np.asarray(tab)[5, 2]), "WRONG"
    return "dynamic leading-dim 3D VMEM read works"


def probe_gather_bit_preserving():
    """Does take_along_axis on f32 preserve raw i32 bit patterns
    (i32 ids bitcast to f32, gathered, bitcast back)?"""
    def kernel(tab_ref, idx_ref, out_ref):
        f = jax.lax.bitcast_convert_type(tab_ref[:], jnp.float32)
        g = jnp.take_along_axis(f, idx_ref[:], axis=1)
        out_ref[:] = jax.lax.bitcast_convert_type(g, jnp.int32)

    rng = np.random.default_rng(0)
    # include denormal-range, NaN-range, and negative-zero patterns
    tab = jnp.asarray(
        rng.integers(-(1 << 31), 1 << 31, size=(8, 128), dtype=np.int64)
    ).astype(jnp.int32)
    idx = jnp.asarray(rng.integers(0, 128, size=(8, 128), dtype=np.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
    )(tab, idx)
    expect = np.take_along_axis(np.asarray(tab), np.asarray(idx), axis=1)
    assert np.array_equal(np.asarray(out), expect), "BITS NOT PRESERVED"
    return "f32 lane gather preserves raw bit patterns"


def probe_take_along_lane_1row():
    """take_along_axis along lanes of a (1,128) value (per-row fold op)."""
    def kernel(tab_ref, idx_ref, out_ref):
        row = tab_ref[0:1, :]
        ids = idx_ref[0:1, :]
        out_ref[0:1, :] = jnp.take_along_axis(row, ids, axis=1)

    tab = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 128, size=(8, 128), dtype=np.int32))
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )(tab, idx)
    expect = np.take_along_axis(
        np.asarray(tab)[:1], np.asarray(idx)[:1], axis=1)
    assert np.array_equal(np.asarray(out), expect), "WRONG"
    return "(1,128) lane gather works"


PROBES = [
    ("cumsum_lanes", probe_cumsum_lanes),
    ("dynamic_store_leading", probe_dynamic_store_leading),
    ("dynamic_read_leading_3d", probe_dynamic_read_leading_3d),
    ("gather_bit_preserving", probe_gather_bit_preserving),
    ("take_along_lane_1row", probe_take_along_lane_1row),
    ("take_along_sublane", probe_take_along_sublane),
    ("take_along_lane", probe_take_along_lane),
    ("take_along_lane_32", probe_take_along_lane_32),
    ("scalar_dynamic_read", probe_scalar_dynamic_read),
    ("dynamic_slice_sublane", probe_dynamic_slice_sublane),
    ("manual_dma_gather_rows", probe_manual_dma_gather_rows),
    ("xla_gather_bw", probe_xla_gather_bw),
    ("xla_sort_cost", probe_xla_sort_cost),
]

if __name__ == "__main__":
    only = sys.argv[1:] or None
    for name, fn in PROBES:
        if only and name not in only:
            continue
        run(name, fn)
