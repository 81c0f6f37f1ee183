"""Micro-benchmark: per-lane segmented gather cost on the VPU.

The grid-DDA intersector design (docs/PERF.md round 2) hinges on fetching
per-lane sphere/cell attributes from tables of N 128-wide rows by walking
only the [min_row, max_row] span the tile's lanes need — the same
primitive as the texture LUT. This measures the per-fetch cost as a
function of the spanned row count R, against a pure-arithmetic baseline.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_fn(span_rows: int, n_fetch: int, table_rows: int):
    """Kernel: per lane, do n_fetch gathers whose indices span span_rows
    rows; accumulate. Grid of 512 tiles to get a stable timing."""

    def kernel(tab_ref, idx_ref, out_ref):
        base = idx_ref[:]  # in [lo*128, (lo+span)*128) for this tile
        span_base = (jnp.min(base) >> 7) << 7
        acc = jnp.zeros((32, 128), jnp.float32)
        for k in range(n_fetch):
            flat = span_base + (base - span_base + k * 37) % (span_rows * 128)
            row = (flat >> 7) % table_rows
            col = flat & 127
            rlo = jnp.min(row)
            rhi = jnp.max(row)

            def body(r, a):
                vec = jnp.broadcast_to(tab_ref[pl.ds(r, 1), :], (32, 128))
                g = jnp.take_along_axis(vec, col, axis=1)
                return jnp.where(row == r, g, a)

            acc = acc + jax.lax.fori_loop(rlo, rhi + 1, body, acc * 0.0)
        out_ref[:] = acc

    return kernel


def main():
    import os

    smoke = bool(os.environ.get("WRT_PROBE_SMOKE"))
    if smoke:  # CPU interpret: validate gather semantics, skip timing
        import jax as _jax

        _jax.config.update("jax_platforms", "cpu")
    table_rows = 128
    tab = jnp.arange(table_rows * 128, dtype=jnp.float32).reshape(table_rows, 128)
    rng = np.random.default_rng(0)
    n_tiles = 8 if smoke else 512
    for span in (1, 4) if smoke else (1, 2, 4, 8, 16):
        n_fetch = 16
        lo = rng.integers(0, table_rows - span, size=(n_tiles,))
        idx = (lo[:, None, None] * 128
               + rng.integers(0, span * 128,
                              size=(n_tiles, 32, 128))).astype(np.int32)
        idx = jnp.asarray(idx.reshape(n_tiles * 32, 128))
        kernel = make_fn(span, n_fetch, table_rows)
        f = jax.jit(lambda t, i: pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((32, 128), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((32, 128), lambda g: (g, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * 32, 128), jnp.float32),
            interpret=smoke,
        )(t, i))
        out = f(tab, idx)
        out.block_until_ready(); np.asarray(out[:1, :1])
        if smoke:  # numpy oracle: out = sum_k tab[row_k, col_k] per lane
            base = np.asarray(idx).reshape(n_tiles, 32, 128)
            sb = ((base.min(axis=(1, 2), keepdims=True) >> 7) << 7)
            want = np.zeros_like(base, np.float32)
            for k in range(n_fetch):
                flat = sb + (base - sb + k * 37) % (span * 128)
                want += np.asarray(tab)[(flat >> 7) % table_rows, flat & 127]
            np.testing.assert_allclose(
                np.asarray(out).reshape(n_tiles, 32, 128), want)
            print(json.dumps({"span_rows": span, "smoke": "ok"}), flush=True)
            continue
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(tab, idx)
        out.block_until_ready(); np.asarray(out[:1, :1])
        dt = (time.perf_counter() - t0) / reps
        fetches = n_tiles * n_fetch
        # ns per (32,128)-block fetch; and effective VPU ops equivalent
        ns_per_fetch = dt / fetches * 1e9
        print(json.dumps({
            "span_rows": span,
            "ns_per_block_fetch": round(ns_per_fetch, 1),
            "equiv_vpu_ops": round(ns_per_fetch / (1.0 / 0.94) / 4, 1),
            "ms_total": round(dt * 1e3, 3),
        }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
