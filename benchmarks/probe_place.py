"""Mosaic capability probes for the binned place kernel (round 3).

The per-ray-group pack needs, beyond what benchmarks/probe_mosaic.py
already proved (lane gathers, dynamic sublane reads, per-row DMA):

  P1  scalar read from VMEM at a DYNAMIC LANE index (ref[r, j], j dynamic)
  P2  SMEM scratch array read AND write at a dynamic index
  P3  per-row bitonic sort along lanes via static take_along_axis shifts
      (all-rows-parallel; the run extraction prerequisite)
  P4  take_along_axis rotate by a per-row DYNAMIC shift (carry merge)

Each probe prints ok/FAIL with the observed vs expected values.

    python benchmarks/probe_place.py
"""
from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    from weekend_raytracer_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run(name, fn):
        try:
            ok, msg = fn()
            print(f"{'ok  ' if ok else 'FAIL'} {name}: {msg}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {type(e).__name__}: {e}", flush=True)
            if os.environ.get("WRT_TRACE"):
                traceback.print_exc()

    # --- P1: dynamic-lane scalar VMEM read -------------------------------
    def p1():
        def kern(x_ref, i_ref, o_ref):
            j = i_ref[0]
            r = i_ref[1]
            o_ref[0] = x_ref[r, j]

        x = jnp.arange(8 * 128, dtype=jnp.float32).reshape(8, 128)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        )(x, jnp.asarray([37, 5], jnp.int32))
        got = float(out[0])
        return got == 5 * 128 + 37, f"got {got}, want {5 * 128 + 37}"

    # --- P2: dynamic-index SMEM scratch write + read ---------------------
    def p2():
        def kern(i_ref, o_ref, scratch):
            for k in range(4):
                scratch[i_ref[k]] = jnp.int32(100 + k)
            # dynamic read back at shifted indices
            for k in range(4):
                o_ref[k] = scratch[i_ref[(k + 1) % 4]]

        idx = jnp.asarray([7, 93, 12, 64], jnp.int32)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            out_shape=jax.ShapeDtypeStruct((4,), jnp.int32),
            scratch_shapes=[pltpu.SMEM((128,), jnp.int32)],
        )(idx)
        want = [101, 102, 103, 100]
        return list(np.asarray(out)) == want, f"got {list(np.asarray(out))}"

    # --- P3: per-row bitonic sort along lanes ----------------------------
    def p3():
        def kern(x_ref, o_ref):
            v = x_ref[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            # bitonic network over 128 lanes, all rows in parallel
            k = 2
            while k <= 128:
                j = k // 2
                while j >= 1:
                    partner = lane ^ j
                    pv = jnp.take_along_axis(v, partner, axis=1)
                    up = (lane & k) == 0
                    keep_min = (lane < partner) == up
                    v = jnp.where(keep_min, jnp.minimum(v, pv),
                                  jnp.maximum(v, pv))
                    j //= 2
                k *= 2
            o_ref[...] = v

        rng = np.random.default_rng(0)
        x = rng.integers(0, 128, size=(8, 128)).astype(np.float32)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.asarray(x))
        want = np.sort(x, axis=1)
        ok = np.array_equal(np.asarray(out), want)
        return ok, "rows sorted" if ok else "mismatch"

    # --- P4: per-row rotate by dynamic per-row shifts --------------------
    def p4():
        def kern(x_ref, s_ref, o_ref):
            v = x_ref[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            sh = s_ref[...][:, :1].astype(jnp.int32)  # (8,1) per-row shift
            idx = (lane - sh) & 127
            o_ref[...] = jnp.take_along_axis(v, idx, axis=1)

        x = np.arange(8 * 128, dtype=np.float32).reshape(8, 128)
        sh = np.arange(8, dtype=np.float32)[:, None] * np.ones((1, 128),
                                                              np.float32)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(jnp.asarray(x), jnp.asarray(sh))
        want = np.stack([np.roll(x[r], r) for r in range(8)])
        ok = np.array_equal(np.asarray(out), want)
        return ok, "rotated" if ok else "mismatch"

    run("P1 dynamic-lane scalar VMEM read", p1)
    run("P2 dynamic-index SMEM scratch rw", p2)
    run("P3 per-row bitonic lane sort", p3)
    run("P4 per-row dynamic rotate", p4)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
