#!/bin/bash
# Round-4 serialized chip session. Ordered most-valuable-first so a
# tunnel drop mid-session still leaves the headline verified:
#   1. bench.py (driver-format headline, VPU)        <- VERDICT r3 #1
#   2. VPU-vs-MXU frames, both headline scenes       <- VERDICT r3 #2
#   3. full ladder on the r4 harness                 <- VERDICT r3 #6
#   4. phase profile of the non-sweep floor          <- VERDICT r3 #3
#   5. MXU capability probes (diagnosis detail)
# Logs land in benchmarks/chip_logs/ (committed). Single remote-compile
# queue -> strictly sequential; expect ~5 min/first-compile per variant.
set +e
cd /root/repo
mkdir -p benchmarks/chip_logs
L=benchmarks/chip_logs

# Abort fast if the tunnel drops mid-session instead of burning each
# remaining step's full timeout (worst case ~9h of dead waiting).
P() {
  for _try in 1 2; do
    timeout 120 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,128)).sum()) == 1024.0" && return 0
    sleep 60
  done
  echo "chip lost mid-session; aborting remaining steps"
  exit 1
}

echo "=== 0. probe ==="
timeout 120 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,128)).sum()) == 1024.0
print('chip ok:', jax.devices()[0])" || { echo "chip down; abort"; exit 1; }

echo "=== 1. bench.py headline (VPU) ==="
timeout 1800 python bench.py 2>"$L/bench_vpu.err" | tee "$L/bench_vpu.json"

P
echo "=== 2a. RTiOW frames: VPU vs MXU ==="
WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/rtiow_vpu.err" | tee "$L/rtiow_vpu.log"
WRT_MXU_SWEEP=1 WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/rtiow_mxu.err" | tee "$L/rtiow_mxu.log"

P
echo "=== 2b. random10k frames: VPU vs MXU ==="
WRT_SPP=8 timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>"$L/10k_vpu.err" | tee "$L/10k_vpu.log"
WRT_MXU_SWEEP=1 WRT_SPP=8 timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>"$L/10k_mxu.err" | tee "$L/10k_mxu.log"

P
echo "=== 2c. bench.py headline (MXU) ==="
WRT_MXU_SWEEP=1 timeout 1800 python bench.py 2>"$L/bench_mxu.err" | tee "$L/bench_mxu.json"

P
echo "=== 2d. MXU estimator equivalence at convergence ==="
timeout 2400 python benchmarks/mxu_equiv.py 256 2>"$L/mxu_equiv.err" | tee "$L/mxu_equiv.jsonl"

P
echo "=== 3. ladder, all configs, r4 harness ==="
timeout 3600 python benchmarks/ladder.py 2>"$L/ladder.err" | tee "$L/ladder_r4.jsonl"

P
echo "=== 4. phase profile (non-sweep floor decomposition) ==="
timeout 2400 python benchmarks/profile_regroup.py rtiow 2>"$L/prof_rtiow_vpu.err" | tee "$L/prof_rtiow_vpu.jsonl"
WRT_MXU_SWEEP=1 timeout 2400 python benchmarks/profile_regroup.py rtiow 2>"$L/prof_rtiow_mxu.err" | tee "$L/prof_rtiow_mxu.jsonl"
timeout 2400 python benchmarks/profile_regroup.py random10k 2>"$L/prof_10k_vpu.err" | tee "$L/prof_10k_vpu.jsonl"

P
echo "=== 4b. per-lane gather cost vs row span (sim_gather's C_G) ==="
timeout 2400 python benchmarks/probe_gather_cost.py 2>"$L/probe_gather.err" | tee "$L/probe_gather.log"

P
echo "=== 4c. dynamic grid bounds (dead-step overhead; bit-identical) ==="
WRT_DYN_GRID=1 WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/rtiow_dyng.err" | tee "$L/rtiow_dyng.log"
WRT_DYN_GRID=1 WRT_SPP=8 timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>"$L/10k_dyng.err" | tee "$L/10k_dyng.log"

P
echo "=== 5. MXU probes ==="
timeout 3600 python benchmarks/probe_mxu_sweep.py p8 p8c16 p5 p7 p3 p1 p4 p6 2>"$L/probe_mxu.err" | tee "$L/probe_mxu.log"

P
echo "=== 6. chunk-size sweep under MXU (cheaper tests shift the cond/cull optimum larger) ==="
for CS in 32 64; do
  WRT_MXU_SWEEP=1 WRT_SPP=32 WRT_CHUNK=$CS timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/rtiow_mxu_c$CS.err" | tee "$L/rtiow_mxu_c$CS.log"
  P
done
for CS in 64 128; do
  WRT_MXU_SWEEP=1 WRT_SPP=8 WRT_CHUNK=$CS timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>"$L/10k_mxu_c$CS.err" | tee "$L/10k_mxu_c$CS.log"
  P
done

echo "=== chip session done ==="
