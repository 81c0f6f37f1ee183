#!/bin/bash
# One serialized chip session: pending ladder re-measure + MXU probes +
# MXU frame sweeps. Everything logs to /tmp/chip_*.log; single compile
# queue, so strictly sequential.
set +e
cd /root/repo

echo "=== 1. ladder small-scene configs (scene-aware cuts) ==="
python benchmarks/ladder.py --configs 1,2,4 2>/tmp/chip_ladder.err | tee /tmp/chip_ladder.jsonl

echo "=== 2. MXU probes ==="
python benchmarks/probe_mxu_sweep.py p8 p8c16 p5 p7 p3 p1 p4 p6 2>/tmp/chip_probe.err | tee /tmp/chip_probe.log

echo "=== 3. RTiOW frames: VPU vs MXU ==="
WRT_SPP=32 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>/dev/null | tee /tmp/chip_rtiow_vpu.log
WRT_MXU_SWEEP=1 WRT_SPP=32 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>/tmp/chip_rtiow_mxu.err | tee /tmp/chip_rtiow_mxu.log

echo "=== 4. random10k frames: VPU vs MXU ==="
WRT_SPP=8 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>/dev/null | tee /tmp/chip_10k_vpu.log
WRT_MXU_SWEEP=1 WRT_SPP=8 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>/tmp/chip_10k_mxu.err | tee /tmp/chip_10k_mxu.log

echo "=== chip session done ==="

# Provenance: queued during the round-3 axon outage (11+ h). Run this
# first when the chip returns; it answers, in order: the small-scene
# ladder re-measure (scene-aware cuts), every MXU-sweep capability
# probe, and the VPU-vs-MXU frame comparison on both headline scenes.
