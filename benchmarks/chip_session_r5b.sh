#!/bin/bash
# Round-5b serialized chip session: price the ROW-GRANULAR K1 TRAVERSAL
# (rowsweep — bit-identical, interpret-tested, AOT-lowered) across its
# two free knobs, cull-chunk size (k1c) and lockstep width (tsub).
# Offline replay (docs/PERF.md round-3 sims) put the 128-ray-row union
# at ~160 tests/segment vs ~480 for the tile union on RTiOW cs8 and
# ~586 vs ~3344 on random10k cs8 — this is the structural attack on
# tests/segment that VERDICT r4 item 1 demands. Every leg's env is
# pinned explicitly. No auto-flip: the winning (knob, k1c, tsub) combo
# spans code defaults, so the flip is a reviewed commit.
set +e
cd /root/repo
mkdir -p benchmarks/chip_logs
L=benchmarks/chip_logs

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

echo "=== 1. RTiOW base (same-session control, pinned) ==="
if ! grep -q mrays $L/r5b_rtiow_base.log 2>/dev/null; then
WRT_ROWSWEEP=0 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_base.err" | tee "$L/r5b_rtiow_base.log"
fi

P
echo "=== 2. RTiOW rowsweep k1c16 tsub8 ==="
if ! grep -q mrays $L/r5b_rtiow_c16t8.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t8.err" | tee "$L/r5b_rtiow_c16t8.log"
fi

P
echo "=== 3. RTiOW rowsweep k1c8 tsub8 ==="
if ! grep -q mrays $L/r5b_rtiow_c8t8.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_CHUNK=8 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c8t8.err" | tee "$L/r5b_rtiow_c8t8.log"
fi

P
echo "=== 4. RTiOW rowsweep k1c16 tsub32 ==="
if ! grep -q mrays $L/r5b_rtiow_c16t32.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t32.err" | tee "$L/r5b_rtiow_c16t32.log"
fi

P
echo "=== 5. random10k base (pinned control) ==="
if ! grep -q mrays $L/r5b_10k_base.log 2>/dev/null; then
WRT_ROWSWEEP=0 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_base.err" | tee "$L/r5b_10k_base.log"
fi

P
echo "=== 6. random10k rowsweep k1c32 tsub8 ==="
if ! grep -q mrays $L/r5b_10k_c32t8.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_c32t8.err" | tee "$L/r5b_10k_c32t8.log"
fi

P
echo "=== 7. random10k rowsweep k1c16 tsub8 ==="
if ! grep -q mrays $L/r5b_10k_c16t8.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_CHUNK=16 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_c16t8.err" | tee "$L/r5b_10k_c16t8.log"
fi

P
echo "=== 8. RTiOW rowsweep k1c8 tsub32 ==="
if ! grep -q mrays $L/r5b_rtiow_c8t32.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_CHUNK=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c8t32.err" | tee "$L/r5b_rtiow_c8t32.log"
fi

P
echo "=== 8a. RTiOW rowsweep + v2 kernels together (k1c16 tsub8) ==="
if ! grep -q mrays $L/r5b_rtiow_c16t8v2.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=8 WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t8v2.err" | tee "$L/r5b_rtiow_c16t8v2.log"
fi

P
echo "=== 8b. RTiOW rowsweep K1+K0 (k1c16 tsub8) ==="
if ! grep -q mrays $L/r5b_rtiow_c16t8k0.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_ROWSWEEP_K0=1 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t8k0.err" | tee "$L/r5b_rtiow_c16t8k0.log"
fi

P
echo "=== 8c. K1 steps/segment stats (rowsweep verdict decomposition) ==="
if ! grep -q k1_stats $L/r5b_stats_rtiow_base.jsonl 2>/dev/null; then
WRT_ROWSWEEP=0 timeout 1200 python benchmarks/profile_regroup.py rtiow stats \
  2>"$L/r5b_stats_rtiow_base.err" | tee "$L/r5b_stats_rtiow_base.jsonl"
fi
P
if ! grep -q k1_stats $L/r5b_stats_rtiow_rs.jsonl 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=8 timeout 1200 python benchmarks/profile_regroup.py rtiow stats \
  2>"$L/r5b_stats_rtiow_rs.err" | tee "$L/r5b_stats_rtiow_rs.jsonl"
fi
P
if ! grep -q k1_stats $L/r5b_stats_rtiow_rs8.jsonl 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_CHUNK=8 WRT_K1_TSUB=8 timeout 1200 python benchmarks/profile_regroup.py rtiow stats \
  2>"$L/r5b_stats_rtiow_rs8.err" | tee "$L/r5b_stats_rtiow_rs8.jsonl"
fi
P
if ! grep -q k1_stats $L/r5b_stats_10k_base.jsonl 2>/dev/null; then
WRT_ROWSWEEP=0 timeout 1800 python benchmarks/profile_regroup.py random10k stats \
  2>"$L/r5b_stats_10k_base.err" | tee "$L/r5b_stats_10k_base.jsonl"
fi
P
if ! grep -q k1_stats $L/r5b_stats_10k_rs.jsonl 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=8 timeout 1800 python benchmarks/profile_regroup.py random10k stats \
  2>"$L/r5b_stats_10k_rs.err" | tee "$L/r5b_stats_10k_rs.jsonl"
fi

P
echo "=== 9. summary ==="
python - <<'EOF' | tee "$L/r5b_verdict.json"
import json, pathlib

def mrays(path):
    best = None
    p = pathlib.Path("benchmarks/chip_logs/" + path)
    if not p.exists():
        return None
    for line in p.read_text().splitlines():
        try:
            best = max(best or 0.0, float(json.loads(line)["mrays"]))
        except Exception:
            pass
    return best

out = {k: mrays(f"r5b_{k}.log") for k in (
    "rtiow_base", "rtiow_c16t8", "rtiow_c8t8", "rtiow_c16t32",
    "rtiow_c8t32", "rtiow_c16t8v2", "rtiow_c16t8k0", "10k_base",
    "10k_c32t8", "10k_c16t8")}
print(json.dumps(out))
EOF

echo "=== chip session r5b done ==="
