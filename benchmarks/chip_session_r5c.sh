#!/bin/bash
# Round-5c final capture: driver-format headline + full ladder under the
# CURRENT defaults (run after any manual rowsweep default flip). Resume
# guards per leg; env unpinned on purpose — this measures the defaults.
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
for _try in 1 2 3; do
  timeout 120 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,128)).sum()) == 1024.0
print('chip ok:', jax.devices()[0])" && break
  [ "$_try" = 3 ] && { echo "chip down; abort"; exit 1; }
  sleep 45
done

echo "=== 1. headline (current defaults) ==="
if ! grep -q metric $L/r5c_bench.json 2>/dev/null; then
timeout 1800 python bench.py 2>"$L/r5c_bench.err" | tee "$L/r5c_bench.json"
fi

echo "=== 2. ladder (current defaults, harness r5, per-config resume) ==="
for c in 1 2 3 4 5; do
  P
  if ! grep -q rays_per_sec "$L/r5c_ladder_c$c.jsonl" 2>/dev/null; then
    timeout 1800 python benchmarks/ladder.py --configs "$c" \
      2>"$L/r5c_ladder_c$c.err" | tee "$L/r5c_ladder_c$c.jsonl"
  fi
done
ok=1
for c in 1 2 3 4 5; do
  grep -q rays_per_sec "$L/r5c_ladder_c$c.jsonl" 2>/dev/null || ok=0
done
if [ "$ok" = 1 ]; then
  cat $L/r5c_ladder_c1.jsonl $L/r5c_ladder_c2.jsonl $L/r5c_ladder_c3.jsonl \
      $L/r5c_ladder_c4.jsonl $L/r5c_ladder_c5.jsonl | grep rays_per_sec \
      > "$L/r5c_ladder.jsonl"
fi
if grep -q 5-random10k "$L/r5c_ladder.jsonl" 2>/dev/null; then
  cp "$L/r5c_ladder.jsonl" benchmarks/results_tpu_v5e.jsonl
  git add benchmarks/results_tpu_v5e.jsonl "$L"
  git commit -m "Final round-5 ladder under the shipped defaults

No-Verification-Needed: benchmark-log bookkeeping only"
fi

echo "=== chip session r5c done ==="
