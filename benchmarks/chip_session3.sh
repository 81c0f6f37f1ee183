#!/bin/bash
# Round-4c follow-up: price the live-tile indirection (skip_dead) on
# top of whatever defaults chip_session2.sh landed, and re-capture the
# headline if it wins. Run AFTER session2 (it assumes the v2 verdicts
# are already in).
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

echo "=== 1. RTiOW: skip_dead (implies combine_v2+pack_v2) vs the v2 pair alone ==="
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/r4c_rtiow_v2pair.err" | tee "$L/r4c_rtiow_v2pair.log"
P
WRT_SKIP_DEAD=1 WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/r4c_rtiow_skip.err" | tee "$L/r4c_rtiow_skip.log"

P
echo "=== 2. random10k: skip_dead (4K sky fraction is small; expect ~neutral) ==="
WRT_SKIP_DEAD=1 WRT_SPP=8 timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>"$L/r4c_10k_skip.err" | tee "$L/r4c_10k_skip.log"

P
echo "=== 3. decide the skip_dead default ==="
python - <<'EOF' | tee "$L/r4c_verdict.json"
import json, pathlib

def mrays(path):
    best = None
    p = pathlib.Path(path)
    if not p.exists():
        return None
    for line in p.read_text().splitlines():
        try:
            best = max(best or 0.0, float(json.loads(line)["mrays"]))
        except Exception:
            pass
    return best

L = "benchmarks/chip_logs/"
pair = mrays(L + "r4c_rtiow_v2pair.log")
skip = mrays(L + "r4c_rtiow_skip.log")
s10 = mrays(L + "r4c_10k_skip.log")
b10 = mrays(L + "r4b_10k_both.log") or mrays(L + "r4b_10k_base.log")
ok10 = (s10 is None or b10 is None) or (s10 >= 0.98 * b10)
flip = bool(pair and skip and skip > 1.01 * pair and ok10)
print(json.dumps({"v2pair": pair, "skip": skip, "10k_skip": s10,
                  "10k_ref": b10, "flip_skip_dead": flip}))
src = pathlib.Path("weekend_raytracer_tpu/ops/pallas/regroup.py")
txt = src.read_text()
if flip:
    new = txt.replace('os.environ.get("WRT_SKIP_DEAD", "0")',
                      'os.environ.get("WRT_SKIP_DEAD", "1")')
    if new != txt:
        src.write_text(new)
        pathlib.Path("benchmarks/chip_logs/r4c_flipped").write_text("1\n")
EOF

if [ -f "$L/r4c_flipped" ]; then
  git add weekend_raytracer_tpu/ops/pallas/regroup.py "$L"
  git commit -m "Default on skip_dead: chip A/B in benchmarks/chip_logs/r4c_verdict.json

No-Verification-Needed: default flip gated on the on-chip A/B of a bit-identical scheduling change"
  P
  echo "=== 4. headline + ladder with the final defaults ==="
  timeout 1800 python bench.py 2>"$L/r4c_bench.err" | tee "$L/r4c_bench.json"
  P
  timeout 3600 python benchmarks/ladder.py 2>"$L/r4c_ladder.err" | tee "$L/r4c_ladder.jsonl"
  if [ -s "$L/r4c_ladder.jsonl" ] && grep -q rays_per_sec "$L/r4c_ladder.jsonl"; then
    cp "$L/r4c_ladder.jsonl" benchmarks/results_tpu_v5e.jsonl
    git add benchmarks/results_tpu_v5e.jsonl "$L"
    git commit -m "Ladder re-measured with skip_dead defaults

No-Verification-Needed: benchmark-log bookkeeping only"
  fi
fi

echo "=== chip session 3 done ==="
