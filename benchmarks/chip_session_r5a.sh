#!/bin/bash
# Round-5a serialized chip session (VERDICT r4 items 2, 3, 4):
#   1. driver-format headline on the reverted v1 defaults,
#   2. skip_dead A/B with EVERY leg's env pinned explicitly (the r4b
#      session let the "base" leg inherit flipped defaults and
#      overwrote its own justifying verdict — advisor finding),
#   3. phase re-profile under v1 AND v2 to reconcile the falsified
#      237 ms overhead model (docs/PERF.md:693-729),
#   4. full ladder on one harness revision (r5) for
#      benchmarks/results_tpu_v5e.jsonl.
# Ordered most-valuable-first so a tunnel drop mid-session still
# leaves the verdicts on disk.
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

echo "=== 1. headline on the reverted v1 defaults (driver format) ==="
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 \
  timeout 1800 python bench.py 2>"$L/r5a_bench.err" | tee "$L/r5a_bench.json"

P
echo "=== 2. RTiOW skip_dead A/B (all legs pinned) ==="
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5a_rtiow_v1.err" | tee "$L/r5a_rtiow_v1.log"
P
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5a_rtiow_v2pair.err" | tee "$L/r5a_rtiow_v2pair.log"
P
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=1 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5a_rtiow_skip.err" | tee "$L/r5a_rtiow_skip.log"

P
echo "=== 3. random10k skip_dead A/B (pinned) ==="
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5a_10k_v1.err" | tee "$L/r5a_10k_v1.log"
P
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=1 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5a_10k_skip.err" | tee "$L/r5a_10k_skip.log"

P
echo "=== 4. decide the skip_dead default ==="
python - <<'EOF' | tee "$L/r5a_verdict.json"
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
v1 = mrays(L + "r5a_rtiow_v1.log")
v2 = mrays(L + "r5a_rtiow_v2pair.log")
skip = mrays(L + "r5a_rtiow_skip.log")
b10 = mrays(L + "r5a_10k_v1.log")
s10 = mrays(L + "r5a_10k_skip.log")
# skip_dead forces the v2 kernels, so its REAL alternative is the v1
# default: flip only if it beats v1 by >1% on RTiOW and does not lose
# >2% on 10k.
ok10 = (s10 is None or b10 is None) or (s10 >= 0.98 * b10)
flip = bool(v1 and skip and skip > 1.01 * v1 and ok10)
print(json.dumps({"v1": v1, "v2pair": v2, "skip": skip,
                  "10k_v1": b10, "10k_skip": s10,
                  "flip_skip_dead": flip}))
src = pathlib.Path("weekend_raytracer_tpu/ops/pallas/regroup.py")
txt = src.read_text()
if flip:
    new = txt.replace('os.environ.get("WRT_SKIP_DEAD", "0")',
                      'os.environ.get("WRT_SKIP_DEAD", "1")')
    if new != txt:
        src.write_text(new)
        pathlib.Path("benchmarks/chip_logs/r5a_flipped").write_text("1\n")
EOF

if [ -f "$L/r5a_flipped" ]; then
  git add weekend_raytracer_tpu/ops/pallas/regroup.py "$L"
  git commit -m "Default on skip_dead: chip A/B in benchmarks/chip_logs/r5a_verdict.json

No-Verification-Needed: default flip gated on the on-chip A/B of a bit-identical scheduling change"
  rm -f "$L/r5a_flipped"
fi

P
echo "=== 5. phase profile, v1 and v2 (reconcile the 237 ms model) ==="
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 \
  timeout 2400 python benchmarks/profile_regroup.py rtiow \
  2>"$L/r5a_prof_rtiow_v1.err" | tee "$L/r5a_prof_rtiow_v1.jsonl"
P
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=0 \
  timeout 2400 python benchmarks/profile_regroup.py rtiow \
  2>"$L/r5a_prof_rtiow_v2.err" | tee "$L/r5a_prof_rtiow_v2.jsonl"

P
echo "=== 6. ladder, all configs, final defaults (harness r5) ==="
WRT_COMBINE_V2=0 WRT_PACK_V2=0 \
  timeout 5400 python benchmarks/ladder.py 2>"$L/r5a_ladder.err" | tee "$L/r5a_ladder.jsonl"
if [ -s "$L/r5a_ladder.jsonl" ] && grep -q rays_per_sec "$L/r5a_ladder.jsonl"; then
  cp "$L/r5a_ladder.jsonl" benchmarks/results_tpu_v5e.jsonl
  git add benchmarks/results_tpu_v5e.jsonl "$L"
  git commit -m "Ladder re-measured on the r5 harness with v1-default kernels

No-Verification-Needed: benchmark-log bookkeeping only"
fi

echo "=== chip session r5a done ==="
