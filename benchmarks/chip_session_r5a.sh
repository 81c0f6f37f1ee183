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
if ! grep -q metric $L/r5a_bench.json 2>/dev/null; then
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 \
  timeout 1800 python bench.py 2>"$L/r5a_bench.err" | tee "$L/r5a_bench.json"
fi

P
echo "=== 2. RTiOW skip_dead A/B (all legs pinned) ==="
if ! grep -q mrays $L/r5a_rtiow_v1.log 2>/dev/null; then
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5a_rtiow_v1.err" | tee "$L/r5a_rtiow_v1.log"
fi
P
if ! grep -q mrays $L/r5a_rtiow_v2pair.log 2>/dev/null; then
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5a_rtiow_v2pair.err" | tee "$L/r5a_rtiow_v2pair.log"
fi
P
if ! grep -q mrays $L/r5a_rtiow_skip.log 2>/dev/null; then
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=1 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5a_rtiow_skip.err" | tee "$L/r5a_rtiow_skip.log"
fi

P
echo "=== 3. random10k skip_dead A/B (pinned) ==="
if ! grep -q mrays $L/r5a_10k_v1.log 2>/dev/null; then
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5a_10k_v1.err" | tee "$L/r5a_10k_v1.log"
fi
P
if ! grep -q mrays $L/r5a_10k_skip.log 2>/dev/null; then
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=1 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5a_10k_skip.err" | tee "$L/r5a_10k_skip.log"
fi

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
# This session settles the corrupted r4b record with ALL legs pinned:
# the ORIGINAL r4b verdict (v1 647.1 vs pv2 796.4, preserved in the
# c157376 commit message and the advisor report) said the v2 kernels
# win ~+23%; the re-run that showed "parity" had let its base leg
# inherit the flipped defaults. Decide v2 defaults from THIS session's
# pinned v1 vs v2pair legs; decide skip_dead against the better of the
# two (it forces the v2 kernels).
ok10 = (s10 is None or b10 is None) or (s10 >= 0.98 * b10)
flip_v2 = bool(v1 and v2 and v2 > 1.01 * v1)
best = max(v for v in (v1, v2) if v) if (v1 or v2) else None
flip_skip = bool(best and skip and skip > 1.01 * best and ok10)
print(json.dumps({"v1": v1, "v2pair": v2, "skip": skip,
                  "10k_v1": b10, "10k_skip": s10,
                  "flip_v2_defaults": flip_v2,
                  "flip_skip_dead": flip_skip}))
src = pathlib.Path("weekend_raytracer_tpu/ops/pallas/regroup.py")
txt = txt0 = src.read_text()
if flip_v2:
    txt = txt.replace('os.environ.get("WRT_COMBINE_V2", "0")',
                      'os.environ.get("WRT_COMBINE_V2", "1")')
    txt = txt.replace('os.environ.get("WRT_PACK_V2", "0")',
                      'os.environ.get("WRT_PACK_V2", "1")')
if flip_skip:
    txt = txt.replace('os.environ.get("WRT_SKIP_DEAD", "0")',
                      'os.environ.get("WRT_SKIP_DEAD", "1")')
if txt != txt0:
    src.write_text(txt)
    pathlib.Path("benchmarks/chip_logs/r5a_flipped").write_text(
        f"v2={flip_v2} skip={flip_skip}\n")
EOF

if [ -f "$L/r5a_flipped" ]; then
  git add weekend_raytracer_tpu/ops/pallas/regroup.py "$L"
  git commit -m "Set regroup kernel defaults from the pinned-env chip A/B (r5a_verdict.json)

The r4b record was corrupted by an unpinned base leg; this session
re-measured v1 vs v2 vs skip_dead with every leg's env pinned and sets
the defaults from those numbers alone.

No-Verification-Needed: default flips gated on the on-chip A/B of bit-identical kernels"
  rm -f "$L/r5a_flipped"
fi

P
echo "=== 5. phase profile, v1 and v2 (reconcile the 237 ms model) ==="
if ! grep -q phase $L/r5a_prof_rtiow_v1.jsonl 2>/dev/null; then
WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 \
  timeout 2400 python benchmarks/profile_regroup.py rtiow \
  2>"$L/r5a_prof_rtiow_v1.err" | tee "$L/r5a_prof_rtiow_v1.jsonl"
fi
P
if ! grep -q phase $L/r5a_prof_rtiow_v2.jsonl 2>/dev/null; then
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=0 \
  timeout 2400 python benchmarks/profile_regroup.py rtiow \
  2>"$L/r5a_prof_rtiow_v2.err" | tee "$L/r5a_prof_rtiow_v2.jsonl"
fi

P
echo "=== 5b. headline with the FINAL defaults (post-flip, env unpinned) ==="
if ! grep -q metric $L/r5a_bench_final.json 2>/dev/null; then
timeout 1800 python bench.py 2>"$L/r5a_bench_final.err" | tee "$L/r5a_bench_final.json"
fi

P
echo "=== 6. ladder, all configs, FINAL defaults (harness r5, env unpinned) ==="
if ! grep -q 5-random10k $L/r5a_ladder.jsonl 2>/dev/null; then
timeout 5400 python benchmarks/ladder.py 2>"$L/r5a_ladder.err" | tee "$L/r5a_ladder.jsonl"
fi
if grep -q 5-random10k "$L/r5a_ladder.jsonl" 2>/dev/null; then
  cp "$L/r5a_ladder.jsonl" benchmarks/results_tpu_v5e.jsonl
  git add benchmarks/results_tpu_v5e.jsonl "$L"
  git commit -m "Ladder re-measured on the r5 harness under the session-decided defaults

No-Verification-Needed: benchmark-log bookkeeping only"
fi

echo "=== chip session r5a done ==="
