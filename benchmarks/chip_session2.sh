#!/bin/bash
# Round-4b serialized chip session: price the overhead-kernel rewrites
# (combine_v2, pack_v2 — both bit-identical, interpret-tested, AOT-
# lowered) and, if they win, flip their defaults and re-capture the
# headline. Ordered most-valuable-first so a tunnel drop mid-session
# still leaves the A/B verdicts on disk.
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

echo "=== 1. RTiOW A/B: overhead-kernel rewrites (dyn_grid default-on baseline) ==="
WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/r4b_rtiow_base.err" | tee "$L/r4b_rtiow_base.log"
P
WRT_COMBINE_V2=1 WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/r4b_rtiow_cv2.err" | tee "$L/r4b_rtiow_cv2.log"
P
WRT_PACK_V2=1 WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/r4b_rtiow_pv2.err" | tee "$L/r4b_rtiow_pv2.log"
P
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 2>"$L/r4b_rtiow_both.err" | tee "$L/r4b_rtiow_both.log"

P
echo "=== 2. random10k A/B (both rewrites) ==="
WRT_SPP=8 timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>"$L/r4b_10k_base.err" | tee "$L/r4b_10k_base.log"
P
WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SPP=8 timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 2>"$L/r4b_10k_both.err" | tee "$L/r4b_10k_both.log"

P
echo "=== 3. decide defaults from the measurements ==="
python - <<'EOF' | tee "$L/r4b_verdict.json"
import json, re, pathlib

def mrays(path):
    best = None
    p = pathlib.Path(path)
    if not p.exists():
        return None
    for line in p.read_text().splitlines():
        try:
            d = json.loads(line)
            best = max(best or 0.0, float(d["mrays"]))
        except Exception:
            pass
    return best

L = "benchmarks/chip_logs/"
base = mrays(L + "r4b_rtiow_base.log")
cv2 = mrays(L + "r4b_rtiow_cv2.log")
pv2 = mrays(L + "r4b_rtiow_pv2.log")
both = mrays(L + "r4b_rtiow_both.log")
b10 = mrays(L + "r4b_10k_base.log")
both10 = mrays(L + "r4b_10k_both.log")
# flip a knob's default only if it wins on RTiOW (>1%) and does not
# lose on 10k (>2% regression vetoes: 10k is overhead-light, so a
# loss there means the kernel itself is slower, not just rarer)
ok10 = (b10 is None or both10 is None) or (both10 >= 0.98 * b10)
flip_c = bool(base and cv2 and cv2 > 1.01 * base and ok10)
# pack's marginal value: alone vs base, or on top of a flipped combine
flip_p = bool(base and ok10 and (
    (pv2 and pv2 > 1.01 * base)
    or (flip_c and both and cv2 and both > 1.01 * cv2)))
print(json.dumps({"base": base, "cv2": cv2, "pv2": pv2, "both": both,
                  "10k_base": b10, "10k_both": both10,
                  "flip_combine": flip_c, "flip_pack": flip_p}))
src = pathlib.Path("weekend_raytracer_tpu/ops/pallas/regroup.py")
txt = txt0 = src.read_text()
if flip_c:
    txt = txt.replace('os.environ.get("WRT_COMBINE_V2", "0")',
                      'os.environ.get("WRT_COMBINE_V2", "1")')
if flip_p:
    txt = txt.replace('os.environ.get("WRT_PACK_V2", "0")',
                      'os.environ.get("WRT_PACK_V2", "1")')
if txt != txt0:
    src.write_text(txt)
    pathlib.Path("benchmarks/chip_logs/r4b_flipped").write_text(
        f"combine={flip_c} pack={flip_p}\n")
EOF

if [ -f "$L/r4b_flipped" ]; then
  git add weekend_raytracer_tpu/ops/pallas/regroup.py "$L"
  git commit -m "Default on the measured overhead-kernel wins (combine_v2/pack_v2): chip A/B in benchmarks/chip_logs/r4b_verdict.json

No-Verification-Needed: defaults flip is gated on the on-chip A/B measurement of bit-identical kernels"
fi

P
echo "=== 4. headline with the final defaults (driver format) ==="
timeout 1800 python bench.py 2>"$L/r4b_bench.err" | tee "$L/r4b_bench.json"

P
echo "=== 5. phase profile with the final defaults ==="
timeout 2400 python benchmarks/profile_regroup.py rtiow 2>"$L/r4b_prof_rtiow.err" | tee "$L/r4b_prof_rtiow.jsonl"

P
echo "=== 6. ladder, all configs, final defaults ==="
timeout 3600 python benchmarks/ladder.py 2>"$L/r4b_ladder.err" | tee "$L/r4b_ladder.jsonl"
if [ -s "$L/r4b_ladder.jsonl" ] && grep -q rays_per_sec "$L/r4b_ladder.jsonl"; then
  cp "$L/r4b_ladder.jsonl" benchmarks/results_tpu_v5e.jsonl
  git add benchmarks/results_tpu_v5e.jsonl "$L"
  git commit -m "Ladder re-measured with the round-4b defaults

No-Verification-Needed: benchmark-log bookkeeping only"
fi

echo "=== chip session 2 done ==="
