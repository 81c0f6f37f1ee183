#!/bin/bash
# Round-5b serialized chip session: price the ROW-GRANULAR K1 TRAVERSAL
# (rowsweep — bit-identical, interpret-tested, AOT-lowered) and decide
# its default. Offline replay (docs/PERF.md round-3 sims) put the
# 128-ray-row union at ~160 tests/segment vs ~480 for the tile union on
# RTiOW cs8 and ~586 vs ~3344 on random10k cs8 — the structural attack
# on tests/segment that VERDICT r4 item 1 demands.
#
# ORDERING: the axon tunnel flaps every 5-50 min, so the legs that can
# change the shipped defaults run FIRST (tsub pick -> decision legs
# composed with the real defaults -> conservative auto-flip); the
# pinned-v1 mechanism/diagnostic legs run after. Every leg has a resume
# guard; the session is retried whole by the watcher on a tunnel drop.
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

echo "=== 1. RTiOW rowsweep k1c16 tsub8 (pinned v1 mechanism leg) ==="
if ! grep -q mrays $L/r5b_rtiow_c16t8.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t8.err" | tee "$L/r5b_rtiow_c16t8.log"
fi

P
echo "=== 2. RTiOW rowsweep k1c16 tsub32 (pinned v1 mechanism leg) ==="
if ! grep -q mrays $L/r5b_rtiow_c16t32.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t32.err" | tee "$L/r5b_rtiow_c16t32.log"
fi

P
echo "=== 3. pick the candidate tsub from the mechanism legs ==="
# Decision legs below compose rowsweep with the SHIPPED defaults
# (v2 + skip_dead, env unpinned otherwise) — that composition, not the
# pinned-v1 mechanism legs, is what a default flip would actually ship.
# Only scene-default k1c combos are candidates (a global k1c override
# cannot be flipped without hurting the other scene).
if [ ! -f "$L/r5b_tsub" ]; then
python - <<'EOF'
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

t8 = mrays("r5b_rtiow_c16t8.log")
t32 = mrays("r5b_rtiow_c16t32.log")
if t8 or t32:
    tsub = 8 if (t8 or 0.0) >= (t32 or 0.0) else 32
    pathlib.Path("benchmarks/chip_logs/r5b_tsub").write_text(str(tsub))
EOF
fi
TSUB=$(cat "$L/r5b_tsub" 2>/dev/null || echo 8)

echo "=== 4. RTiOW control: shipped defaults (spp32) ==="
if ! grep -q mrays $L/r5b_rtiow_ctrl.log 2>/dev/null; then
WRT_SPP=32 timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_ctrl.err" | tee "$L/r5b_rtiow_ctrl.log"
fi
P
echo "=== 5. RTiOW candidate: defaults + rowsweep tsub$TSUB ==="
if ! grep -q mrays $L/r5b_rtiow_cand.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=$TSUB WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_cand.err" | tee "$L/r5b_rtiow_cand.log"
fi
P
echo "=== 6. 10k control: shipped defaults (spp8) ==="
if ! grep -q mrays $L/r5b_10k_ctrl.log 2>/dev/null; then
WRT_SPP=8 timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_ctrl.err" | tee "$L/r5b_10k_ctrl.log"
fi
P
echo "=== 7. 10k candidate: defaults + rowsweep tsub$TSUB ==="
if ! grep -q mrays $L/r5b_10k_cand.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=$TSUB WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_cand.err" | tee "$L/r5b_10k_cand.log"
fi

P
echo "=== 8. decision summary + conservative auto-flip ==="
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
    "10k_c32t32", "10k_rs_def",
    "rtiow_ctrl", "rtiow_cand", "10k_ctrl", "10k_cand")}
tsub_p = pathlib.Path("benchmarks/chip_logs/r5b_tsub")
tsub = int(tsub_p.read_text()) if tsub_p.exists() else None
out["cand_tsub"] = tsub
# Flip rowsweep on only if the DEFAULTS composition wins on RTiOW and
# does not regress random10k (both legs on this same session/env).
rc, rx = out["rtiow_ctrl"], out["rtiow_cand"]
tc, tx = out["10k_ctrl"], out["10k_cand"]
flip = bool(rc and rx and rx > 1.01 * rc and
            (tc is None or tx is None or tx >= 0.98 * tc))
out["flip_rowsweep"] = flip
print(json.dumps(out))
if flip:
    src = pathlib.Path("weekend_raytracer_tpu/ops/pallas/regroup.py")
    txt = txt0 = src.read_text()
    txt = txt.replace('os.environ.get("WRT_ROWSWEEP", "0")',
                      'os.environ.get("WRT_ROWSWEEP", "1")')
    if tsub == 8:
        txt = txt.replace('os.environ.get("WRT_K1_TSUB", "32")',
                          'os.environ.get("WRT_K1_TSUB", "8")')
    if txt != txt0:
        src.write_text(txt)
        pathlib.Path("benchmarks/chip_logs/r5b_flipped").write_text(
            f"rowsweep=True tsub={tsub}\n")
EOF

if [ -f "$L/r5b_flipped" ]; then
  git add weekend_raytracer_tpu/ops/pallas/regroup.py "$L"
  git commit -m "Default on the row-granular K1 traversal from the chip sweep (r5b_verdict.json)

Decision legs composed rowsweep with the shipped defaults (v2 kernels +
skip_dead) on both the RTiOW and random10k scenes; the flip is gated on
a >1% RTiOW win with no random10k regression. Bit-identical kernels
(tests/test_regroup.py) — output is unchanged by construction.

No-Verification-Needed: default flip gated on the on-chip A/B of bit-identical kernels"
  rm -f "$L/r5b_flipped"
fi

# ---------- diagnostic / mechanism legs (run after the decision) ------

P
echo "=== 9. RTiOW base (pinned v1 control) ==="
if ! grep -q mrays $L/r5b_rtiow_base.log 2>/dev/null; then
WRT_ROWSWEEP=0 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_base.err" | tee "$L/r5b_rtiow_base.log"
fi

P
echo "=== 10. RTiOW rowsweep k1c8 tsub8 ==="
if ! grep -q mrays $L/r5b_rtiow_c8t8.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_CHUNK=8 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c8t8.err" | tee "$L/r5b_rtiow_c8t8.log"
fi

P
echo "=== 11. random10k base (pinned control) ==="
if ! grep -q mrays $L/r5b_10k_base.log 2>/dev/null; then
WRT_ROWSWEEP=0 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_base.err" | tee "$L/r5b_10k_base.log"
fi

P
echo "=== 12. random10k rowsweep k1c32 tsub32 (VERDICT item 5 structural attempt) ==="
# RTiOW priced tsub32 as the cheaper lockstep width (396.1 vs 190.0);
# the 10k sims put the per-row union at ~5.7x fewer tests vs the tile
# union (vs only ~3x on RTiOW), so the 10k verdict is NOT implied by
# the RTiOW loss — measure it. Pinned-v1 mechanism leg; compare
# against r5a_10k_v1.log (180.5).
if ! grep -q mrays $L/r5b_10k_c32t32.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_c32t32.err" | tee "$L/r5b_10k_c32t32.log"
fi

P
echo "=== 13. random10k rowsweep composed with shipped defaults (only if 12 won) ==="
python - <<'EOF' > "$L/r5b_10k_go" 2>/dev/null
import json, pathlib
def mrays(p):
    best = None
    f = pathlib.Path("benchmarks/chip_logs/" + p)
    if f.exists():
        for line in f.read_text().splitlines():
            try:
                best = max(best or 0.0, float(json.loads(line)["mrays"]))
            except Exception:
                pass
    return best
rs = mrays("r5b_10k_c32t32.log")
base = mrays("r5a_10k_v1.log")
print("1" if (rs and base and rs > 1.01 * base) else "0")
EOF
if [ "$(cat $L/r5b_10k_go 2>/dev/null)" = "1" ] && ! grep -q mrays $L/r5b_10k_rs_def.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_SPP=8 \
  timeout 1800 python benchmarks/sweep_wavefront.py 10k nomk r2,4,6 \
  2>"$L/r5b_10k_rs_def.err" | tee "$L/r5b_10k_rs_def.log"
fi

P
echo "=== 14. RTiOW rowsweep k1c8 tsub32 ==="
if ! grep -q mrays $L/r5b_rtiow_c8t32.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_CHUNK=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c8t32.err" | tee "$L/r5b_rtiow_c8t32.log"
fi

P
echo "=== 15. RTiOW rowsweep + v2 kernels together (k1c16 tsub8) ==="
if ! grep -q mrays $L/r5b_rtiow_c16t8v2.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_K1_TSUB=8 WRT_COMBINE_V2=1 WRT_PACK_V2=1 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t8v2.err" | tee "$L/r5b_rtiow_c16t8v2.log"
fi

P
echo "=== 16. RTiOW rowsweep K1+K0 (k1c16 tsub8) ==="
if ! grep -q mrays $L/r5b_rtiow_c16t8k0.log 2>/dev/null; then
WRT_ROWSWEEP=1 WRT_ROWSWEEP_K0=1 WRT_K1_TSUB=8 WRT_COMBINE_V2=0 WRT_PACK_V2=0 WRT_SKIP_DEAD=0 WRT_SPP=32 \
  timeout 1800 python benchmarks/sweep_wavefront.py rtiow nomk r2,4,6 \
  2>"$L/r5b_rtiow_c16t8k0.err" | tee "$L/r5b_rtiow_c16t8k0.log"
fi

# (stats legs moved to chip_session_r5d.sh — they are diagnostics with
# fresh Mosaic compiles; the flapping tunnel must not starve the r5c
# final capture behind them.)

P
echo "=== 18. full summary (decision + diagnostics) ==="
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
    "10k_c32t32", "10k_rs_def",
    "rtiow_ctrl", "rtiow_cand", "10k_ctrl", "10k_cand")}
tsub_p = pathlib.Path("benchmarks/chip_logs/r5b_tsub")
out["cand_tsub"] = int(tsub_p.read_text()) if tsub_p.exists() else None
rc, rx = out["rtiow_ctrl"], out["rtiow_cand"]
tc, tx = out["10k_ctrl"], out["10k_cand"]
out["flip_rowsweep"] = bool(rc and rx and rx > 1.01 * rc and
                            (tc is None or tx is None or tx >= 0.98 * tc))
print(json.dumps(out))
EOF

echo "=== chip session r5b done ==="
