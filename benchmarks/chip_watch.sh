#!/bin/bash
# Watch for the axon tunnel to come back, then fire the queued round-4
# chip session (benchmarks/chip_session.sh). Probe is a cheap readback;
# backend init HANGS when the tunnel is down, so every probe is bounded.
# Logs to benchmarks/chip_logs/watch.log.
cd /root/repo
mkdir -p benchmarks/chip_logs
W=benchmarks/chip_logs/watch.log
echo "watch start $(date -u +%FT%TZ)" >> "$W"
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,128)).sum()) == 1024.0" 2>/dev/null; then
    echo "chip up $(date -u +%FT%TZ); firing session" >> "$W"
    bash benchmarks/chip_session.sh >> benchmarks/chip_logs/session_r4.log 2>&1
    rc=$?
    echo "session exited rc=$rc $(date -u +%FT%TZ)" >> "$W"
    # rc!=0 => tunnel dropped mid-session; keep watching and re-fire
    # (chip_session steps tee to per-step logs, so a re-run just
    # re-measures; persistent compile cache makes repeats cheap).
    if [ $rc -eq 0 ]; then
      echo "watch done $(date -u +%FT%TZ)" >> "$W"
      exit 0
    fi
  else
    echo "probe down $(date -u +%FT%TZ)" >> "$W"
  fi
  sleep 120
done
