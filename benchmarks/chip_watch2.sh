#!/bin/bash
# Watch for the axon tunnel and fire the queued round-4b session
# (benchmarks/chip_session2.sh). Same pattern as chip_watch.sh.
cd /root/repo
mkdir -p benchmarks/chip_logs
W=benchmarks/chip_logs/watch2.log
echo "watch2 start $(date -u +%FT%TZ)" >> "$W"
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,128)).sum()) == 1024.0" 2>/dev/null; then
    echo "chip up $(date -u +%FT%TZ); firing session2" >> "$W"
    bash benchmarks/chip_session2.sh >> benchmarks/chip_logs/session_r4b.log 2>&1
    rc=$?
    echo "session2 exited rc=$rc $(date -u +%FT%TZ)" >> "$W"
    if [ $rc -eq 0 ]; then
      echo "watch2 done $(date -u +%FT%TZ)" >> "$W"
      exit 0
    fi
  else
    echo "probe down $(date -u +%FT%TZ)" >> "$W"
  fi
  sleep 120
done
