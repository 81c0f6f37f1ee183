#!/bin/bash
# Watch for the axon tunnel and fire the queued round-5 sessions in
# order (r5a: ladder/skip_dead/phase-profiles, r5b: rowsweep pricing +
# default decision, r5c: final capture under the shipped defaults).
# Same pattern as chip_watch.sh / chip_watch2.sh; a session that aborts
# mid-run (tunnel flap) is retried whole — every leg is idempotent and
# logs overwrite.
cd /root/repo
mkdir -p benchmarks/chip_logs
W=benchmarks/chip_logs/watch_r5.log
echo "watch_r5 start $(date -u +%FT%TZ)" >> "$W"
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert float(jnp.ones((8,128)).sum()) == 1024.0" 2>/dev/null; then
    echo "chip up $(date -u +%FT%TZ)" >> "$W"
    if [ ! -f benchmarks/chip_logs/r5a_done ]; then
      echo "firing session r5a $(date -u +%FT%TZ)" >> "$W"
      bash benchmarks/chip_session_r5a.sh >> benchmarks/chip_logs/session_r5a.log 2>&1
      rc=$?
      echo "r5a exited rc=$rc $(date -u +%FT%TZ)" >> "$W"
      [ $rc -eq 0 ] && touch benchmarks/chip_logs/r5a_done
    elif [ ! -f benchmarks/chip_logs/r5c_done ]; then
      echo "firing session r5c $(date -u +%FT%TZ)" >> "$W"
      bash benchmarks/chip_session_r5c.sh >> benchmarks/chip_logs/session_r5c.log 2>&1
      rc=$?
      echo "r5c exited rc=$rc $(date -u +%FT%TZ)" >> "$W"
      [ $rc -eq 0 ] && touch benchmarks/chip_logs/r5c_done
    elif [ ! -f benchmarks/chip_logs/r5b_done ]; then
      echo "firing session r5b $(date -u +%FT%TZ)" >> "$W"
      bash benchmarks/chip_session_r5b.sh >> benchmarks/chip_logs/session_r5b.log 2>&1
      rc=$?
      echo "r5b exited rc=$rc $(date -u +%FT%TZ)" >> "$W"
      [ $rc -eq 0 ] && touch benchmarks/chip_logs/r5b_done
    elif [ ! -f benchmarks/chip_logs/r5d_done ]; then
      echo "firing session r5d $(date -u +%FT%TZ)" >> "$W"
      bash benchmarks/chip_session_r5d.sh >> benchmarks/chip_logs/session_r5d.log 2>&1
      rc=$?
      echo "r5d exited rc=$rc $(date -u +%FT%TZ)" >> "$W"
      [ $rc -eq 0 ] && touch benchmarks/chip_logs/r5d_done
    else
      echo "watch_r5 done $(date -u +%FT%TZ)" >> "$W"
      exit 0
    fi
  else
    echo "probe down $(date -u +%FT%TZ)" >> "$W"
  fi
  sleep 120
done
