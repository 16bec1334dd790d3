#!/bin/bash
# Round-5 resume watchdog with STALL DETECTION: launches the mlearn r5
# `all` resume leg, watches the log mtime, and kills its own child (by
# exact pid, never pattern) when the log goes silent >8 min — the
# wedge signature seen twice today.  Re-arms until Test_results.json
# exists.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/runs/mlearn_r5/log_all_resume.txt
STALL_S=480
for attempt in $(seq 1 40); do
  if [ -f runs/mlearn_r5/all/Test_results.json ]; then
    echo "watchdog: run complete $(date)" >> "$LOG"; exit 0
  fi
  if ! timeout 60 python -c "
from alignn_tpu.backend_retry import probe_devices_subprocess
probe_devices_subprocess()" 2>/dev/null; then
    echo "watchdog: tunnel down, wait $(date)" >> "$LOG"
    sleep 110; continue
  fi
  echo "watchdog: attempt $attempt start $(date)" >> "$LOG"
  timeout 10800 python -u -m alignn_tpu.cli.train \
    --root_dir runs/mlearn_r5/all_data \
    --config_name runs/mlearn_r5/config_all.json \
    --output_dir runs/mlearn_r5/all \
    --target_key total_energy --resume auto >> "$LOG" 2>&1 &
  child=$!
  while kill -0 "$child" 2>/dev/null; do
    sleep 60
    age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$age" -gt "$STALL_S" ]; then
      echo "" >> "$LOG"
      echo "watchdog: log silent ${age}s — killing $child $(date)" >> "$LOG"
      # exact-pid kill of the timeout wrapper AND the python child
      pkill -9 -P "$child" 2>/dev/null   # timeout's direct child only
      kill -9 "$child" 2>/dev/null
      break
    fi
  done
  wait "$child" 2>/dev/null
  echo "watchdog: attempt $attempt ended rc=$? $(date)" >> "$LOG"
  sleep 10
done
echo "watchdog exhausted $(date)" >> "$LOG"; exit 1
