#!/bin/bash
# Round-5 twin of resume_all_watchdog.sh: wait for the tunnel, resume
# the mlearn r5 `all` (per-species-baseline) run from restart.mpk, and
# keep re-arming until the run completes (Test_results.json exists).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/runs/mlearn_r5/log_all_resume.txt
echo "watchdog start $(date)" >> "$LOG"
for i in $(seq 1 120); do
  if [ -f runs/mlearn_r5/all/Test_results.json ]; then
    echo "run complete $(date)" >> "$LOG"
    exit 0
  fi
  if timeout 60 python -c "
from alignn_tpu.backend_retry import probe_devices_subprocess
probe_devices_subprocess()" 2>/dev/null; then
    echo "tunnel alive, (re)starting resume leg $(date)" >> "$LOG"
    timeout 10800 python -u -m alignn_tpu.cli.train \
      --root_dir runs/mlearn_r5/all_data \
      --config_name runs/mlearn_r5/config_all.json \
      --output_dir runs/mlearn_r5/all \
      --target_key total_energy --resume auto >> "$LOG" 2>&1
    rc=$?
    echo "resume leg rc=$rc $(date)" >> "$LOG"
    if [ -f runs/mlearn_r5/all/Test_results.json ]; then
      echo "run complete $(date)" >> "$LOG"
      exit 0
    fi
  fi
  sleep 110
done
echo "watchdog exhausted $(date)" >> "$LOG"
exit 1
