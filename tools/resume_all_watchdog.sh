#!/bin/bash
# Wait for the axon tunnel to recover, then resume the mlearn `all` run
# from its epoch-granular restart.mpk (--resume auto).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/root/repo/runs/mlearn_r4/log_all_resume.txt
echo "watchdog start $(date)" > "$LOG"
for i in $(seq 1 120); do
  if timeout 60 python -c "
from alignn_tpu.backend_retry import probe_devices_subprocess
probe_devices_subprocess()" 2>/dev/null; then
    echo "tunnel recovered $(date)" >> "$LOG"
    timeout 9000 python -u -m alignn_tpu.cli.train \
      --root_dir runs/mlearn_r4/all_data \
      --config_name runs/mlearn_r4/config_all.json \
      --output_dir runs/mlearn_r4/all \
      --target_key total_energy --resume auto >> "$LOG" 2>&1
    echo "resume leg rc=$? $(date)" >> "$LOG"
    exit 0
  fi
  sleep 110
done
echo "tunnel never recovered $(date)" >> "$LOG"
