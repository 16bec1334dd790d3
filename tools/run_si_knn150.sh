#!/bin/bash
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/r5
stall_run() {
  log=$1; tmo=$2; shift 2
  touch "$log"
  for attempt in 1 2 3; do
    timeout "$tmo" "$@" >> "$log" 2>&1 &
    child=$!
    while kill -0 "$child" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      if [ "$age" -gt 480 ]; then
        echo "stall_run: silent ${age}s, killing $child" >> "$log"
        pkill -9 -P "$child" 2>/dev/null; kill -9 "$child" 2>/dev/null
        break
      fi
    done
    wait "$child" 2>/dev/null; rc=$?
    echo "stall_run: attempt $attempt rc=$rc" >> "$log"
    [ $rc -eq 0 ] && return 0
    sleep 30
  done
  return 1
}
stall_run "$OUT/log_Si_knn150.txt" 10800 \
  python -u -m alignn_tpu.scripts.train_mlearn \
  --elements Si --output_dir "$OUT/tmp_Si_knn150" --resume auto \
  --override force_mult_natoms=false scheduler=onecycle_full epochs=150
rc=$?
if [ -d "$OUT/tmp_Si_knn150/Si" ]; then
  rm -rf "$OUT/Si_knn150"; mv "$OUT/tmp_Si_knn150/Si" "$OUT/Si_knn150"
fi
echo "Si_knn150 done rc=$rc $(date)"
tail -3 "$OUT/log_Si_knn150.txt"
