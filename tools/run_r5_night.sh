#!/bin/bash
# Final round-5 chip schedule: envelope-Si first (new capability), then
# resume knn150 from its epoch-61 restart with whatever time remains.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/r5
stall_run() {
  log=$1; tmo=$2; attempts=$3; shift 3
  touch "$log"
  for attempt in $(seq 1 "$attempts"); do
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

if [ ! -f "$OUT/Si_envelope/Test_results.json" ]; then
  echo "=== Si_envelope start $(date +%T) ==="
  stall_run "$OUT/log_Si_envelope.txt" 7200 8 \
    python -u -m alignn_tpu.scripts.train_mlearn \
    --elements Si --output_dir "$OUT/tmp_Si_envelope" --resume auto \
    --override force_mult_natoms=false scheduler=onecycle_full \
    neighbor_strategy=radius_graph cutoff=4.5 batch_size=2 epochs=60 \
    envelope_edge_weights=true envelope_cutoff=4.5
  rc=$?
  if [ -d "$OUT/tmp_Si_envelope/Si" ]; then
    rm -rf "$OUT/Si_envelope"; mv "$OUT/tmp_Si_envelope/Si" "$OUT/Si_envelope"
  fi
  echo "=== Si_envelope done rc=$rc $(date +%T) ==="
fi

if [ ! -f "$OUT/Si_knn150/Test_results.json" ]; then
  echo "=== Si_knn150 resume $(date +%T) ==="
  stall_run "$OUT/log_Si_knn150.txt" 7200 8 \
    python -u -m alignn_tpu.scripts.train_mlearn \
    --elements Si --output_dir "$OUT/tmp_Si_knn150" --resume auto \
    --override force_mult_natoms=false scheduler=onecycle_full epochs=150
  rc=$?
  if [ -d "$OUT/tmp_Si_knn150/Si" ]; then
    rm -rf "$OUT/Si_knn150"; mv "$OUT/tmp_Si_knn150/Si" "$OUT/Si_knn150"
  fi
  echo "=== Si_knn150 done rc=$rc $(date +%T) ==="
fi
echo "NIGHT QUEUE COMPLETE $(date)"
