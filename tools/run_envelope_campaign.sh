#!/bin/bash
# Envelope-variant campaign for more elements (each ~25-30 min).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/r5
stall_run() {
  log=$1; tmo=$2; shift 2
  touch "$log"
  for attempt in 1 2 3 4 5; do
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
for el in Ge Cu Li; do
  if [ -f "$OUT/${el}_envelope/Test_results.json" ]; then continue; fi
  echo "=== ${el}_envelope start $(date +%T) ==="
  stall_run "$OUT/log_${el}_envelope.txt" 5400 \
    python -u -m alignn_tpu.scripts.train_mlearn \
    --elements "$el" --output_dir "$OUT/tmp_${el}_envelope" --resume auto \
    --override force_mult_natoms=false scheduler=onecycle_full \
    neighbor_strategy=radius_graph cutoff=4.5 batch_size=2 epochs=60 \
    envelope_edge_weights=true envelope_cutoff=4.5
  rc=$?
  if [ -d "$OUT/tmp_${el}_envelope/Si" ]; then
    # train_mlearn writes under the ELEMENT name
    :
  fi
  if [ -d "$OUT/tmp_${el}_envelope/$el" ]; then
    rm -rf "$OUT/${el}_envelope"
    mv "$OUT/tmp_${el}_envelope/$el" "$OUT/${el}_envelope"
  fi
  echo "=== ${el}_envelope done rc=$rc $(date +%T) ==="
  grep test_ "$OUT/log_${el}_envelope.txt" | tail -1
done
echo "ENVELOPE CAMPAIGN COMPLETE $(date)"
