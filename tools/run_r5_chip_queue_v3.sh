#!/bin/bash
# Round-5 chip queue, v3 (19:10 replan): gw20-from-scratch learned
# NEITHER task (force L1 frozen at init for 15 epochs — BENCH_NOTES);
# switch to the two-stage recipe: fine-tune the FORCE-GOOD gw1
# checkpoint (runs/mlearn_r5/all, force MAE 0.0731) with
# graphwise_weight=20 at low LR so the energy head re-pins while
# forces stay.  Then the bench A/B + Si radius A/B + dtype audit.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/r5
mkdir -p "$OUT" runs/mlearn_r5_ft

stall_run() {  # stall_run <logfile> <timeout_s> <cmd...>
  log=$1; tmo=$2; shift 2
  touch "$log"
  for attempt in 1 2 3; do
    timeout "$tmo" "$@" >> "$log" 2>&1 &
    child=$!
    while kill -0 "$child" 2>/dev/null; do
      sleep 60
      age=$(( $(date +%s) - $(stat -c %Y "$log") ))
      if [ "$age" -gt 480 ]; then
        echo "stall_run: log silent ${age}s, killing $child" >> "$log"
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

# `all` energy legs concluded 20:35 — four-point weight frontier measured
# (gw50 / gw20-scratch / gw20-ft / 1:1+baseline), mechanism documented in
# BENCH_NOTES; no further all legs this round.

echo "=== bench largecell A/B start $(date +%T) ==="
for leg in "base:" "lg40:4.0" "lg35:3.5"; do
  name="${leg%%:*}"; val="${leg#*:}"
  if [ -s "$OUT/bench_largecell_$name.json" ]; then
    echo "--- $name cached, skip"; continue
  fi
  echo "--- largecell $name (lg=$val) $(date +%T)"
  env ALIGNN_TPU_BENCH_LARGECELL=1 \
      ${val:+ALIGNN_TPU_BENCH_LG_CUTOFF=$val} \
      timeout 1800 python -u bench.py \
      > "$OUT/bench_largecell_$name.json" 2> "$OUT/bench_largecell_$name.err"
  echo "rc=$? $(tail -c 400 "$OUT/bench_largecell_$name.json")"
done

train_leg() {
  el_out=$1; shift
  if [ -f "$OUT/$el_out/Test_results.json" ]; then
    echo "=== $el_out already done, skipping ==="; return
  fi
  echo "=== $el_out start $(date +%T) ==="
  stall_run "$OUT/log_$el_out.txt" 14400 \
    python -u -m alignn_tpu.scripts.train_mlearn \
    --elements Si --output_dir "$OUT/tmp_$el_out" --resume auto \
    --override force_mult_natoms=false scheduler=onecycle_full "$@"
  rc=$?
  if [ -d "$OUT/tmp_$el_out/Si" ]; then
    rm -rf "$OUT/$el_out"; mv "$OUT/tmp_$el_out/Si" "$OUT/$el_out"
  fi
  echo "=== $el_out done rc=$rc $(date +%T) ==="
  tail -3 "$OUT/log_$el_out.txt"
}

train_leg Si_radius_full  neighbor_strategy=radius_graph cutoff=4.5 \
  batch_size=2 epochs=60
train_leg Si_radius_lg35  neighbor_strategy=radius_graph cutoff=4.5 \
  batch_size=2 epochs=60 lg_cutoff=3.5

echo "=== dtype audit (optimized HLO, dense) $(date +%T) ==="
timeout 3600 python -u tools/dtype_audit.py --optimized --b 16 \
  > "$OUT/dtype_audit_optimized.json" 2> "$OUT/dtype_audit_optimized.err"
echo "rc=$?"
tail -5 "$OUT/dtype_audit_optimized.json"

echo "QUEUE COMPLETE $(date)"
