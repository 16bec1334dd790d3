#!/bin/bash
# Round-5 chip queue (run AFTER the mlearn `all` retrain frees the chip).
#
# 1. Large-cell bench A/B: baseline vs pruned-L (lg_cutoff 4.0 / 3.5)
# 2. Si radius-graph training A/B at equal horizon: full L vs lg_cutoff
#    3.5 — the accuracy arm of the VERDICT r4 #3a lever, and the
#    science-grade (smooth, no k-NN topology cliffs) Si potential
# 3. Si k-NN long horizon (150 epochs): force-MAE push toward MTP 0.09
#
# Every leg is its own python under timeout (tunnel-wedge discipline).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/r5
mkdir -p "$OUT"

echo "=== bench largecell A/B start $(date +%T) ==="
for leg in "base:" "lg40:4.0" "lg35:3.5"; do
  name="${leg%%:*}"; val="${leg#*:}"
  if [ -f "$OUT/bench_largecell_$name.json" ]; then
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
  timeout 14400 python -u -m alignn_tpu.scripts.train_mlearn \
    --elements Si --output_dir "$OUT/tmp_$el_out" \
    --override force_mult_natoms=false scheduler=onecycle_full "$@" \
    > "$OUT/log_$el_out.txt" 2>&1
  rc=$?
  # train_mlearn writes to <output_dir>/Si; move to the leg name
  if [ -d "$OUT/tmp_$el_out/Si" ]; then
    rm -rf "$OUT/$el_out"; mv "$OUT/tmp_$el_out/Si" "$OUT/$el_out"
    cp "$OUT/tmp_$el_out"/config_Si.json "$OUT/$el_out/config_override.json" 2>/dev/null
  fi
  echo "=== $el_out done rc=$rc $(date +%T) ==="
  tail -3 "$OUT/log_$el_out.txt"
}

train_leg Si_radius_full  neighbor_strategy=radius_graph cutoff=4.5 \
  batch_size=2 epochs=60
train_leg Si_radius_lg35  neighbor_strategy=radius_graph cutoff=4.5 \
  batch_size=2 epochs=60 lg_cutoff=3.5
train_leg Si_knn_150      epochs=150

echo "=== dtype audit (optimized HLO, dense) $(date +%T) ==="
timeout 3600 python -u tools/dtype_audit.py --optimized --b 16 \
  > "$OUT/dtype_audit_optimized.json" 2> "$OUT/dtype_audit_optimized.err"
echo "rc=$?"
tail -5 "$OUT/dtype_audit_optimized.json"

echo "QUEUE COMPLETE $(date)"
