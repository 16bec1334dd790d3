#!/bin/bash
# Round 5: retrain the combined mlearn `all` model with per-species
# reference-energy baselines (config.per_species_energy_baseline;
# VERDICT r4 #2 — the round-4 `all` energy head was the mean predictor).
# Same corrected flags as the round-4 campaign plus the baseline switch.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/mlearn_r5
mkdir -p "$OUT"
echo "=== all start $(date +%T) ==="
timeout 14400 python -u -m alignn_tpu.scripts.train_mlearn \
  --elements all --output_dir "$OUT" \
  --override force_mult_natoms=false scheduler=onecycle_full \
  per_species_energy_baseline=true \
  > "$OUT/log_all.txt" 2>&1
rc=$?
echo "=== all done rc=$rc $(date +%T) ==="
tail -3 "$OUT/log_all.txt"
