#!/bin/bash
# mlearn accuracy campaign, round 4: all six elements + combined `all`.
# One python per element under timeout so a wedged tunnel can't kill the
# campaign. Order: the legs missing from round 3 first.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=runs/mlearn_r4
for el in Cu Li Ni Si Ge Mo all; do
  if [ -f "$OUT/$el/Test_results.json" ]; then
    echo "=== $el already done, skipping ==="; continue
  fi
  echo "=== $el start $(date +%T) ==="
  timeout 10800 python -u -m alignn_tpu.scripts.train_mlearn \
    --elements "$el" --output_dir "$OUT" \
    --override force_mult_natoms=false scheduler=onecycle_full \
    > "$OUT/log_$el.txt" 2>&1
  rc=$?
  echo "=== $el done rc=$rc $(date +%T) ==="
  tail -3 "$OUT/log_$el.txt"
done
echo "CAMPAIGN COMPLETE $(date)"
