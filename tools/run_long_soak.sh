#!/bin/bash
# Long-horizon production soak (VERDICT r3 #9): 2000 epochs of the
# flagship FF recipe on device, SIGKILLed once mid-run and resumed with
# --resume auto — exercises prefetch loader, per-epoch checkpoint
# cadence, compile cache, backend retry, and device kill-resume in one
# multi-hour session.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=${1:-/tmp/long_soak_r4}
mkdir -p "$WORK"
cat > "$WORK/config.json" <<'CFG'
{"epochs": 1200, "batch_size": 8, "n_train": 40, "n_val": 5, "n_test": 5,
 "learning_rate": 0.001, "keep_data_order": true,
 "dense_neighborhoods": true, "dtype": "bfloat16",
 "model": {"name": "alignn_atomwise", "alignn_layers": 4,
  "gcn_layers": 4, "hidden_features": 256, "embedding_features": 64,
  "calculate_gradient": true, "gradwise_weight": 10.0,
  "stresswise_weight": 0.05, "graphwise_weight": 1.0}}
CFG
run() {
  timeout "$1" python -u -m alignn_tpu.cli.train \
    --root_dir /root/reference/alignn/examples/sample_data_ff \
    --config_name "$WORK/config.json" --target_key total_energy \
    --output_dir "$WORK/out" --resume auto >> "$WORK/log.txt" 2>&1
  echo "leg rc=$? at $(date +%T)" >> "$WORK/log.txt"
}
echo "soak start $(date)" > "$WORK/log.txt"
# leg 1: run ~35 min then SIGKILL (timeout sends TERM; use -s KILL)
timeout -s KILL 2100 python -u -m alignn_tpu.cli.train \
  --root_dir /root/reference/alignn/examples/sample_data_ff \
  --config_name "$WORK/config.json" --target_key total_energy \
  --output_dir "$WORK/out" >> "$WORK/log.txt" 2>&1
echo "KILLED leg1 rc=$? at $(date +%T)" >> "$WORK/log.txt"
# leg 2: resume and run to completion (bounded)
run 7200
echo "soak done $(date)" >> "$WORK/log.txt"
grep -ac "^epoch" "$WORK/log.txt" >> "$WORK/log.txt"
