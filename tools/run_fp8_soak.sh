#!/bin/bash
# fp8 accuracy soak: the 80-epoch sample_data_ff recipe (BENCH_NOTES
# "FF variant"), fp8 L-table storage ON vs OFF, same config/seed.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
WORK=$(mktemp -d /tmp/fp8_soak_XXXX)
cat > "$WORK/config.json" <<'CFG'
{"epochs": 80, "batch_size": 8, "n_train": 40, "n_val": 5, "n_test": 5,
 "learning_rate": 0.001, "keep_data_order": true,
 "dense_neighborhoods": true, "dtype": "bfloat16",
 "model": {"name": "alignn_atomwise", "alignn_layers": 4,
  "gcn_layers": 4, "hidden_features": 256, "embedding_features": 64,
  "calculate_gradient": true, "gradwise_weight": 10.0,
  "stresswise_weight": 0.05, "graphwise_weight": 1.0}}
CFG
for leg in bf16 fp8; do
  env=""
  [ "$leg" = fp8 ] && env="ALIGNN_TPU_FP8_LTABLES=1"
  echo "=== $leg start $(date +%T) ==="
  timeout 3000 env $env python -u -m alignn_tpu.cli.train \
    --root_dir /root/reference/alignn/examples/sample_data_ff \
    --config_name "$WORK/config.json" --target_key total_energy \
    --output_dir "$WORK/$leg" 2>&1 | grep -av "it/s" | tail -4
  echo "=== $leg done rc=$? $(date +%T) ==="
done
echo "WORK=$WORK"
