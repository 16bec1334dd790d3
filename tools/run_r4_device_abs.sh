#!/bin/bash
# Round-4 device measurement session (run AFTER the mlearn campaign):
# interleaved fp8 A/B at b64 dense, then the large-cell radius leg.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=/tmp/r4_device_abs.jsonl
: > "$OUT"
run() {
  local tag="$1"; shift
  echo "=== $tag $(date +%T) ===" >> "$OUT"
  timeout 1800 env "$@" python -u bench.py >> "$OUT" 2>/dev/null
  echo "rc=$?" >> "$OUT"
}
# interleaved 2x2: HEAD / fp8 / HEAD / fp8 (fenced 30-iter runs inside)
run head1
run fp8_1 ALIGNN_TPU_FP8_LTABLES=1
run head2
run fp8_2 ALIGNN_TPU_FP8_LTABLES=1
# large-cell radius leg (sparse), HEAD twice
run largecell1 ALIGNN_TPU_BENCH_LARGECELL=1
run largecell2 ALIGNN_TPU_BENCH_LARGECELL=1
echo "DEVICE ABS COMPLETE $(date)" >> "$OUT"
cat "$OUT"
