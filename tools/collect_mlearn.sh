#!/bin/bash
# Copy the durable mlearn campaign artifacts (small jsons, no weights)
# out of the gitignored runs/ into docs/mlearn_r4/ for commit.
SRC=/root/repo/runs/mlearn_r4
DST=/root/repo/docs/mlearn_r4
mkdir -p "$DST"
for el in Cu Li Ni Si Ge Mo all; do
  d="$SRC/$el"
  [ -f "$d/Test_results.json" ] || continue
  mkdir -p "$DST/$el"
  cp "$d/Test_results.json" "$DST/$el/" 2>/dev/null
  cp "$d/history_val.json" "$DST/$el/" 2>/dev/null
  cp "$d/config.json" "$DST/$el/" 2>/dev/null
  cp "$d/ids_train_val_test.json" "$DST/$el/" 2>/dev/null
done
cp "$SRC/mlearn_summary.json" "$DST/" 2>/dev/null
ls "$DST"
