#!/bin/bash
# Round-3 chip batch 5 (final): confirm the shipped bench default (COO,
# capped), eval-CLI serving A/B (from_cells vs from_points wall-clock on a
# 64-frame synthetic val), and the missing GIoU b8 train arm.
set -u
OUT=${1:-/tmp/r3_batch5}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  local t0=$SECONDS
  timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
  echo "wall $((SECONDS - t0)) s" >>"$OUT/$name.log"
  tail -3 "$OUT/$name.log"
}

for rep in 1 2; do
  run bench_default 600 python bench.py
done
EVAL="python -m complex_yolov4_tpu.cli.evaluate --synthetic --synthetic_frames 64 \
  --model complex_yolov4 --num_samples 32 --batch_size 16 --compute_dtype bfloat16"
run eval_points 900 $EVAL
run eval_cells  900 $EVAL --cells_raster
run train_b8_giou 1200 env TRAIN_BENCH_GIOU=1 python bench_train.py
echo "=== batch5 done ($(date +%H:%M:%S)) ==="
