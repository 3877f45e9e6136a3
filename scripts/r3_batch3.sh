#!/bin/bash
# Round-3 chip batch 3: A/Bs for the two changes batch 2 motivated —
#  (a) COO raster fixed (host-computed density scattered, no per-grid-cell
#      table gather; batch-2 measured the gather at 47 ms/batch),
#  (b) bf16 weight pre-cast (cast_conv_params; numerically identical) —
# plus the record-keeping bf16 arm batch 2 ran on the wrong (coo) layout,
# and the train-step batch-size sweep (VERDICT r2 #3 lever).
# Host CPU must be otherwise IDLE (see memory tpu-bench-cpu-contention).
set -u
OUT=${1:-/tmp/r3_batch3}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
  tail -2 "$OUT/$name.log"
}

# interleaved reps: tunnel throughput drifts session-to-session
for rep in 1 2; do
  run bench_coo_fixed 600 env BENCH_RASTER_LAYOUT=coo python bench.py
  run bench_flat_cast 600 python bench.py
  run bench_flat_nocast 600 env BENCH_CAST_W=0 python bench.py
done
run bench_bf16_flat 900 env BENCH_QUANT=none python bench.py
run stages_coo_fixed 900 python scripts/bench_stages.py --layout coo
run train_b8  1200 python bench_train.py
run train_b16 1200 env TRAIN_BENCH_BATCH=16 python bench_train.py
run train_b24 1200 env TRAIN_BENCH_BATCH=24 python bench_train.py
run train_b16_giou 1200 env TRAIN_BENCH_BATCH=16 TRAIN_BENCH_GIOU=1 python bench_train.py
echo "=== batch3 done ($(date +%H:%M:%S)) ==="
