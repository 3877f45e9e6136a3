#!/bin/bash
# Round-3 chip batch 4 (short): COO raster with a right-sized lane capacity
# (batch 3 ran the cell scatters over the 229k-lane raw-point cap; scatter
# cost scales with CAPACITY, and live cells are ~80k) + train batch-32 arm.
set -u
OUT=${1:-/tmp/r3_batch4}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # name timeout cmd...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >>"$OUT/$name.log" 2>&1
  tail -2 "$OUT/$name.log"
}

for rep in 1 2; do
  run bench_coo_sized 600 python bench.py
done
run stages_coo_sized 900 python scripts/bench_stages.py --layout coo
run train_b32 1200 env TRAIN_BENCH_BATCH=32 python bench_train.py
run train_b24_rep2 1200 env TRAIN_BENCH_BATCH=24 python bench_train.py
echo "=== batch4 done ($(date +%H:%M:%S)) ==="
