#!/bin/bash
# Round-3 chip batch 2: COO-vs-flat raster A/B at the reconciled default
# config (defer=0, int8 default), the missing defer0_bf16 arm, stage splits,
# and the full train-step breakdown (VERDICT r2 #3). Run with the host CPU
# otherwise IDLE (see memory tpu-bench-cpu-contention).
set -u
OUT=${1:-/tmp/r3_batch2}
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
  run bench_coo  600 env BENCH_RASTER_LAYOUT=coo  python bench.py
  run bench_flat 600 env BENCH_RASTER_LAYOUT=flat python bench.py
done
run bench_bf16_nodefer 900 env BENCH_QUANT=none python bench.py
run stages_coo  900 python scripts/bench_stages.py --layout coo
run stages_flat 900 python scripts/bench_stages.py --layout flat
run train_parts_mse  2400 python scripts/bench_train_parts.py
run train_parts_giou 2400 env GIOU=1 python scripts/bench_train_parts.py
echo "=== batch2 done ($(date +%H:%M:%S)) ==="
