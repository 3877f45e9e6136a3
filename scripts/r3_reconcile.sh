#!/bin/bash
# Round-3 task #1 (VERDICT): reconcile the 486 -> 455 defer-route-concat
# discrepancy with a same-session interleaved A/B. Runs each config twice,
# interleaved (the tunnel jitters over minutes, so repeats bracket drift).
# One TPU process at a time; each bench run is sequential.
# Usage: bash scripts/r3_reconcile.sh /tmp/r3_reconcile
set -u
OUT=${1:-/tmp/r3_reconcile}
mkdir -p "$OUT"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # name timeout env...
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  env "$@" timeout "$tmo" python bench.py >>"$OUT/$name.log" 2>&1
  tail -1 "$OUT/$name.log"
}

for rep in 1 2; do
  run defer1_int8def  600 BENCH_DEFER_CONCAT=1 BENCH_QUANT=int8 BENCH_QUANT_MODE=default
  run defer0_int8def  600 BENCH_DEFER_CONCAT=0 BENCH_QUANT=int8 BENCH_QUANT_MODE=default
  run defer1_late128  600 BENCH_DEFER_CONCAT=1 BENCH_QUANT=int8 BENCH_QUANT_MODE=late128
  run defer0_late128  600 BENCH_DEFER_CONCAT=0 BENCH_QUANT=int8 BENCH_QUANT_MODE=late128
  run defer1_bf16     600 BENCH_DEFER_CONCAT=1 BENCH_QUANT=none
  run defer0_bf16     600 BENCH_DEFER_CONCAT=0 BENCH_QUANT=none
done
echo "=== summary ==="
for f in "$OUT"/*.log; do
  echo "$f"; grep -h '"value"' "$f" | sed 's/^/  /'
done
