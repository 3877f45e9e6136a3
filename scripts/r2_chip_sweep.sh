#!/bin/bash
# Round-2 on-chip measurement queue — run when the TPU tunnel is back.
# One TPU process at a time: everything here is sequential.
# Usage: bash scripts/r2_chip_sweep.sh [logdir]
set -u
LOG=${1:-/tmp/r2_sweep}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 to=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$to" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    tail -3 "$LOG/$name.log"
    echo "--- $name rc=$rc"
}

# 1. e2e with deferred route-concat (new default) in the serving config
run bench_default       900 python bench.py
# 2. bf16 (no quant) — isolates the defer-concat effect vs the 398.5 baseline
BENCH_QUANT=none run bench_bf16 900 python bench.py
# 3. int8 coverage re-sweep: concat elimination changed the layout-transition
#    landscape around mid-C convs (the old late128 regression may have moved)
BENCH_QUANT_MODE=late128 run bench_late128 900 python bench.py
BENCH_QUANT_MODE=all     run bench_all     900 python bench.py
# 4. per-stage e2e split at the new default config
run stages           900 python scripts/bench_stages.py
# 5. train-step cost breakdown (VERDICT r1 #5)
run train_parts_mse  1200 python scripts/bench_train_parts.py
GIOU=1 run train_parts_giou 1200 python scripts/bench_train_parts.py
echo "done; logs in $LOG"
