#!/bin/bash
# Round-2 follow-up A/Bs (run after r2_chip_sweep.sh; one TPU process at a time).
# Sweep found: post route-concat-elimination, int8 late128 (94 convs) beats the
# old default late256 (465.4 vs 454.9) and mode=all no longer collapses (460.8).
# Pin down: (a) defer-concat on/off A/B same-session, (b) late64 coverage,
# (c) variance bound on the winner.
set -u
LOG=${1:-/tmp/r2_followup}
mkdir -p "$LOG"
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
    local name=$1 to=$2; shift 2
    echo "=== $name ($(date +%H:%M:%S)) ==="
    timeout "$to" "$@" > "$LOG/$name.log" 2>&1
    local rc=$?
    tail -2 "$LOG/$name.log"
    echo "--- $name rc=$rc"
}

BENCH_DEFER_CONCAT=0 run bench_nodefer_late256 600 python bench.py
BENCH_QUANT_MODE=late64 run bench_late64 600 python bench.py
BENCH_QUANT_MODE=late128 run bench_late128_rep 600 python bench.py
BENCH_DEFER_CONCAT=0 BENCH_QUANT_MODE=late128 run bench_nodefer_late128 600 python bench.py
echo "done; logs in $LOG"
