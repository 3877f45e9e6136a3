#!/bin/bash
# Round-5 batch 3 — stem-kernel bisect + fixed sustained + mish confirm.
#  1. pallas canaries C0-C6 (C4/C5 bisect Element lane alignment; C6 is the
#     aligned stem dress rehearsal) — decides the stem lever's fate
#  2. sustained serving re-run (residency fix; 6 epochs to fit a window)
#  3. mish approx confirm rep + adjacent anchor (same-window A/B: batch 2
#     measured 533.66 approx vs 642.84 anchor in different windows)
set -u
cd /root/repo
source scripts/chiplib.sh
LOGDIR=/tmp/r5b3
mkdir -p "$LOGDIR" workdir/results
register_batch
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/workdir/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

log "=== r5 batch 3 start ($(date -u +%H:%M:%S))"

arm canary2 1500 -- python scripts/probe_pallas_canary.py

arm sustained2 1800 -- python scripts/bench_sustained.py --epochs 6

arm anchor3 1500 -- python bench.py

arm mish2 1500 BENCH_MISH=approx -- python bench.py

log "=== r5 batch 3 pass complete ($(date -u +%H:%M:%S))"
if [ -e "$LOGDIR/canary2.ok" ] && [ -e "$LOGDIR/anchor3.ok" ] \
   && [ -e "$LOGDIR/mish2.ok" ]; then
  touch /tmp/r5_batch3.sh.done
else
  log "critical arms missing — leaving batch for relaunch"
fi
