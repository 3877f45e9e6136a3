#!/bin/bash
# Round-5 batch 2 — gated accuracy levers + the sustained-serving artifact.
# Requires the gate checkpoint from batch 1 (workdir/r5gate).
#
#  1. mish-approx mAP gate (same checkpoint + harness as the NMS-k gate)
#  2. bench BENCH_MISH=approx e2e (candidate ~+1.5%, PERF.md lever #6)
#  3. sustained single-host COO serving (VERDICT r4 #5): supply vs device
#     vs pipelined steady state
#  4. packed per-layer attribution refresh (bench_prefix --bpack 2) ->
#     workdir/results CSV — calibrates the new roofline --bpack table
#  5. anchor rep (headline stability)
set -u
cd /root/repo
source scripts/chiplib.sh
LOGDIR=/tmp/r5b2
mkdir -p "$LOGDIR" workdir/results
register_batch
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/workdir/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

log "=== r5 batch 2 start ($(date -u +%H:%M:%S))"

# Mosaic remote-compile floor canaries: round-5 probe falsified the r4
# reshape hypothesis (P0 failed too) — classify whether ANY Pallas kernel
# compiles through the service before spending more on the stem lever.
arm pallas_canary 1200 -- python scripts/probe_pallas_canary.py

CKPT=$(ls -d workdir/r5gate/checkpoints/gate/epoch_* 2>/dev/null \
       | grep -E '/epoch_[0-9]+$' | sort -V | tail -1)
log "gate checkpoint: ${CKPT:-NONE}"
if [ -n "$CKPT" ]; then
  arm gate_mish 2400 -- python scripts/gate_mish.py --ckpt "$CKPT"
else
  log "no checkpoint — skipping mish gate"
fi

arm mish_approx 1500 BENCH_MISH=approx -- python bench.py

arm sustained 2400 -- python scripts/bench_sustained.py --epochs 20

arm prefix_bpack 3000 -- python scripts/bench_prefix.py --layers convs \
  --start 0 --end 30 --bpack 2 --csv workdir/results/r5_prefix_bpack2.csv

arm anchor2 1500 -- python bench.py

log "=== r5 batch 2 done ($(date -u +%H:%M:%S))"
touch /tmp/r5_batch2.sh.done
