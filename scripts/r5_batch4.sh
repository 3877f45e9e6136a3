#!/bin/bash
# Round-5 batch 4 — the stem Pallas kernel, live at last (VERDICT r4 #4).
# Canaries C0-C6 all compile (r5 batch 3): the r4 "Mosaic crash" was the
# remote compile service in a failed state, not the kernel. Measure:
#  1. isolated conv0 A/B (XLA 9-tap vs im2col vs the reshape-free kernel,
#     packed + unpacked shapes, tiles 38/30/16)
#  2. e2e with STEM_PALLAS=1 at bench defaults vs anchor
set -u
cd /root/repo
source scripts/chiplib.sh
LOGDIR=/tmp/r5b4
mkdir -p "$LOGDIR"
register_batch
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/repo/workdir/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=5

log "=== r5 batch 4 start ($(date -u +%H:%M:%S))"

arm stem_iso 2400 -- python scripts/bench_stem.py --tiles 38,30,16

arm stem_e2e 1800 STEM_PALLAS=1 -- python bench.py

arm anchor4 1500 -- python bench.py

log "=== r5 batch 4 pass complete ($(date -u +%H:%M:%S))"
if [ -e "$LOGDIR/stem_iso.ok" ] && [ -e "$LOGDIR/stem_e2e.ok" ] \
   && [ -e "$LOGDIR/anchor4.ok" ]; then
  touch /tmp/r5_batch4.sh.done
else
  log "critical arms missing — leaving batch for relaunch"
fi
