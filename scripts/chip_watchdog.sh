#!/bin/bash
# Relaunch loop for chip batch scripts. Probes the axon TPU every 2 min;
# whenever it answers, (re)launches the given batch script. The batch is
# expected to be IDEMPOTENT (re-runnable arms, resumable training) and to
# `touch` its done-marker (/tmp/$(basename batch).done) on completion —
# the loop exits when the marker appears. Arms abort the batch fast when
# the chip is lost mid-run (chiplib.sh::arm exits 4), so a flapping tunnel
# costs probe time, not arm timeouts.
#
# Round-5 safety (VERDICT r4 #1b): never two batches at once — refuses to
# launch while a registered batch (/tmp/chip_batch.pid) is alive; the
# probe itself runs under the chip flock.
set -u
BATCH="${1:?usage: chip_watchdog.sh <batch-script>}"
DONE="/tmp/$(basename "$BATCH").done"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 200); do
  if [ -e "$DONE" ]; then
    echo "batch complete ($DONE); watchdog exiting"
    exit 0
  fi
  if [ -f /tmp/chip_batch.pid ] && kill -0 "$(cat /tmp/chip_batch.pid)" 2>/dev/null; then
    echo "cycle $i: batch pid $(cat /tmp/chip_batch.pid) alive ($(date -u +%H:%M:%S))"
    sleep 120
    continue
  fi
  if flock -w 60 /tmp/tpu.lock env CHIP_LOCK_HELD=1 timeout 90 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
jax.block_until_ready(y); assert float(y) == 256.0**3  # ones@ones sums K=256 per element
" >/dev/null 2>&1; then
    echo "cycle $i: chip up ($(date -u +%H:%M:%S)); launching $BATCH"
    bash "$BATCH"
    echo "cycle $i: batch exited rc=$? ($(date -u +%H:%M:%S))"
  else
    echo "cycle $i: chip down ($(date -u +%H:%M:%S))"
  fi
  sleep 120
done
echo "watchdog cycle budget exhausted"
exit 1
