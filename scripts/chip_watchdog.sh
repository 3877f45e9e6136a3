#!/bin/bash
# Probe the axon TPU every 2 min; when it answers, run the given batch
# script. Gives up after ~2h.
#
# Round-5 safety (VERDICT r4 #1b): the round-4 watchdog relaunched a batch
# while the original was still mid-arm, putting two chip scripts on one
# chip. Now: (a) refuse to launch while a registered batch
# (/tmp/chip_batch.pid, written by chiplib.sh::register_batch) is alive;
# (b) the probe itself takes the chip flock, so it can't perturb a timed
# arm that IS legitimately running.
set -u
BATCH="${1:?usage: chip_watchdog.sh <batch-script>}"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

for i in $(seq 1 60); do
  if [ -f /tmp/chip_batch.pid ] && kill -0 "$(cat /tmp/chip_batch.pid)" 2>/dev/null; then
    echo "probe $i: batch pid $(cat /tmp/chip_batch.pid) still alive — not relaunching ($(date -u +%H:%M:%S))"
    sleep 120
    continue
  fi
  if flock -w 60 /tmp/tpu.lock env CHIP_LOCK_HELD=1 timeout 90 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))
jax.block_until_ready(y); assert float(y) == 256.0**3  # ones@ones sums K=256 per element
" >/dev/null 2>&1; then
    echo "chip up after $i probes ($(date -u +%H:%M:%S)); launching $BATCH"
    exec bash "$BATCH"
  fi
  echo "probe $i: chip down ($(date -u +%H:%M:%S))"
  sleep 120
done
echo "chip never recovered; giving up"
exit 1
