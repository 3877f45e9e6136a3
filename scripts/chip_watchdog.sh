#!/bin/bash
# Probe the axon TPU every 2 min; when it answers, run the given batch
# script. Gives up after ~2h. One TPU process at a time: the probe itself
# is the only TPU user until the batch starts.
set -u
BATCH="${1:?usage: chip_watchdog.sh <batch-script>}"
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
for i in $(seq 1 60); do
  if timeout 90 python -c "
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
