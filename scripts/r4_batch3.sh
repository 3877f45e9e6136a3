#!/bin/bash
# Round-4 batch 3: post-reboot anchor + the remaining VERDICT r3 A/Bs.
# One TPU process at a time; logs to /tmp/r4b3. Keep the host idle while
# this runs (CPU contention collapses tunnel timings ~2.3x, PERF.md).
set -u
mkdir -p /tmp/r4b3
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%S)) $*" | tee -a /tmp/r4b3/summary.log
  env "$@" timeout 900 python bench.py >/tmp/r4b3/$name.out 2>/tmp/r4b3/$name.err
  rc=$?
  { echo "rc=$rc"; cat /tmp/r4b3/$name.out; } | tee -a /tmp/r4b3/summary.log
}

# 1. Anchor: shipped defaults (COO raster, int8 C_in>=256, bpack=2).
run anchor_default
# 2-3. VERDICT r3 #6 — clustered-scene COO capacity-policy validation.
run clustered_coo BENCH_SCENE=clustered
run clustered_flat BENCH_SCENE=clustered BENCH_RASTER_LAYOUT=flat
# 4. VERDICT r3 #5 — NMS k=64 e2e arm (mAP gate runs separately on the
#    retrained checkpoint).
run nms_k64 BENCH_NMS_K=64
# 5. int8 on the attribution hot layers (0,1,5,6,8). NOTE: quantized convs
#    exclude themselves from the bpack segment, so this arm trades the
#    packed bf16 stem for an unpacked int8 stem.
run quant_hot BENCH_QUANT_MODE=hot
# 6. bpack=4 retry now that the parts-ordered packed-concat kernels exist
#    (the r4 p=4 loss was measured before that fix).
run bpack4 BENCH_BPACK=4
# 7. Training anchor (committed number: 105.9 imgs/s at b16).
echo "=== train_anchor ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b3/summary.log
timeout 1500 python bench_train.py >/tmp/r4b3/train_anchor.out 2>/tmp/r4b3/train_anchor.err
{ echo "rc=$?"; cat /tmp/r4b3/train_anchor.out; } | tee -a /tmp/r4b3/summary.log
echo "=== batch done ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b3/summary.log
