#!/bin/bash
# Round-4 batch 7 (session restart; /tmp was wiped so batch 6 never ran).
# Order puts the long pole first:
#   1. NMS-k gate training (200 epochs, synthetic-128, ~30 min on-chip)
#   2. gate eval at k=256/128/64 -> flip BENCH_NMS_K default to 64 if
#      |dmAP| < 0.005 (VERDICT r3 #5)
#   3. bench anchor at current defaults (confirms the committed 620)
#   4. bench with BENCH_NMS_K=64 (the candidate default)
#   5. bpack=4 e2e A/B (died mid-compile twice in batches 3-5)
#   6. training throughput anchor (committed: 105.9 imgs/s at b16)
# One TPU process at a time; logs to /tmp/r4b7. Timed arms (3-6) wait for
# /tmp/cpu_busy.lock (CPU contention collapses tunnel timings ~2.3x).
set -u
mkdir -p /tmp/r4b7
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

log() { echo "$@" | tee -a /tmp/r4b7/summary.log; }

wait_idle() {
  for i in $(seq 1 80); do
    [ -e /tmp/cpu_busy.lock ] || return 0
    log "waiting for cpu_busy.lock ($i)"
    sleep 30
  done
  log "WARNING: cpu_busy.lock still held after 40 min — proceeding; TIMINGS SUSPECT"
}

log "=== gate training ($(date -u +%H:%M:%S))"
timeout 3600 python -m complex_yolov4_tpu.cli.train --synthetic \
  --synthetic_frames 128 --model complex_yolov4 --num_epochs 200 --no_val \
  --batch_size 8 --working_dir /tmp/r4gate --saved_fn gate \
  --checkpoint_freq 100 --print_freq 200 \
  >/tmp/r4b7/gate_train.out 2>/tmp/r4b7/gate_train.err
log "rc=$? (training)"
tail -3 /tmp/r4b7/gate_train.out | tee -a /tmp/r4b7/summary.log

log "=== gate eval k=256/128/64 ($(date -u +%H:%M:%S))"
CKPT=$(ls -d /tmp/r4gate/checkpoints/gate/epoch_* 2>/dev/null | grep -E '/epoch_[0-9]+$' | sort -V | tail -1)
if [ -z "$CKPT" ]; then
  log "no checkpoint — skipping gate eval"
else
timeout 2400 python scripts/gate_nms_k.py --ckpt "$CKPT" \
  >/tmp/r4b7/gate_eval.out 2>/tmp/r4b7/gate_eval.err
rc=$?
{ echo "rc=$rc"; cat /tmp/r4b7/gate_eval.out; } | tee -a /tmp/r4b7/summary.log
fi

run() {
  name="$1"; shift
  wait_idle
  log "=== $name ($(date -u +%H:%M:%S)) $*"
  env "$@" timeout 1200 python bench.py >/tmp/r4b7/$name.out 2>/tmp/r4b7/$name.err
  rc=$?
  { echo "rc=$rc"; cat /tmp/r4b7/$name.out; } | tee -a /tmp/r4b7/summary.log
}

run anchor
run nms_k64 BENCH_NMS_K=64
run bpack4 BENCH_BPACK=4

wait_idle
log "=== train_anchor ($(date -u +%H:%M:%S))"
timeout 1500 python bench_train.py >/tmp/r4b7/train_anchor.out 2>/tmp/r4b7/train_anchor.err
{ echo "rc=$?"; cat /tmp/r4b7/train_anchor.out; } | tee -a /tmp/r4b7/summary.log
log "=== batch done ($(date -u +%H:%M:%S))"
