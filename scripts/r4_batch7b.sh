#!/bin/bash
# Round-4 batch 7b: trimmed batch 7 relaunch after the tunnel wedged
# mid-gate-training (process hard-blocked, zero CPU ticks; chip probe then
# timed out — axon outage, launched via chip_watchdog.sh).
#   1. NMS-k gate training, trimmed to 100 epochs (the gate compares
#      k=256/128/64 on ONE checkpoint; k-sensitivity needs a trained
#      detector, not the full 200-epoch protocol) with per-epoch prints
#      for liveness.
#   2. gate eval at k=256/128/64 -> flip BENCH_NMS_K default to 64 if
#      |dmAP| < 0.005 (VERDICT r3 #5)
#   3. bench anchor (confirms the committed 620)
#   4. bench BENCH_NMS_K=64 (candidate default)
#   5. bpack=4 e2e A/B   6. training throughput anchor
# Logs to /tmp/r4b7 (same dir as the aborted batch 7, new file names).
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

log "=== gate training 7b ($(date -u +%H:%M:%S))"
timeout 3000 python -m complex_yolov4_tpu.cli.train --synthetic \
  --synthetic_frames 128 --model complex_yolov4 --num_epochs 100 --no_val \
  --batch_size 8 --working_dir /tmp/r4gate --saved_fn gate \
  --checkpoint_freq 50 --print_freq 16 \
  >/tmp/r4b7/gate_train7b.out 2>/tmp/r4b7/gate_train7b.err
log "rc=$? (training)"
tail -3 /tmp/r4b7/gate_train7b.err | tee -a /tmp/r4b7/summary.log

log "=== gate eval k=256/128/64 ($(date -u +%H:%M:%S))"
CKPT=$(ls -d /tmp/r4gate/checkpoints/gate/epoch_* 2>/dev/null | grep -E '/epoch_[0-9]+$' | sort -V | tail -1)
log "checkpoint: $CKPT"
if [ -z "$CKPT" ]; then
  log "no checkpoint — skipping gate eval"
else
timeout 2400 python scripts/gate_nms_k.py --ckpt "$CKPT" \
  >/tmp/r4b7/gate_eval7b.out 2>/tmp/r4b7/gate_eval7b.err
rc=$?
{ echo "rc=$rc"; cat /tmp/r4b7/gate_eval7b.out; } | tee -a /tmp/r4b7/summary.log
fi

run() {
  name="$1"; shift
  wait_idle
  log "=== $name ($(date -u +%H:%M:%S)) $*"
  env "$@" timeout 1200 python bench.py >/tmp/r4b7/${name}7b.out 2>/tmp/r4b7/${name}7b.err
  rc=$?
  { echo "rc=$rc"; cat /tmp/r4b7/${name}7b.out; } | tee -a /tmp/r4b7/summary.log
}

run anchor
run nms_k64 BENCH_NMS_K=64
run bpack4 BENCH_BPACK=4

wait_idle
log "=== train_anchor ($(date -u +%H:%M:%S))"
timeout 1500 python bench_train.py >/tmp/r4b7/train_anchor7b.out 2>/tmp/r4b7/train_anchor7b.err
{ echo "rc=$?"; cat /tmp/r4b7/train_anchor7b.out; } | tee -a /tmp/r4b7/summary.log
log "=== batch 7b done ($(date -u +%H:%M:%S))"
