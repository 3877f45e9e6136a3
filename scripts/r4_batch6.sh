#!/bin/bash
# Round-4 batch 6: the arms batches 3-5 never finished (two session
# restarts) plus the NMS-k mAP gate.
#   1. bpack=4 e2e A/B (died mid-compile twice)
#   2. training throughput anchor (committed number: 105.9 imgs/s at b16)
#   3. NMS-k gate: train 200 epochs on synthetic-128, eval at k=256/128/64;
#      flip BENCH_NMS_K default to 64 if |dmAP| < 0.005 (VERDICT r3 #5).
# One TPU process at a time; logs to /tmp/r4b6. Keep the host idle while the
# bench arms time (CPU contention collapses tunnel timings ~2.3x, PERF.md).
set -u
mkdir -p /tmp/r4b6
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

# Timed arms need an idle host (1 core; contention collapses tunnel timings
# ~2.3x). /tmp/cpu_busy.lock is touched around CPU-heavy work (pytest).
for i in $(seq 1 60); do
  [ -e /tmp/cpu_busy.lock ] || break
  echo "waiting for cpu_busy.lock ($i)" | tee -a /tmp/r4b6/summary.log
  sleep 30
done

run() {
  name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%S)) $*" | tee -a /tmp/r4b6/summary.log
  env "$@" timeout 1200 python bench.py >/tmp/r4b6/$name.out 2>/tmp/r4b6/$name.err
  rc=$?
  { echo "rc=$rc"; cat /tmp/r4b6/$name.out; } | tee -a /tmp/r4b6/summary.log
}

run bpack4 BENCH_BPACK=4

echo "=== train_anchor ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b6/summary.log
timeout 1500 python bench_train.py >/tmp/r4b6/train_anchor.out 2>/tmp/r4b6/train_anchor.err
{ echo "rc=$?"; cat /tmp/r4b6/train_anchor.out; } | tee -a /tmp/r4b6/summary.log

echo "=== gate training ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b6/summary.log
timeout 5400 python -m complex_yolov4_tpu.cli.train --synthetic \
  --synthetic_frames 128 --model complex_yolov4 --num_epochs 200 --no_val \
  --batch_size 8 --working_dir /tmp/r4gate --saved_fn gate \
  --checkpoint_freq 100 --print_freq 200 \
  >/tmp/r4b6/gate_train.out 2>/tmp/r4b6/gate_train.err
echo "rc=$? (training)" | tee -a /tmp/r4b6/summary.log
tail -3 /tmp/r4b6/gate_train.out | tee -a /tmp/r4b6/summary.log

echo "=== gate eval k=256/128/64 ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b6/summary.log
CKPT=$(ls -d /tmp/r4gate/checkpoints/gate/epoch_* 2>/dev/null | sort -V | tail -1)
timeout 2400 python scripts/gate_nms_k.py --ckpt "$CKPT" \
  >/tmp/r4b6/gate_eval.out 2>/tmp/r4b6/gate_eval.err
{ echo "rc=$?"; cat /tmp/r4b6/gate_eval.out; } | tee -a /tmp/r4b6/summary.log
echo "=== batch done ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b6/summary.log
