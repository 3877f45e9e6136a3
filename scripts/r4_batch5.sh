#!/bin/bash
# Round-4 batch 5 (post-restart): the arms batch 3/4 never finished.
#   1. Pallas stem-conv isolated bench + e2e A/B (ops/stem_conv.py)
#   2. anchor rep + bpack=4 retry (died mid-compile when the session restarted)
#   3. training anchor (committed number: 105.9 imgs/s at b16)
#   4. NMS-k mAP gate: train 200 epochs on synthetic, eval at k=256/128/64
# One TPU process at a time; logs to /tmp/r4b5. Keep the host idle while the
# bench arms time (CPU contention collapses tunnel timings ~2.3x, PERF.md).
set -u
mkdir -p /tmp/r4b5
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

run() {
  name="$1"; shift
  echo "=== $name ($(date -u +%H:%M:%S)) $*" | tee -a /tmp/r4b5/summary.log
  env "$@" timeout 900 python bench.py >/tmp/r4b5/$name.out 2>/tmp/r4b5/$name.err
  rc=$?
  { echo "rc=$rc"; cat /tmp/r4b5/$name.out; } | tee -a /tmp/r4b5/summary.log
}

echo "=== bench_stem isolated ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b5/summary.log
timeout 1800 python scripts/bench_stem.py >/tmp/r4b5/stem_iso.out 2>/tmp/r4b5/stem_iso.err
{ echo "rc=$?"; cat /tmp/r4b5/stem_iso.out; } | tee -a /tmp/r4b5/summary.log

run stem_e2e STEM_PALLAS=1
run anchor_rep
run bpack4 BENCH_BPACK=4

echo "=== train_anchor ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b5/summary.log
timeout 1500 python bench_train.py >/tmp/r4b5/train_anchor.out 2>/tmp/r4b5/train_anchor.err
{ echo "rc=$?"; cat /tmp/r4b5/train_anchor.out; } | tee -a /tmp/r4b5/summary.log

echo "=== gate training ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b5/summary.log
timeout 3600 python -m complex_yolov4_tpu.cli.train --synthetic \
  --synthetic_frames 128 --model complex_yolov4 --num_epochs 200 --no_val \
  --batch_size 8 --working_dir /tmp/r4gate --saved_fn gate \
  --checkpoint_freq 100 --print_freq 200 \
  >/tmp/r4b5/gate_train.out 2>/tmp/r4b5/gate_train.err
echo "rc=$? (training)" | tee -a /tmp/r4b5/summary.log
tail -3 /tmp/r4b5/gate_train.out | tee -a /tmp/r4b5/summary.log

echo "=== gate eval k=256/128/64 ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b5/summary.log
CKPT=$(ls -d /tmp/r4gate/checkpoints/gate/epoch_* 2>/dev/null | sort -V | tail -1)
timeout 2400 python scripts/gate_nms_k.py --ckpt "$CKPT" \
  >/tmp/r4b5/gate_eval.out 2>/tmp/r4b5/gate_eval.err
{ echo "rc=$?"; cat /tmp/r4b5/gate_eval.out; } | tee -a /tmp/r4b5/summary.log
echo "=== batch done ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b5/summary.log
