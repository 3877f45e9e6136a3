#!/bin/bash
# Round-4 batch 4: Pallas stem-conv compile/bench + e2e A/B, then the NMS-k
# mAP gate (train 200 epochs on synthetic, eval at k=256/128/64).
# Logs to /tmp/r4b4. The training phase is timing-insensitive (CPU tests may
# run alongside); the bench arms need an idle host.
set -u
mkdir -p /tmp/r4b4
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo

echo "=== bench_stem isolated ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b4/summary.log
timeout 1800 python scripts/bench_stem.py >/tmp/r4b4/stem_iso.out 2>/tmp/r4b4/stem_iso.err
{ echo "rc=$?"; cat /tmp/r4b4/stem_iso.out; } | tee -a /tmp/r4b4/summary.log

# e2e A/B only makes sense if the kernel compiled; run regardless and let
# the log show it (bench falls back to rc!=0 on kernel failure).
echo "=== e2e STEM_PALLAS=1 ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b4/summary.log
STEM_PALLAS=1 timeout 900 python bench.py >/tmp/r4b4/stem_e2e.out 2>/tmp/r4b4/stem_e2e.err
{ echo "rc=$?"; cat /tmp/r4b4/stem_e2e.out; } | tee -a /tmp/r4b4/summary.log
echo "=== e2e anchor rep ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b4/summary.log
timeout 900 python bench.py >/tmp/r4b4/anchor2.out 2>/tmp/r4b4/anchor2.err
{ echo "rc=$?"; cat /tmp/r4b4/anchor2.out; } | tee -a /tmp/r4b4/summary.log

echo "=== gate training ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b4/summary.log
timeout 3600 python -m complex_yolov4_tpu.cli.train --synthetic \
  --synthetic_frames 128 --model complex_yolov4 --num_epochs 200 --no_val \
  --batch_size 8 --working_dir /tmp/r4gate --saved_fn gate \
  --checkpoint_freq 100 --print_freq 200 \
  >/tmp/r4b4/gate_train.out 2>/tmp/r4b4/gate_train.err
echo "rc=$? (training)" | tee -a /tmp/r4b4/summary.log
tail -3 /tmp/r4b4/gate_train.out | tee -a /tmp/r4b4/summary.log

echo "=== gate eval k=256/128/64 ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b4/summary.log
CKPT=$(ls -d /tmp/r4gate/checkpoints/gate/epoch_* 2>/dev/null | sort -V | tail -1)
timeout 2400 python scripts/gate_nms_k.py --ckpt "$CKPT" \
  >/tmp/r4b4/gate_eval.out 2>/tmp/r4b4/gate_eval.err
{ echo "rc=$?"; cat /tmp/r4b4/gate_eval.out; } | tee -a /tmp/r4b4/summary.log
echo "=== batch done ($(date -u +%H:%M:%S))" | tee -a /tmp/r4b4/summary.log
