#!/usr/bin/env bash
# Canonical single-host training invocation (reference parity: src/train.sh).
python -m complex_yolov4_tpu.cli.train \
  --dataset_dir ./dataset/kitti \
  --model complex_yolov4 \
  --batch_size 4 --subdivisions 16 \
  --optimizer_type adam --lr 0.001 --lr_type cosin --num_epochs 300 \
  --multiscale_training --use_giou_loss \
  "$@"
