#!/usr/bin/env bash
# Canonical inference demo invocation (reference parity: src/test.sh).
python -m complex_yolov4_tpu.cli.test \
  --dataset_dir ./dataset/kitti \
  --model complex_yolov4 \
  --pretrained_path "${1:?usage: test.sh <checkpoint>}" \
  --save_test_output --output_format image
