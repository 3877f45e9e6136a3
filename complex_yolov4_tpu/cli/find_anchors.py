"""Anchor k-means tool (reference entry point parity: src/utils/find_anchors.py).

Clusters BEV ground-truth boxes (w, l, yaw) under rotated-IoU distance
(1 - IoU at a fixed center). The reference evaluated IoU per pair with
shapely on CPU; here each assignment step is one batched device call over
the full boxes x centroids matrix.

Usage:
    python -m complex_yolov4_tpu.cli.find_anchors --synthetic --num_anchors 9
"""

from __future__ import annotations

import argparse
import sys

import jax.numpy as jnp
import numpy as np

from ..data.dataset import KittiDataset
from ..ops import rotated_boxes as rb
from . import common


def collect_boxes(dataset: KittiDataset, img_size: int, zero_yaw: bool) -> np.ndarray:
    """(N, 3) [w, l, yaw] of all train targets in input pixels."""
    rows = []
    for i in range(len(dataset)):
        _, _, targets, mask = dataset.load_sample(i, np.random.default_rng(0))
        for t in targets[mask > 0.5]:
            yaw = 0.0 if zero_yaw else float(np.arctan2(t[5], t[6]))
            rows.append([t[3] * img_size, t[4] * img_size, yaw])
    return np.asarray(rows, np.float32)


def iou_to_centroids(boxes: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(N, K) rotated IoU of boxes vs centroids at a common fixed center."""
    def to5(a):
        z = np.zeros((a.shape[0], 2), np.float32)
        return np.concatenate([z, a], axis=1)

    return np.asarray(
        rb.pairwise_rotated_iou(jnp.asarray(to5(boxes)), jnp.asarray(to5(centroids))))


def kmeans_anchors(boxes: np.ndarray, k: int, seed: int = 0,
                   max_iters: int = 100):
    """IoU-distance k-means (reference: find_anchors.py:63-120 semantics)."""
    rng = np.random.default_rng(seed)
    centroids = boxes[rng.choice(boxes.shape[0], k, replace=False)].copy()
    assign = np.full(boxes.shape[0], -1)
    for _ in range(max_iters):
        iou = iou_to_centroids(boxes, centroids)
        new_assign = iou.argmax(axis=1)
        if np.array_equal(new_assign, assign):
            break
        assign = new_assign
        for j in range(k):
            members = boxes[assign == j]
            if members.shape[0]:
                centroids[j] = members.mean(axis=0)
    avg_iou = float(iou_to_centroids(boxes, centroids)[
        np.arange(boxes.shape[0]), assign].mean())
    order = np.argsort(centroids[:, 0] * centroids[:, 1])
    return centroids[order], avg_iou


def main(argv=None) -> None:
    parser = argparse.ArgumentParser("find_anchors")
    parser.add_argument("--dataset_dir", type=str, default="./dataset/kitti")
    parser.add_argument("--num_anchors", type=int, default=9)
    parser.add_argument("--img_size", type=int, default=608)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--keep_yaw", action="store_true",
                        help="cluster with true yaw instead of forcing 0 "
                             "(the reference forces yaw=0, find_anchors.py:44)")
    parser.add_argument("--synthetic", action="store_true")
    parser.add_argument("--synthetic_frames", type=int, default=16)
    args = parser.parse_args(argv)

    dataset_dir = common.resolve_dataset_dir(args)
    ds = KittiDataset(dataset_dir, mode="train", num_samples=args.num_samples)
    boxes = collect_boxes(ds, args.img_size, zero_yaw=not args.keep_yaw)
    print(f"collected {boxes.shape[0]} boxes from {len(ds)} frames")
    anchors, avg_iou = kmeans_anchors(boxes, args.num_anchors, args.seed)
    print(f"avg IoU: {avg_iou * 100:.2f}%")
    print("anchors (w, l, yaw):")
    for a in anchors:
        print(f"  {a[0]:6.1f}, {a[1]:6.1f}, {a[2]:5.2f}")


if __name__ == "__main__":
    main(sys.argv[1:])
