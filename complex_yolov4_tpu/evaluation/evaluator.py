"""Validation driver: full inference + rotated-IoU matching + per-class AP.

Equivalent of the reference's `evaluate_mAP` (reference: src/evaluate.py:23-64)
with the forward pass and NMS fused into one jitted device program; only the
tiny greedy TP matching and AP bookkeeping run on host.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import network as net
from ..models.spec import NetSpec
from ..ops.nms import nms_batch
from . import metrics as M


def make_inference_fn(
    spec: NetSpec,
    *,
    conf_thresh: float = 0.5,
    nms_thresh: float = 0.5,
    max_boxes: int = 256,
    compute_dtype=jnp.float32,
    quant=None,
) -> Callable:
    """Jitted (params, state, images) -> (detections, det_masks).

    One XLA program: network forward, head decode, and rotated NMS; detection
    rows are [x, y, w, l, im, re, conf, cls_conf, cls_id] in input pixels.

    quant: optional int8 tree (models/quantize.py). Passed to the jit as an
    argument, not a closure constant — large inlined literals blow up the
    remote compile.
    """

    @jax.jit
    def infer_(params, state, quant, images):
        decoded, _ = net.apply(spec, params, state, images, train=False,
                               compute_dtype=compute_dtype, quant=quant)
        return nms_batch(decoded, conf_thresh, nms_thresh, max_boxes)

    def infer(params, state, images):
        return infer_(params, state, quant, images)

    return infer


def evaluate_map(
    infer_fn: Callable,
    params,
    state,
    loader,
    *,
    iou_threshold: float = 0.5,
    num_classes: int = 3,
    progress: Optional[Callable[[int, int], None]] = None,
) -> Dict[str, np.ndarray]:
    """Run the val split and compute precision/recall/AP/F1/mAP
    (reference protocol: evaluate.py:23-64 + evaluation_utils.py:70-190)."""
    stats = []
    labels = []
    n_batches = len(loader)
    for b_idx, batch in enumerate(loader):
        images = jnp.asarray(batch["image"])
        img_size = float(images.shape[1])
        dets, masks = infer_fn(params, state, images)
        dets = np.asarray(dets)
        masks = np.asarray(masks)
        targets = batch["targets"]
        tmasks = batch["target_mask"]
        stats.extend(
            M.batch_statistics(dets, masks, targets, tmasks, iou_threshold, img_size)
        )
        for i in range(targets.shape[0]):
            labels.append(targets[i][tmasks[i] > 0.5][:, 0])
        if progress is not None:
            progress(b_idx + 1, n_batches)
    return M.summarize_map(stats, labels)
