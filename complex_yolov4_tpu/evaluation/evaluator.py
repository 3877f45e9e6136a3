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
    mesh=None,
) -> Callable:
    """Jitted (params, state, images) -> (detections, det_masks).

    One XLA program: network forward, head decode, and rotated NMS; detection
    rows are [x, y, w, l, im, re, conf, cls_conf, cls_id] in input pixels.

    quant: optional int8 tree (models/quantize.py). Passed to the jit as an
    argument, not a closure constant — large inlined literals blow up the
    remote compile.

    mesh: optional data mesh (parallel.make_mesh) — batch sharded over the
    `data` axis, params/state/quant replicated; the same program then serves
    one chip or a whole slice (the DP inference equivalent of the sharded
    train step). Batches that don't divide the mesh are zero-padded and the
    pad rows sliced off after.
    """

    def infer_impl(params, state, quant, images):
        decoded, _ = net.apply(spec, params, state, images, train=False,
                               compute_dtype=compute_dtype, quant=quant)
        return nms_batch(decoded, conf_thresh, nms_thresh, max_boxes)

    if mesh is None:
        infer_ = jax.jit(infer_impl)

        def infer(params, state, images):
            return infer_(params, state, quant, images)

        return infer

    from ..parallel import mesh as pmesh

    repl = pmesh.replicated(mesh)
    data = pmesh.data_sharding(mesh)
    infer_ = jax.jit(infer_impl, in_shardings=(repl, repl, repl, data),
                     out_shardings=(data, data))
    n_dev = int(mesh.devices.size)

    def infer(params, state, images):
        b = images.shape[0]
        pad = (-b) % n_dev
        if pad:
            images = jnp.concatenate(
                [jnp.asarray(images),
                 jnp.zeros((pad,) + tuple(images.shape[1:]),
                           jnp.asarray(images).dtype)], axis=0)
        dets, masks = infer_(params, state, quant, images)
        return (dets[:b], masks[:b]) if pad else (dets, masks)

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
