"""On-device rotated NMS with confidence-weighted box merging.

Behavioral contract (reference: src/utils/evaluation_utils.py:321-357,
`post_processing_v2` — the variant both test.py and evaluate.py use):

1. keep predictions with objectness >= conf_thresh;
2. order by objectness * best-class probability;
3. greedy suppression: the current best suppresses same-class boxes whose
   rotated IoU (against the *unmerged* best box) exceeds nms_thresh, and its
   kept coordinates become the objectness-weighted average of the suppressed
   group's coordinates;
4. output rows [x, y, w, l, im, re, conf, cls_conf, cls_id].

The reference runs this per image on CPU with shapely inside a Python while
loop (SURVEY.md hot loop #4). Here it is a fixed-shape XLA program: top-k
pre-selection, one batched pairwise rotated-IoU matrix, then a
`lax.fori_loop` greedy sweep over static k — jit-able, vmappable over the
batch, and fusable with the network forward so inference never leaves the
device.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from . import rotated_boxes as rb

_NEG = -1e9


@partial(jax.jit, static_argnames=("max_boxes",))
def nms_single(
    decoded: jnp.ndarray,
    conf_thresh: float = 0.95,
    nms_thresh: float = 0.4,
    max_boxes: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS for one image.

    Args:
      decoded: (N, 7 + C) network output rows [x, y, w, l, im, re, conf, cls...]
        in input-pixel units.
      max_boxes: static candidate/output capacity (top-k by score).

    Returns:
      detections: (max_boxes, 9) [x, y, w, l, im, re, conf, cls_conf, cls_id],
        score-ordered; dead rows are zero.
      keep_mask: (max_boxes,) 1.0 for live detections.
    """
    conf = decoded[:, 6]
    cls_probs = decoded[:, 7:]
    cls_conf = jnp.max(cls_probs, axis=-1)
    cls_id = jnp.argmax(cls_probs, axis=-1).astype(jnp.float32)
    valid = conf >= conf_thresh
    score = jnp.where(valid, conf * cls_conf, _NEG)

    k = min(max_boxes, decoded.shape[0])
    top_score, top_idx = jax.lax.top_k(score, k)
    cand_valid = top_score > _NEG / 2
    boxes6 = decoded[top_idx, :6]
    cand = jnp.concatenate(
        [boxes6, conf[top_idx, None], cls_conf[top_idx, None], cls_id[top_idx, None]],
        axis=-1,
    )  # (k, 9)

    # Pairwise rotated IoU over the *original* candidate boxes.
    b5 = jnp.stack(
        [boxes6[:, 0], boxes6[:, 1], boxes6[:, 2], boxes6[:, 3],
         jnp.arctan2(boxes6[:, 4], boxes6[:, 5])], axis=-1)
    iou = rb.pairwise_rotated_iou(b5, b5)  # (k, k)
    same_cls = cand[:, 8][:, None] == cand[:, 8][None, :]
    suppress = (iou > nms_thresh) & same_cls  # includes self (iou == 1)

    def body(i, state):
        alive, kept, merged = state
        is_live = alive[i] & cand_valid[i]
        group = suppress[i] & alive  # the boxes this one absorbs (incl. itself)
        w = jnp.where(group, cand[:, 6], 0.0)
        wsum = jnp.maximum(jnp.sum(w), 1e-16)
        merged_box = jnp.sum(w[:, None] * cand[:, :6], axis=0) / wsum
        new_row = jnp.concatenate([merged_box, cand[i, 6:9]])
        merged = merged.at[i].set(jnp.where(is_live, new_row, merged[i]))
        kept = kept.at[i].set(jnp.where(is_live, 1.0, 0.0))
        alive = alive & jnp.where(is_live, ~group, alive)
        return alive, kept, merged

    alive0 = cand_valid
    kept0 = jnp.zeros((k,), jnp.float32)
    merged0 = jnp.zeros((k, 9), jnp.float32)
    _, kept, merged = jax.lax.fori_loop(0, k, body, (alive0, kept0, merged0))

    out = jnp.zeros((max_boxes, 9), jnp.float32).at[:k].set(merged * kept[:, None])
    mask = jnp.zeros((max_boxes,), jnp.float32).at[:k].set(kept)
    return out, mask


@partial(jax.jit, static_argnames=("max_boxes",))
def nms_batch(
    decoded: jnp.ndarray,
    conf_thresh: float = 0.95,
    nms_thresh: float = 0.4,
    max_boxes: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched NMS: (B, N, 7+C) -> ((B, max_boxes, 9), (B, max_boxes))."""
    return jax.vmap(
        lambda d: nms_single(d, conf_thresh, nms_thresh, max_boxes)
    )(decoded)
