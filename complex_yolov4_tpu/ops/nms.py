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
loop (SURVEY.md hot loop #4). Here it is a fixed-shape XLA program that never
leaves the device, with two TPU-specific design points (both measured,
PERF.md):

- The pairwise rotated IoU runs on the packed upper-triangle PAIR LIST
  (k(k-1)/2 lanes) instead of a (k, k) broadcast matrix — same kernel,
  ~100x faster from full lane occupancy, and half the pairs by symmetry.
- The greedy sweep is an exact FIXPOINT, not a k-step sequential loop:
  greedy keeps box i iff no higher-scored kept box suppresses it, so
  statuses resolve in rounds (a box decides once its higher-ranked
  suppressors are decided). Real detections resolve in 2-4 rounds; each
  while_loop iteration applies several unrolled rounds over the whole batch,
  so the worst case (a rank-ordered chain of mutual overlaps, e.g. garbage
  candidates from an untrained model) is ~k/(2*unroll) iterations, and the
  typical case is ONE. Absorption then becomes a single vectorized masked
  reduction: keeper i absorbs j iff i is the highest-ranked keeper
  suppressing j (greedy removes j from the pool at that moment).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from . import rotated_boxes as rb

_NEG = -1e9
_UNROLL = 8  # fixpoint rounds per while_loop iteration


def _topk_hierarchical(score: jnp.ndarray, k: int, group: int = 16):
    """Exact top-k via group-max pre-selection.

    XLA's TopK over the full 22k-score vector is the single most expensive
    NMS op on TPU (measured 3.8 of 5.5 ms at batch 16, PERF.md). Split the
    vector into `group`-sized tiles, top-k the tile maxima, then top-k inside
    the k selected tiles. Exact whenever #tiles >= k: if an element x of the
    true top-k lived in an unselected tile, the k selected tiles would each
    contain an element > x — contradiction. Both TopK calls see ~10x fewer
    elements. (Score ties may order differently than a flat TopK; ties carry
    no semantics here.)
    """
    n = score.shape[0]
    ng = -(-n // group)
    if ng < k:  # tiny inputs: flat top_k is both exact and cheap
        return jax.lax.top_k(score, k)
    s = jnp.pad(score, (0, ng * group - n), constant_values=_NEG)
    sg = s.reshape(ng, group)
    _, gidx = jax.lax.top_k(sg.max(axis=1), k)  # (k,) winning tiles
    cand = sg[gidx].reshape(-1)  # (k * group,)
    cidx = (gidx[:, None] * group
            + jnp.arange(group, dtype=gidx.dtype)[None, :]).reshape(-1)
    v, i = jax.lax.top_k(cand, k)
    return v, cidx[i]


def _gather_rows_mxu(mat: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather rows of (N, C) `mat` at `idx` via one-hot MXU contraction.

    XLA lowers a k-row dynamic gather from a large array to a serial
    dynamic-slice loop on TPU — measured ~0.9 ms PER GATHER of 128 rows at
    batch 16 (scripts/bench_cand_gather.py), which made row gathering the
    single biggest NMS cost (3.7 of 4.8 ms). A (k, N) one-hot matmul does
    the same selection on the MXU in ~0.05 ms. Values ride the bf16 MXU in
    three exact-residual parts (v0 + v1 + v2 == v to ~2^-24 relative, i.e.
    ~4e-5 absolute on 608-scale coordinates — far below detection noise and
    the oracle-test tolerances), accumulated in f32.
    """
    n = mat.shape[0]
    sel = (idx[:, None] == jnp.arange(n, dtype=idx.dtype)[None, :]
           ).astype(jnp.bfloat16)
    v0 = mat.astype(jnp.bfloat16)
    r1 = mat - v0.astype(jnp.float32)
    v1 = r1.astype(jnp.bfloat16)
    v2 = (r1 - v1.astype(jnp.float32)).astype(jnp.bfloat16)
    out = jnp.dot(sel, v0, preferred_element_type=jnp.float32)
    out = out + jnp.dot(sel, v1, preferred_element_type=jnp.float32)
    return out + jnp.dot(sel, v2, preferred_element_type=jnp.float32)


def _candidates(decoded: jnp.ndarray, conf_thresh: float, k: int):
    """Top-k score-ordered candidates for one image."""
    conf = decoded[:, 6]
    cls_probs = decoded[:, 7:]
    cls_conf = jnp.max(cls_probs, axis=-1)
    cls_id = jnp.argmax(cls_probs, axis=-1).astype(jnp.float32)
    valid = conf >= conf_thresh
    score = jnp.where(valid, conf * cls_conf, _NEG)
    top_score, top_idx = _topk_hierarchical(score, k)
    cand_valid = top_score > _NEG / 2
    cols = jnp.concatenate(
        [decoded[:, :6], conf[:, None], cls_conf[:, None], cls_id[:, None]],
        axis=-1)  # (N, 9)
    cand = _gather_rows_mxu(cols, top_idx)  # (k, 9)
    return cand, cand_valid


def _suppress_matrix(cand: jnp.ndarray, nms_thresh: float) -> jnp.ndarray:
    """(k, k) same-class IoU-over-threshold matrix from original boxes,
    via the packed upper-triangle pair list."""
    k = cand.shape[0]
    boxes6 = cand[:, :6]
    b5 = jnp.stack(
        [boxes6[:, 0], boxes6[:, 1], boxes6[:, 2], boxes6[:, 3],
         jnp.arctan2(boxes6[:, 4], boxes6[:, 5])], axis=-1)
    ii, jj = jnp.triu_indices(k, 1)
    iou_pairs = rb.rotated_iou(b5[ii], b5[jj])  # (k(k-1)/2,)
    iou_upper = jnp.zeros((k, k), iou_pairs.dtype).at[ii, jj].set(iou_pairs)
    iou = iou_upper + iou_upper.T + jnp.eye(k, dtype=iou_pairs.dtype)
    same_cls = cand[:, 8][:, None] == cand[:, 8][None, :]
    return (iou > nms_thresh) & same_cls  # includes self (iou == 1)


@partial(jax.jit, static_argnames=("max_boxes",))
def nms_batch(
    decoded: jnp.ndarray,
    conf_thresh: float = 0.95,
    nms_thresh: float = 0.4,
    max_boxes: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched NMS: (B, N, 7+C) -> ((B, max_boxes, 9), (B, max_boxes)).

    detections: [x, y, w, l, im, re, conf, cls_conf, cls_id] rows,
    score-ordered; dead rows are zero. keep_mask: 1.0 for live detections.
    """
    b = decoded.shape[0]
    k = min(max_boxes, decoded.shape[1])
    cand, valid = jax.vmap(lambda d: _candidates(d, conf_thresh, k))(decoded)
    suppress = jax.vmap(lambda c: _suppress_matrix(c, nms_thresh))(cand)

    idx = jnp.arange(k)
    # blocker[b, j, i]: candidate j outranks i and suppresses it
    blocker = suppress & (idx[:, None] < idx[None, :])

    # ---- exact greedy keep-set via batched fixpoint rounds ----
    # The while_loop carries the whole batch (no vmap lifting) and applies
    # _UNROLL rounds per iteration; it exits as soon as every candidate in
    # every image is decided.
    def round_cond(state):
        keep, reject, it = state
        return jnp.any(valid & ~keep & ~reject) & (it < k)

    def one_round(keep, reject):
        undecided = valid & ~keep & ~reject
        live_blocker = blocker & (keep | undecided)[:, :, None]
        keep = keep | (undecided & ~jnp.any(live_blocker, axis=1))
        reject = reject | (undecided & jnp.any(blocker & keep[:, :, None], axis=1))
        return keep, reject

    def round_body(state):
        keep, reject, it = state
        for _ in range(_UNROLL):
            keep, reject = one_round(keep, reject)
        return keep, reject, it + 1

    zeros = jnp.zeros((b, k), bool)
    keep, _, _ = jax.lax.while_loop(
        round_cond, round_body, (zeros, zeros, jnp.int32(0)))

    # ---- vectorized absorption + confidence-weighted merge ----
    keeper_overlap = suppress & keep[:, :, None] & valid[:, None, :]  # (b, i, j)
    absorber = jnp.min(
        jnp.where(keeper_overlap, idx[None, :, None], k), axis=1)  # (b, j)
    group = keeper_overlap & (absorber[:, None, :] == idx[None, :, None])
    w = jnp.where(group, cand[:, None, :, 6], 0.0)  # (b, i, j)
    wsum = jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1e-16)
    # HIGHEST precision: the default TPU dot rounds operands to bf16, which
    # would put ~1 px of rounding on merged centers near x=600 (the old
    # elementwise merge was full f32)
    merged_boxes = jnp.einsum("bij,bjc->bic", w, cand[:, :, :6],
                              precision=jax.lax.Precision.HIGHEST) / wsum
    kept = keep.astype(jnp.float32)
    merged = jnp.concatenate([merged_boxes, cand[:, :, 6:9]], axis=-1)

    out = jnp.zeros((b, max_boxes, 9), jnp.float32)
    out = out.at[:, :k].set(merged * kept[:, :, None])
    mask = jnp.zeros((b, max_boxes), jnp.float32).at[:, :k].set(kept)
    return out, mask


@partial(jax.jit, static_argnames=("max_boxes",))
def nms_single(
    decoded: jnp.ndarray,
    conf_thresh: float = 0.95,
    nms_thresh: float = 0.4,
    max_boxes: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """NMS for one image: (N, 7+C) -> ((max_boxes, 9), (max_boxes,))."""
    out, mask = nms_batch(decoded[None], conf_thresh, nms_thresh, max_boxes)
    return out[0], mask[0]
