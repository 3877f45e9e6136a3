"""Complex-YOLO loss: target assignment + 9-term loss, fully on device.

Behavioral contract (reference: src/models/yolo_layer.py:69-251):

- per head, each valid target is matched to the best anchor by rotated IoU at
  a fixed center (yaw from the target's (im, re));
- the matched (batch, anchor, row, col) cell gets obj=1 and the regression
  targets tx/ty (sub-cell offsets), tw/th (log size ratios vs the scaled
  anchor), tim/tre (raw Euler parts), one-hot class;
- noobj is cleared at matched cells and wherever a target's anchor IoU
  exceeds `ignore_thresh`;
- MSE mode: loss = mse(x)+mse(y)+mse(w)+mse(h)+eular+obj_bce*1+noobj_bce*100
  + cls_bce, with eular = mse(im)+mse(re)+mean((1-sqrt(im^2+re^2))^2);
- GIoU mode: loss = giou*3.54 + eular*3.54 + (obj_bce+noobj_bce)*64.3
  + cls_bce*37.4, giou from the rotated-hull kernel;
- duplicate targets landing on one cell: last target wins (torch index-put
  semantics), reproduced here with an explicit argmax-by-target-index scatter.

Where the reference ran shapely/ConvexHull per box on CPU inside the loss
(its biggest perf wart, SURVEY.md §3.5), every step here is a batched XLA
scatter/gather over static shapes: the loss jits into the train step with
zero host round trips.

Inputs use the framework's fixed-shape target contract: (B, T, 7)
[cls, x, y, w, l, im, re] normalized rows + (B, T) validity mask.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..models.spec import NetSpec, YoloSpec
from ..ops import rotated_boxes as rb

# Loss scale constants (reference: yolo_layer.py:40-45).
NOOBJ_SCALE = 100.0
OBJ_SCALE = 1.0
LGIOU_SCALE = 3.54
LEULAR_SCALE = 3.54
LOBJ_SCALE = 64.3
LCLS_SCALE = 37.4

_EPS = 1e-16


@jax.custom_vjp
def _bce(p: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Elementwise binary cross entropy with torch's exact numerics
    (torch.nn.functional.binary_cross_entropy): value with a -100 log clamp,
    gradient (p - t) / clamp(p * (1 - p), min=1e-12). The bounded-denominator
    gradient is load-bearing: once sigmoid saturates to exactly 0/1 in f32,
    the naive -1/(1-p) gradient overflows and NaNs the whole model (observed
    ~150 epochs into an overfit run)."""
    logp = jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)
    logq = jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
    return -(t * logp + (1.0 - t) * logq)


def _bce_fwd(p, t):
    return _bce(p, t), (p, t)


def _bce_bwd(res, g):
    p, t = res
    denom = jnp.maximum(p * (1.0 - p), 1e-12)
    return (g * (p - t) / denom, g * (jnp.maximum(jnp.log(jnp.maximum(1.0 - p, 0.0)), -100.0)
                                      - jnp.maximum(jnp.log(jnp.maximum(p, 0.0)), -100.0)))


_bce.defvjp(_bce_fwd, _bce_bwd)


def _masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


def build_targets_dense(
    g: int,
    anchors: jnp.ndarray,
    nc: int,
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    ignore_thresh: float,
) -> Dict[str, jnp.ndarray]:
    """Dense target assignment for one head (yolo_layer.py:69-133 semantics).

    Args:
      g: grid size. anchors: (A, 4) grid-unit (w, h, im, re). nc: classes.
      targets: (B, T, 7) normalized rows; target_mask: (B, T) validity.

    Returns a dict of flat (B*G*G*A[, C]) grids — obj, noobj, tx, ty, tw, th,
    tim, tre, tcls — plus per-target tensors: cell (B, T) linear cell ids,
    is_winner (B, T), valid (B, T), and the grid-unit target boxes t5 (B,T,5).
    """
    na = anchors.shape[0]
    b_sz, t_cap = targets.shape[0], targets.shape[1]

    valid = target_mask > 0.5  # (B, T)
    t_cls = targets[..., 0].astype(jnp.int32)
    gx = targets[..., 1] * g
    gy = targets[..., 2] * g
    gw = targets[..., 3] * g
    gh = targets[..., 4] * g
    gim = targets[..., 5]
    gre = targets[..., 6]

    # ---- anchor matching: rotated IoU at fixed center (yolo_layer.py:105-107)
    t_yaw = jnp.arctan2(gim, gre)
    a_yaw = jnp.arctan2(anchors[:, 2], anchors[:, 3])
    zeros_t = jnp.zeros_like(gw)
    t_boxes_fixed = jnp.stack([zeros_t, zeros_t, gw, gh, t_yaw], axis=-1)  # (B,T,5)
    a_boxes = jnp.stack(
        [jnp.zeros((na,)), jnp.zeros((na,)), anchors[:, 0], anchors[:, 1], a_yaw],
        axis=-1,
    )  # (A, 5)
    pair_t = jnp.broadcast_to(t_boxes_fixed[:, :, None, :], (b_sz, t_cap, na, 5))
    pair_a = jnp.broadcast_to(a_boxes[None, None, :, :], (b_sz, t_cap, na, 5))
    anchor_ious = rb.rotated_iou(pair_t, pair_a)  # (B, T, A)
    best_n = jnp.argmax(anchor_ious, axis=-1).astype(jnp.int32)  # (B, T)

    gi = jnp.clip(jnp.floor(gx), 0, g - 1).astype(jnp.int32)  # col
    gj = jnp.clip(jnp.floor(gy), 0, g - 1).astype(jnp.int32)  # row

    # Linear cell ids into the (B, G, G, A) grid; invalid targets -> dump slot.
    n_cells = b_sz * g * g * na
    b_idx = jax.lax.broadcasted_iota(jnp.int32, (b_sz, t_cap), 0)
    cell = ((b_idx * g + gj) * g + gi) * na + best_n
    cell = jnp.where(valid, cell, n_cells)

    # Last-target-wins conflict resolution (torch index-put semantics):
    # the winner of each cell is the highest target index landing on it.
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (b_sz, t_cap), 1)
    order = jnp.where(valid, t_idx + 1, 0)
    winner_of_cell = (
        jnp.zeros((n_cells + 1,), jnp.int32).at[cell.ravel()].max(order.ravel())
    )
    is_winner = valid & (winner_of_cell[cell] == t_idx + 1)  # (B, T)
    w_cell = jnp.where(is_winner, cell, n_cells).ravel()

    def scatter(values: jnp.ndarray) -> jnp.ndarray:
        """Scatter per-target values of winners into the flat cell grid."""
        return (
            jnp.zeros((n_cells + 1,), values.dtype)
            .at[w_cell]
            .set(values.ravel())[:n_cells]
        )

    obj_flat = scatter(is_winner.astype(jnp.float32))
    tx_flat = scatter(gx - jnp.floor(gx))
    ty_flat = scatter(gy - jnp.floor(gy))
    tw_flat = scatter(jnp.log(gw / anchors[best_n, 0] + _EPS))
    th_flat = scatter(jnp.log(gh / anchors[best_n, 1] + _EPS))
    tim_flat = scatter(gim)
    tre_flat = scatter(gre)

    cls_safe = jnp.clip(t_cls, 0, nc - 1)
    tcls_flat = (
        jnp.zeros((n_cells + 1, nc), jnp.float32)
        .at[w_cell]
        .set(jax.nn.one_hot(cls_safe, nc).reshape(-1, nc))[:n_cells]
    )

    # noobj: 1 everywhere except matched cells and ignore_thresh exceedances
    # across all anchors at the target's cell (yolo_layer.py:114-119).
    cell_all_a = (((b_idx * g + gj) * g + gi)[..., None] * na
                  + jax.lax.broadcasted_iota(jnp.int32, (b_sz, t_cap, na), 2))
    ignore = valid[..., None] & (anchor_ious > ignore_thresh)
    mark = (
        jnp.zeros((n_cells + 1,), jnp.float32)
        .at[jnp.where(ignore, cell_all_a, n_cells).ravel()]
        .max(jnp.ones((b_sz * t_cap * na,)))
    )[:n_cells]
    noobj_flat = (1.0 - jnp.maximum(obj_flat, mark))

    t5 = jnp.stack([gx, gy, gw, gh, t_yaw], axis=-1)
    return {
        "obj": obj_flat, "noobj": noobj_flat,
        "tx": tx_flat, "ty": ty_flat, "tw": tw_flat, "th": th_flat,
        "tim": tim_flat, "tre": tre_flat, "tcls": tcls_flat,
        "cell": cell, "is_winner": is_winner, "valid": valid, "t5": t5,
        "tcls_id": cls_safe, "w_cell": w_cell,
    }


def head_loss(
    raw: Dict[str, Any],
    spec: YoloSpec,
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    *,
    use_giou_loss: bool = False,
    want_metrics=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Loss for one YOLO head.

    Args:
      raw: decode dict from `models.yolo_head.decode_head` (grid-unit fields,
        layout (B, G, G, A)).
      targets: (B, T, 7) [cls, x, y, w, l, im, re], geometry in [0, 1].
      target_mask: (B, T) validity.
      want_metrics: None (default) — always compute the full 18-metric dict.
        A traced bool — gate the metric-only work (pred-vs-target rotated
        IoU in MSE mode, score scatters, recall/precision) behind lax.cond,
        so steps that don't consume metrics (every non-tensorboard step)
        skip the geometry entirely while compiling ONE program.

    Returns (total_loss, metrics).
    """
    g = raw["grid_size"]
    anchors = raw["scaled_anchors"]  # (A, 4) w, h, im, re in grid units
    na = anchors.shape[0]
    b_sz, t_cap = targets.shape[0], targets.shape[1]
    nc = raw["pred_cls"].shape[-1]
    n_cells = b_sz * g * g * na

    dense = build_targets_dense(g, anchors, nc, targets, target_mask, spec.ignore_thresh)
    obj_flat, noobj_flat = dense["obj"], dense["noobj"]
    tx_flat, ty_flat = dense["tx"], dense["ty"]
    tw_flat, th_flat = dense["tw"], dense["th"]
    tim_flat, tre_flat = dense["tim"], dense["tre"]
    tcls_flat = dense["tcls"]
    cell, is_winner, valid = dense["cell"], dense["is_winner"], dense["valid"]
    t5 = dense["t5"]
    cls_safe = dense["tcls_id"]
    w_cell = dense["w_cell"]  # winner cells (duplicates resolved), from assignment

    def scatter(values: jnp.ndarray) -> jnp.ndarray:
        return (
            jnp.zeros((n_cells + 1,), values.dtype)
            .at[w_cell]
            .set(values.ravel())[:n_cells]
        )

    # ---- gather predictions; reshape model layout (B, G, G, A) -> flat cells
    def flat(x):
        return x.reshape(b_sz * g * g * na, *x.shape[4:])

    pred_x = flat(raw["pred_x"])
    pred_y = flat(raw["pred_y"])
    pred_w = flat(raw["pred_w"])
    pred_h = flat(raw["pred_h"])
    pred_im = flat(raw["pred_im"])
    pred_re = flat(raw["pred_re"])
    pred_conf = flat(raw["pred_conf"])
    pred_cls = flat(raw["pred_cls"])
    pred_boxes = flat(raw["pred_boxes"])  # (N, 6) grid units

    n_obj = jnp.sum(obj_flat)
    n_valid = jnp.sum(valid)

    def obj_mse(p, t):
        return jnp.sum((p - t) ** 2 * obj_flat) / jnp.maximum(n_obj, 1.0)

    loss_x = obj_mse(pred_x, tx_flat)
    loss_y = obj_mse(pred_y, ty_flat)
    loss_w = obj_mse(pred_w, tw_flat)
    loss_h = obj_mse(pred_h, th_flat)
    loss_im = obj_mse(pred_im, tim_flat)
    loss_re = obj_mse(pred_re, tre_flat)
    # eps guards sqrt'(0) = inf when a cell predicts im = re = 0 exactly
    circle = (1.0 - jnp.sqrt(pred_im**2 + pred_re**2 + 1e-12)) ** 2
    loss_im_re = _masked_mean(circle, obj_flat)
    loss_eular = loss_im + loss_re + loss_im_re

    loss_conf_obj = _masked_mean(_bce(pred_conf, obj_flat), obj_flat)
    loss_conf_noobj = _masked_mean(_bce(pred_conf, obj_flat), noobj_flat)
    loss_cls = (
        jnp.sum(_bce(pred_cls, tcls_flat) * obj_flat[:, None])
        / jnp.maximum(n_obj * nc, 1.0)
    )

    # ---- per-target pred-vs-target rotated IoU / GIoU (yolo_layer.py:128-133)
    # MSE mode needs only plain IoU (the reference's MSE-mode "giou_loss"
    # metric is sum(1-IoU), iou_pred_vs_target_boxes with GIoU=False) — skip
    # the enclosing-hull computation entirely there.
    tgt_cell = jnp.where(valid, cell, 0).ravel()
    pb = pred_boxes[tgt_cell].reshape(b_sz, t_cap, 6)
    p5 = jnp.stack(
        [pb[..., 0], pb[..., 1], pb[..., 2], pb[..., 3],
         jnp.arctan2(pb[..., 4], pb[..., 5])], axis=-1)
    vmask = valid.astype(jnp.float32)
    if use_giou_loss:
        giou, iou_for_loss = rb.rotated_giou(p5, t5)
        giou_loss = jnp.sum((1.0 - giou) * vmask) / jnp.maximum(n_valid, 1.0)
        loss_obj = loss_conf_obj + loss_conf_noobj
        total = (
            giou_loss * LGIOU_SCALE
            + loss_eular * LEULAR_SCALE
            + loss_obj * LOBJ_SCALE
            + loss_cls * LCLS_SCALE
        )
    else:
        iou_for_loss = None  # only metrics need it; computed under the gate
        giou_loss = jnp.float32(0.0)
        loss_obj = OBJ_SCALE * loss_conf_obj + NOOBJ_SCALE * loss_conf_noobj
        total = loss_x + loss_y + loss_w + loss_h + loss_eular + loss_obj + loss_cls

    # ---- metrics (parity with yolo_layer.py:223-251) ----
    def _metric_extras():
        iou = (rb.rotated_iou(p5, t5) if iou_for_loss is None
               else iou_for_loss)
        iou_loss_plain = (jnp.sum((1.0 - iou) * vmask)
                          / jnp.maximum(n_valid, 1.0))
        cls_pred_at = jnp.argmax(pred_cls, axis=-1)
        class_match = scatter(
            (cls_pred_at[tgt_cell].reshape(b_sz, t_cap) == cls_safe
             ).astype(jnp.float32) * vmask)
        iou_scores_flat = scatter(iou * vmask)
        conf50 = (pred_conf > 0.5).astype(jnp.float32)
        iou50 = (iou_scores_flat > 0.5).astype(jnp.float32)
        iou75 = (iou_scores_flat > 0.75).astype(jnp.float32)
        detected = conf50 * class_match * obj_flat
        return (
            _masked_mean(iou_scores_flat, obj_flat),              # iou_score
            giou_loss if use_giou_loss else iou_loss_plain,       # giou_loss
            100.0 * _masked_mean(class_match, obj_flat),          # cls_acc
            jnp.sum(iou50 * detected) / jnp.maximum(n_obj, _EPS),  # recall50
            jnp.sum(iou75 * detected) / jnp.maximum(n_obj, _EPS),  # recall75
            jnp.sum(iou50 * detected) / (jnp.sum(conf50) + _EPS),  # precision
            _masked_mean(pred_conf, obj_flat),                    # conf_obj
            _masked_mean(pred_conf, noobj_flat),                  # conf_noobj
        )

    if want_metrics is None:
        extras = _metric_extras()
    else:
        extras = jax.lax.cond(
            want_metrics, _metric_extras,
            lambda: tuple(jnp.float32(0.0) for _ in range(8)))
    (iou_score, giou_metric, cls_acc, recall50, recall75, precision,
     conf_obj, conf_noobj) = extras
    metrics = {
        "loss": total,
        "iou_score": iou_score,
        "giou_loss": giou_metric,
        "loss_x": loss_x,
        "loss_y": loss_y,
        "loss_w": loss_w,
        "loss_h": loss_h,
        "loss_eular": loss_eular,
        "loss_im": loss_im,
        "loss_re": loss_re,
        "loss_obj": loss_obj,
        "loss_cls": loss_cls,
        "cls_acc": cls_acc,
        "recall50": recall50,
        "recall75": recall75,
        "precision": precision,
        "conf_obj": conf_obj,
        "conf_noobj": conf_noobj,
    }
    return total, metrics


def network_loss(
    spec: NetSpec,
    head_raw: Sequence[Dict[str, Any]],
    targets: jnp.ndarray,
    target_mask: jnp.ndarray,
    *,
    use_giou_loss: bool = False,
    want_metrics=None,
) -> Tuple[jnp.ndarray, List[Dict[str, jnp.ndarray]]]:
    """Sum of per-head losses (reference: darknet2pytorch.py:220-226).

    Returns (total_loss, per-head metric dicts)."""
    yolo_specs = [spec.layers[i] for i in spec.yolo_indices]
    assert len(yolo_specs) == len(head_raw)
    total = jnp.float32(0.0)
    all_metrics = []
    for hspec, raw in zip(yolo_specs, head_raw):
        loss, metrics = head_loss(
            raw, hspec, targets, target_mask, use_giou_loss=use_giou_loss,
            want_metrics=want_metrics)
        total = total + loss
        all_metrics.append(metrics)
    return total, all_metrics
