"""Complex-YOLO head decode as a pure on-device function.

Semantics match the reference decode exactly (reference: src/models/yolo_layer.py:144-190):
sigmoid on x/y/conf/cls, exp(w,h) clamped at 1e3 times the stride-scaled anchor,
raw im/re Euler components, plus grid-cell offsets; the concatenated output
carries x/y/w/l in input-pixel units. `scale_x_y` is stored but NOT applied,
replicating the reference quirk (yolo_layer.py:37 vs :161-162) — the published
checkpoints were trained without it.

Layout note: activations are NHWC so the per-cell layout here is
(B, gy, gx, anchor, 7+C) and the flattened box order is (gy, gx, anchor) —
the reference flattens (anchor, gy, gx). Box ordering within an image carries
no semantics (NMS/eval/loss are order-free), so this is a pure layout choice.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from .spec import YoloSpec

EXP_CLAMP_MAX = 1e3  # reference clamps exp(w/h) at 1E3 (yolo_layer.py:179-180)


def decode_head(feat: jnp.ndarray, spec: YoloSpec, img_size: int) -> Dict[str, Any]:
    """Decode one head.

    Args:
      feat: (B, G, G, A*(7+C)) raw conv output, float32.
      img_size: network input size in pixels (stride = img_size / G).

    Returns dict with grid-unit predictions (for the loss) and the pixel-unit
    concatenated `output` (B, A*G*G, 7+C).
    """
    b, g, g2, _ = feat.shape
    assert g == g2, "square grids only"
    na, nc = spec.num_anchors, spec.num_classes
    stride = img_size / g

    pred = feat.reshape(b, g, g, na, 7 + nc)

    pred_x = jax.nn.sigmoid(pred[..., 0])
    pred_y = jax.nn.sigmoid(pred[..., 1])
    pred_w = pred[..., 2]
    pred_h = pred[..., 3]
    pred_im = pred[..., 4]
    pred_re = pred[..., 5]
    pred_conf = jax.nn.sigmoid(pred[..., 6])
    pred_cls = jax.nn.sigmoid(pred[..., 7:])

    grid_y = jax.lax.broadcasted_iota(jnp.float32, (1, g, g, 1), 1)
    grid_x = jax.lax.broadcasted_iota(jnp.float32, (1, g, g, 1), 2)

    anchors = jnp.asarray(spec.anchors, jnp.float32)  # (A, 4): w, l, im, re
    anchor_w = anchors[:, 0] / stride
    anchor_h = anchors[:, 1] / stride

    bx = pred_x + grid_x
    by = pred_y + grid_y
    bw = jnp.minimum(jnp.exp(pred_w), EXP_CLAMP_MAX) * anchor_w
    bh = jnp.minimum(jnp.exp(pred_h), EXP_CLAMP_MAX) * anchor_h

    # Grid-unit boxes for the loss path: (B, G, G, A, 6)
    pred_boxes = jnp.stack([bx, by, bw, bh, pred_im, pred_re], axis=-1)

    output = jnp.concatenate(
        [
            (pred_boxes[..., :4] * stride).reshape(b, -1, 4),
            pred_boxes[..., 4:6].reshape(b, -1, 2),
            pred_conf.reshape(b, -1, 1),
            pred_cls.reshape(b, -1, nc),
        ],
        axis=-1,
    )

    # Note: only JAX-compatible leaves here — this dict crosses jit boundaries.
    return {
        "grid_size": g,
        "stride": stride,
        "scaled_anchors": jnp.stack(
            [anchor_w, anchor_h, anchors[:, 2], anchors[:, 3]], axis=-1),
        "pred_x": pred_x,
        "pred_y": pred_y,
        "pred_w": pred_w,
        "pred_h": pred_h,
        "pred_im": pred_im,
        "pred_re": pred_re,
        "pred_conf": pred_conf,
        "pred_cls": pred_cls,
        "pred_boxes": pred_boxes,
        "output": output,
    }
