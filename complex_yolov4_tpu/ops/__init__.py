"""Geometry and post-processing ops (rotated boxes, NMS) — all on-device."""

from . import nms, pallas_conv, rotated_boxes
from .nms import nms_batch, nms_single
from .rotated_boxes import (
    box_corners,
    intersection_area,
    pairwise_rotated_iou,
    rotated_giou,
    rotated_iou,
)

__all__ = [
    "box_corners",
    "intersection_area",
    "nms",
    "pallas_conv",
    "nms_batch",
    "nms_single",
    "pairwise_rotated_iou",
    "rotated_boxes",
    "rotated_giou",
    "rotated_iou",
]
