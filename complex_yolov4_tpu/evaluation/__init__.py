"""Evaluation: rotated-IoU TP matching, per-class AP, mAP driver."""

from . import metrics
from .evaluator import evaluate_map, make_inference_fn
from .metrics import ap_per_class, batch_statistics, compute_ap, summarize_map

__all__ = [
    "ap_per_class",
    "batch_statistics",
    "compute_ap",
    "evaluate_map",
    "make_inference_fn",
    "metrics",
    "summarize_map",
]
