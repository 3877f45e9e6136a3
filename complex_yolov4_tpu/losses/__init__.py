"""Losses: Complex-YOLO target assignment + multi-term detection loss."""

from .yolo_loss import build_targets_dense, head_loss, network_loss

__all__ = ["build_targets_dense", "head_loss", "network_loss"]
