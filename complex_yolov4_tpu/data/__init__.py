"""Data layer: KITTI parsing, BEV rasterization, targets, datasets, loaders."""

from . import bev, kitti, synthetic, targets, transforms
from .dataset import KittiDataset
from .loader import (
    BatchIterator,
    create_test_loader,
    create_train_loader,
    create_val_loader,
)

__all__ = [
    "BatchIterator",
    "KittiDataset",
    "bev",
    "create_test_loader",
    "create_train_loader",
    "create_val_loader",
    "kitti",
    "synthetic",
    "targets",
    "transforms",
]
