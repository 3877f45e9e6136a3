"""Typed runtime configuration for the CLIs.

One frozen dataclass per CLI, mirroring the reference's argparse surface
(reference: src/config/train_config.py:18-161, src/test.py:33-88,
src/evaluate.py:67-105) — same flag names and defaults wherever they still
make sense on this stack (DDP rendezvous flags are replaced by JAX
multi-host fields; cuda/gpu flags by device-count fields). `from_args`
builders parse argv; derived directories are created on demand.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple


@dataclasses.dataclass
class TrainConfig:
    # run identity / IO
    seed: int = 2020
    saved_fn: str = "complexer_yolo"
    working_dir: str = "./workdir"
    dataset_dir: str = "./dataset/kitti"

    # model
    arch: str = "darknet"
    model: str = "complex_yolov4"          # zoo name (replaces --cfgfile)
    cfgfile: Optional[str] = None           # darknet cfg path (alternative)
    pretrained_path: Optional[str] = None
    resume_path: Optional[str] = None
    img_size: int = 608
    use_giou_loss: bool = False

    # augmentation
    hflip_prob: float = 0.5
    cutout_prob: float = 0.0
    cutout_nholes: int = 1
    cutout_ratio: float = 0.3
    cutout_fill_value: float = 0.0
    multiscale_training: bool = False
    no_precompile_multiscale: bool = False   # skip up-front size-bucket jits
    host_raster: bool = False                # force host-side BEV rasterization
                                             # (default: rasterize on device,
                                             # uploading compact points instead
                                             # of images; mosaic always host)
    sync_checkpoint: bool = False            # join the async checkpoint D2H
                                             # before training on (tunnel
                                             # links that wedge when D2H
                                             # streams against dispatches)
    epoch_preload: bool = False              # upload ALL of an epoch's batches
                                             # before dispatching its steps, so
                                             # H2D never interleaves with
                                             # execution (low-bandwidth links
                                             # that wedge under mixed traffic;
                                             # costs device memory for one
                                             # epoch of batches)
    mosaic: bool = False
    random_padding: bool = False

    # data / batching
    num_samples: Optional[int] = None
    batch_size: int = 4
    subdivisions: int = 16                  # global batch 64 semantics
    synthetic: bool = False                 # generate a synthetic dataset
    synthetic_frames: int = 16

    # loop / logging
    print_freq: int = 50
    tensorboard_freq: int = 50
    checkpoint_freq: int = 5
    start_epoch: int = 1
    num_epochs: int = 300
    no_val: bool = False

    # optimizer / schedule
    lr_type: str = "cosin"
    lr: float = 0.001
    minimum_lr: float = 1e-7
    momentum: float = 0.949
    weight_decay: float = 5e-4
    optimizer_type: str = "adam"
    burn_in: int = 50
    steps: Tuple[int, int] = (1500, 4000)

    # eval protocol (in-training validation)
    conf_thresh: float = 0.5
    nms_thresh: float = 0.5
    iou_thresh: float = 0.5

    # numerics
    compute_dtype: str = "bfloat16"         # training compute precision
    remat: bool = False                     # rematerialize fwd in bwd (memory)
    batch_pack: int = 2                     # pack p frames into channels over
                                            # the early backbone (exact math,
                                            # exact per-channel BN stats —
                                            # models/bpack.py; measured +17%
                                            # step, PERF.md r4; 0 = off, inert
                                            # when batch %% p != 0)

    # profiling (writes a JAX/xprof trace into logs_dir)
    profile_steps: int = 0                  # 0 = off; else trace N steps
    profile_start: int = 3                  # first traced global iteration

    # distributed (multi-host JAX; replaces DDP's rendezvous surface)
    num_processes: int = 1
    process_id: int = 0
    coordinator_address: Optional[str] = None

    @property
    def checkpoints_dir(self) -> str:
        return os.path.join(self.working_dir, "checkpoints", self.saved_fn)

    @property
    def logs_dir(self) -> str:
        return os.path.join(self.working_dir, "logs", self.saved_fn)

    def make_dirs(self) -> None:
        os.makedirs(self.checkpoints_dir, exist_ok=True)
        os.makedirs(self.logs_dir, exist_ok=True)


@dataclasses.dataclass
class TestConfig:
    saved_fn: str = "complexer_yolo"
    working_dir: str = "./workdir"
    dataset_dir: str = "./dataset/kitti"
    model: str = "complex_yolov4"
    cfgfile: Optional[str] = None
    pretrained_path: Optional[str] = None
    img_size: int = 608
    batch_size: int = 1
    num_samples: Optional[int] = None
    conf_thresh: float = 0.5
    nms_thresh: float = 0.5
    show_image: bool = False
    save_test_output: bool = False
    output_format: str = "image"
    output_video_fn: str = "out_complexer_yolo"
    save_3d: bool = False                    # interactive HTML lidar viewer per frame
    synthetic: bool = False
    synthetic_frames: int = 4
    compute_dtype: str = "bfloat16"
    quantize: str = "none"                   # "none" | "int8" (PTQ, models/quantize.py)
    calib_batches: int = 2                   # calibration batches for --quantize int8
    host_raster: bool = False                # force host-side BEV rasterization

    @property
    def results_dir(self) -> str:
        return os.path.join(self.working_dir, "results", self.saved_fn)


@dataclasses.dataclass
class EvalConfig:
    saved_fn: str = "complexer_yolo"
    working_dir: str = "./workdir"
    dataset_dir: str = "./dataset/kitti"
    model: str = "complex_yolov4"
    cfgfile: Optional[str] = None
    pretrained_path: Optional[str] = None
    img_size: int = 608
    batch_size: int = 4
    num_samples: Optional[int] = None
    conf_thresh: float = 0.5
    nms_thresh: float = 0.5
    iou_thresh: float = 0.5
    synthetic: bool = False
    synthetic_frames: int = 8
    compute_dtype: str = "float32"
    quantize: str = "none"                   # "none" | "int8" (PTQ, models/quantize.py)
    calib_batches: int = 2                   # calibration batches for --quantize int8
    host_raster: bool = False                # force host-side BEV rasterization
    cells_raster: bool = False               # host-aggregated COO raster
                                             # (single-device serving; the
                                             # bench-default layout)


def _add_fields(parser: argparse.ArgumentParser, cls) -> None:
    for f in dataclasses.fields(cls):
        name = "--" + f.name
        if f.type in ("bool", bool) or isinstance(f.default, bool):
            parser.add_argument(name, action="store_true", default=f.default)
        elif f.name == "steps":
            parser.add_argument(name, nargs=2, type=int, default=list(f.default))
        else:
            typ = type(f.default) if f.default is not None else str
            if typ is type(None):
                typ = str
            parser.add_argument(name, type=typ, default=f.default)


def _build(cls, argv=None):
    parser = argparse.ArgumentParser(description=cls.__name__)
    _add_fields(parser, cls)
    ns = parser.parse_args(argv)
    kwargs = {f.name: getattr(ns, f.name) for f in dataclasses.fields(cls)}
    if "steps" in kwargs:
        kwargs["steps"] = tuple(kwargs["steps"])
    # optional ints arrive as strings from argparse when default is None
    if kwargs.get("num_samples") is not None:
        kwargs["num_samples"] = int(kwargs["num_samples"])
    return cls(**kwargs)


def parse_train_config(argv=None) -> TrainConfig:
    return _build(TrainConfig, argv)


def parse_test_config(argv=None) -> TestConfig:
    return _build(TestConfig, argv)


def parse_eval_config(argv=None) -> EvalConfig:
    return _build(EvalConfig, argv)
