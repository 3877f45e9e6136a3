"""Evaluation CLI (reference entry point parity: src/evaluate.py).

Usage (synthetic smoke):
    python -m complex_yolov4_tpu.cli.evaluate --synthetic \
        --model complex_yolov4_tiny
"""

from __future__ import annotations

import sys

import numpy as np

from ..config.kitti import CLASS_NAMES
from ..config.runtime import parse_eval_config
from ..data import create_val_loader
from ..evaluation import evaluate_map, make_inference_fn
from . import common


def main(argv=None) -> None:
    configs = parse_eval_config(argv)
    dataset_dir = common.resolve_dataset_dir(configs)
    spec = common.resolve_spec(configs)
    params, state = common.init_or_load(spec, configs.pretrained_path)
    # Device-side rasterization by default (--host_raster to disable): the
    # loader ships compact points and the fused program rasterizes on
    # device — ~14x less H2D per evaluated frame (matches bench/entry).
    device_raster = not configs.host_raster
    cells_raster = configs.cells_raster and device_raster
    # Multi-device hosts use the batched (B, C) COO layout so the from_cells
    # program shards over the mesh; single-device keeps the flat layout
    # (fewest scatter lanes — the measured-fastest serving config).
    import jax

    cells_batched = cells_raster and jax.device_count() > 1
    loader = create_val_loader(dataset_dir, configs.batch_size,
                               num_samples=configs.num_samples,
                               device_raster=device_raster,
                               cells_raster=cells_raster,
                               cells_batched=cells_batched)
    # int8 calibration needs host-rasterized images; when the eval loader is
    # deferred (points), hand maybe_quantize a host-raster twin instead
    # (maybe_quantize itself no-ops unless --quantize int8).
    calib_loader = (create_val_loader(dataset_dir, configs.batch_size,
                                      num_samples=configs.num_samples)
                    if device_raster
                    and getattr(configs, "quantize", "none") == "int8"
                    else loader)
    spec, params, state, quant = common.maybe_quantize(
        spec, params, state, configs, calib_loader)
    # Multi-device hosts evaluate data-parallel: batch sharded over the mesh,
    # weights replicated (single device degrades to the plain jit). The COO
    # path shards too via the batched layout (loader cells_batched above).
    from ..parallel import make_mesh_for_batch

    mesh = None
    if jax.device_count() > 1:
        mesh = make_mesh_for_batch(configs.batch_size)
        if mesh.devices.size > 1:
            print(f"eval data mesh: {mesh.devices.size} device(s)")
        else:
            mesh = None
    # (If the mesh degraded to one device, a cells_batched loader still
    # serves through the single-device jit — just more lanes than flat.)
    infer = make_inference_fn(
        spec, conf_thresh=configs.conf_thresh, nms_thresh=configs.nms_thresh,
        compute_dtype=common.compute_dtype_of(configs), quant=quant,
        mesh=mesh, from_points=device_raster and not cells_raster,
        from_cells=cells_raster)  # val rasters at the native 608

    out = evaluate_map(
        infer, params, state, loader, iou_threshold=configs.iou_thresh,
        progress=lambda done, total: print(f"\reval {done}/{total}", end="",
                                           flush=True))
    print()
    for i, cls_idx in enumerate(out["ap_class"]):
        name = CLASS_NAMES[int(cls_idx)] if int(cls_idx) < len(CLASS_NAMES) else str(cls_idx)
        print(f"\t>>>\t Class {int(cls_idx)} ({name}): precision = {out['precision'][i]:.4f}, "
              f"recall = {out['recall'][i]:.4f}, AP = {out['AP'][i]:.4f}, "
              f"f1: {out['f1'][i]:.4f}")
    print(f"\nmAP: {float(out['mAP']):.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
