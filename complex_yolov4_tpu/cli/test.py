"""Inference / demo CLI (reference entry point parity: src/test.py).

Runs the fused forward+NMS program on the test split, reports per-frame
latency/FPS, draws rotated boxes on the BEV map (and the camera image when
frames exist), and optionally writes images or a video.

Usage (synthetic smoke):
    python -m complex_yolov4_tpu.cli.test --synthetic \
        --model complex_yolov4_tiny --num_samples 2
"""

from __future__ import annotations

import os
import sys
import time

import cv2
import jax.numpy as jnp
import numpy as np

from ..config.runtime import parse_test_config
from ..data import create_test_loader
from ..data.kitti import Calibration, default_calibration
from ..evaluation import make_inference_fn
from ..utils import visualization as viz
from ..utils.meters import time_synchronized
from . import common


def main(argv=None) -> None:
    configs = parse_test_config(argv)
    dataset_dir = common.resolve_dataset_dir(configs)
    spec = common.resolve_spec(configs)
    params, state = common.init_or_load(spec, configs.pretrained_path)
    # Device-side raster by default: only compact points cross the link for
    # inference; the host image stays in the batch for drawing.
    device_raster = not configs.host_raster
    loader = create_test_loader(dataset_dir, configs.batch_size,
                                num_samples=configs.num_samples,
                                device_raster=device_raster)
    spec, params, state, quant = common.maybe_quantize(
        spec, params, state, configs, loader)
    infer = make_inference_fn(
        spec, conf_thresh=configs.conf_thresh, nms_thresh=configs.nms_thresh,
        compute_dtype=common.compute_dtype_of(configs), quant=quant,
        from_points=device_raster)
    if configs.save_test_output:
        os.makedirs(configs.results_dir, exist_ok=True)
    video_writer = None

    for b_idx, batch in enumerate(loader):
        images = np.asarray(batch["image"])  # host-side, for drawing
        if device_raster:
            args = (jnp.asarray(batch["points"]),
                    jnp.asarray(batch["point_mask"]),
                    jnp.asarray(batch["flip"]), jnp.asarray(batch["holes"]),
                    jnp.asarray(batch["hole_mask"]))
        else:
            args = (jnp.asarray(images),)
        t0 = time_synchronized()
        dets, masks = infer(params, state, *args)
        t1 = time_synchronized(dets, masks)
        dets, masks = np.asarray(dets), np.asarray(masks)
        fps = images.shape[0] / max(t1 - t0, 1e-9)
        print(f"batch {b_idx}: {(t1 - t0) * 1000 / images.shape[0]:.1f} ms/frame, "
              f"{fps:.1f} FPS, detections: {masks.sum(axis=-1).astype(int).tolist()}")

        for i in range(images.shape[0]):
            sample_id = int(batch["sample_ids"][i])
            bev_img = viz.bev_to_uint8(np.asarray(images[i]))
            viz.draw_detections_bev(bev_img, dets[i], masks[i])
            bev_img = cv2.rotate(bev_img, cv2.ROTATE_180)

            ds = loader.dataset
            calib_path = os.path.join(ds.paths["calib"], f"{sample_id:06d}.txt")
            calib = Calibration(calib_path) if os.path.exists(calib_path) \
                else default_calibration()
            img_path = ds.get_image_path(sample_id)
            if os.path.exists(img_path):
                cam = cv2.imread(img_path)
                objects = viz.detections_to_kitti_objects(
                    dets[i], masks[i], calib, cam.shape[:2],
                    float(images.shape[1]))
                viz.draw_objects_on_camera(cam, objects, calib)
                out_img = viz.merge_rgb_to_bev(cam, bev_img, output_width=608)
            else:
                out_img = bev_img

            if configs.save_3d:
                from ..utils.viewer_html import (detections_to_lidar_boxes,
                                                 save_lidar_html)
                os.makedirs(configs.results_dir, exist_ok=True)
                labels = detections_to_lidar_boxes(
                    dets[i], masks[i], float(images.shape[1]))
                boxes7 = labels[:, 1:]
                boxes7[:, 2] += boxes7[:, 3] / 2.0  # bottom z -> center z
                save_lidar_html(
                    ds.get_lidar(sample_id),
                    os.path.join(configs.results_dir, f"{sample_id:06d}.html"),
                    boxes_lidar=boxes7, box_classes=labels[:, 0],
                    title=f"frame {sample_id:06d} — detections")

            if configs.save_test_output:
                if configs.output_format == "image":
                    cv2.imwrite(os.path.join(
                        configs.results_dir, f"{sample_id:06d}.jpg"), out_img)
                elif configs.output_format == "video":
                    if video_writer is None:
                        h, w = out_img.shape[:2]
                        video_writer = cv2.VideoWriter(
                            os.path.join(configs.results_dir,
                                         configs.output_video_fn + ".avi"),
                            cv2.VideoWriter_fourcc(*"MJPG"), 30, (w, h))
                    video_writer.write(out_img)
            if configs.show_image:
                cv2.imshow("complex_yolov4_tpu", out_img)
                if cv2.waitKey(0) & 0xFF == 27:
                    return

    if video_writer is not None:
        video_writer.release()


if __name__ == "__main__":
    main(sys.argv[1:])
