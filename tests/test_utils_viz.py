"""Visualization + misc utils tests (drawing, KITTI export, meters, logger,
schedules plot, visualize_dataset CLI)."""

import logging
import os

import numpy as np

from complex_yolov4_tpu.data import synthetic
from complex_yolov4_tpu.data.kitti import default_calibration
from complex_yolov4_tpu.train.schedules import make_lr_fn, plot_lr_schedule
from complex_yolov4_tpu.utils import AverageMeter, ProgressMeter, create_logger
from complex_yolov4_tpu.utils import visualization as viz


def test_bev_drawing_roundtrip():
    img = viz.bev_to_uint8(np.random.default_rng(0).uniform(size=(128, 128, 3)).astype(np.float32))
    assert img.dtype == np.uint8 and img.shape == (128, 128, 3)
    dets = np.zeros((2, 9), np.float32)
    dets[0] = [60, 60, 20, 40, 0.5, 0.86, 0.9, 0.9, 0]
    dets[1] = [100, 30, 10, 20, 0, 1, 0.8, 0.8, 2]
    before = img.copy()
    viz.draw_detections_bev(img, dets, np.array([1.0, 1.0]))
    assert (img != before).any()


def test_detections_to_kitti_objects():
    calib = default_calibration()
    dets = np.zeros((2, 9), np.float32)
    # center of BEV: lidar x=25, y=0
    dets[0] = [304, 304, 20, 45, 0.0, 1.0, 0.95, 0.9, 0]
    dets[1] = [150, 400, 10, 12, 0.7, 0.7, 0.8, 0.7, 1]
    objs = viz.detections_to_kitti_objects(dets, np.ones(2), calib, (375, 1242), 608.0)
    assert len(objs) == 2
    assert objs[0].type == "Car" and objs[1].type == "Pedestrian"
    line = objs[0].to_kitti_format()
    assert line.startswith("Car ") and len(line.split()) == 16
    # camera z (depth) should be positive for a box in front
    assert objs[0].t[2] > 0
    img = np.zeros((375, 1242, 3), np.uint8)
    viz.draw_objects_on_camera(img, objs, calib)
    merged = viz.merge_rgb_to_bev(img, np.zeros((608, 608, 3), np.uint8), 608)
    assert merged.shape[1] == 608


def test_meters_and_logger(tmp_path):
    m = AverageMeter("loss", ":.2f")
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0
    pm = ProgressMeter(10, [m], prefix="E1")
    assert "loss" in pm.get_message(3)
    logger = create_logger(str(tmp_path), "t", is_lead=True)
    logger.info("hello")
    assert os.path.isfile(tmp_path / "logger_t.txt")
    silent = create_logger(str(tmp_path), "t2", is_lead=False)
    assert all(isinstance(h, logging.NullHandler) for h in silent.handlers)


def test_plot_lr_schedule(tmp_path):
    lr_fn = make_lr_fn("multi_step", 1e-3, burn_in=10, steps=(50, 80), num_epochs=5)
    out = str(tmp_path / "lr.png")
    plot_lr_schedule(lr_fn, num_epochs=5, iters_per_epoch=20, save_path=out)
    assert os.path.getsize(out) > 1000


def test_visualize_dataset_cli(tmp_path):
    from complex_yolov4_tpu.cli.visualize_dataset import main

    root = synthetic.generate_kitti_dataset(
        str(tmp_path / "ds"), num_train=2, num_val=1, num_test=1, seed=4)
    out = str(tmp_path / "viz")
    main(["--dataset_dir", root, "--num", "2", "--augment", "--output_dir", out])
    assert len(os.listdir(out)) == 2
    main(["--dataset_dir", root, "--num", "1", "--mosaic", "--output_dir", out])


def test_rescale_boxes_identity_for_square():
    from complex_yolov4_tpu.evaluation.metrics import rescale_boxes

    boxes = np.array([[10.0, 20.0, 30.0, 40.0]])
    out = rescale_boxes(boxes.copy(), 608, (608, 608))
    np.testing.assert_allclose(out, boxes)
    # non-square letterbox undo changes coordinates
    out2 = rescale_boxes(boxes.copy(), 608, (375, 1242))
    assert not np.allclose(out2, boxes)


def test_save_lidar_3d(tmp_path):
    rng = np.random.default_rng(0)
    pts, boxes, _ = synthetic.sample_scene(rng)
    out = str(tmp_path / "cloud.png")
    viz.save_lidar_3d(pts, out, boxes_lidar=boxes)
    assert os.path.getsize(out) > 10_000


def test_save_lidar_html_interactive_viewer(tmp_path):
    from complex_yolov4_tpu.utils import viewer_html

    rng = np.random.default_rng(1)
    pts, boxes, cls = synthetic.sample_scene(rng)
    out = str(tmp_path / "cloud.html")
    viewer_html.save_lidar_html(pts, out, boxes_lidar=boxes, box_classes=cls)
    html = open(out).read()
    # self-contained: no external script/link references
    assert "http://" not in html and "https://" not in html
    assert "WEBGL" in html.upper() or "webgl" in html
    # point payload embedded and sized right (N * 4 floats * 4 bytes, b64)
    assert str(pts.shape[0]) in html
    assert len(html) > pts.shape[0] * 16  # b64 of the cloud dominates
    # every box contributes 24 wireframe vertices
    import json as _json
    start = html.index('{"verts":')
    depth = 0
    for i in range(start, len(html)):
        depth += {"{": 1, "}": -1}.get(html[i], 0)
        if depth == 0:
            lines = _json.loads(html[start:i + 1])
            break
    assert len(lines["verts"]) == boxes.shape[0] * 24
    assert len(lines["cols"]) == len(lines["verts"])


def test_detections_to_lidar_boxes_roundtrip():
    """Detections placed at known BEV positions decode to lidar boxes whose
    BEV footprint matches targets_to_bev_pixels geometry."""
    from complex_yolov4_tpu.config import kitti as cnf
    from complex_yolov4_tpu.utils import viewer_html

    img = 608.0
    # one detection: center of the BEV map, 20x40 px, yaw 0.3
    yaw = 0.3
    det = np.zeros((2, 9), np.float32)
    det[0] = [304.0, 304.0, 20.0, 40.0, np.sin(yaw), np.cos(yaw),
              0.9, 0.8, 0.0]
    mask = np.array([1.0, 0.0], np.float32)
    labels = viewer_html.detections_to_lidar_boxes(det, mask, img)
    assert labels.shape == (1, 8)
    cls, x, y, z, h, w, l, rz = labels[0]
    bc = cnf.BOUNDARY
    # center of the raster maps to the middle of the x/y ranges
    np.testing.assert_allclose(x, (bc["maxX"] + bc["minX"]) / 2, atol=1e-6)
    np.testing.assert_allclose(y, (bc["maxY"] + bc["minY"]) / 2, atol=1e-6)
    # widths unnormalize through the +0.3 m inflation inverse
    span_x = bc["maxX"] - bc["minX"]
    span_y = bc["maxY"] - bc["minY"]
    np.testing.assert_allclose(w, 20.0 / img * span_y - 0.3, atol=1e-5)
    np.testing.assert_allclose(l, 40.0 / img * span_x - 0.3, atol=1e-5)
    # viewer yaw equals the BEV yaw atan2(im, re) (mod 2pi)
    assert abs((rz - yaw + np.pi) % (2 * np.pi) - np.pi) < 1e-6
