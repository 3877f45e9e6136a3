"""Native C++ rasterizer: build, bit-parity with the numpy path, batch API."""

import os

import numpy as np
import pytest

from complex_yolov4_tpu import native
from complex_yolov4_tpu.data import bev, synthetic

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no C++ toolchain / build failed")


def test_native_matches_numpy_bitwise():
    rng = np.random.default_rng(5)
    points, _, _ = synthetic.sample_scene(rng)
    host = bev.make_bev_map(bev.remove_points_outside(points))
    got = native.rasterize_points(points)
    np.testing.assert_array_equal(got, host)


def test_native_coo_matches_numpy_bitwise():
    """The C++ COO aggregator must equal data/bev.py::aggregate_bev_cells
    exactly — same cell order, same packed keys (height/count/intensity
    quantizers run in double in both)."""
    for seed in (5, 11):
        points, _, _ = synthetic.sample_scene(np.random.default_rng(seed))
        c_np, k_np = bev.aggregate_bev_cells(bev.remove_points_outside(points))
        c_cc, k_cc = native.aggregate_cells(points)
        np.testing.assert_array_equal(c_cc, c_np)
        np.testing.assert_array_equal(k_cc, k_np)


def test_native_batch_files(tmp_path):
    root = synthetic.generate_kitti_dataset(
        str(tmp_path), num_train=3, num_val=1, num_test=1, seed=9)
    paths = [os.path.join(root, "training", "velodyne", f"{i:06d}.bin")
             for i in range(3)]
    batch = native.rasterize_files(paths, num_threads=2)
    assert batch.shape == (3, 608, 608, 3)
    for i, p in enumerate(paths):
        pts = np.fromfile(p, np.float32).reshape(-1, 4)
        ref = bev.make_bev_map(bev.remove_points_outside(pts))
        np.testing.assert_array_equal(batch[i], ref)


def test_native_missing_file_raises(tmp_path):
    with pytest.raises(IOError):
        native.rasterize_files([str(tmp_path / "missing.bin")])


def _mosaic_ds(root, cutout_prob=0.0, random_padding=True):
    from complex_yolov4_tpu.data.dataset import KittiDataset
    from complex_yolov4_tpu.data.transforms import (
        default_aug_transforms, default_lidar_transforms)

    return KittiDataset(
        root, mode="train",
        lidar_transforms=default_lidar_transforms(True),
        aug_transforms=default_aug_transforms(0.5, cutout_prob=cutout_prob,
                                              cutout_fill_value=0.25),
        mosaic=True, random_padding=random_padding)


@pytest.mark.parametrize("cutout_prob,random_padding", [
    (0.0, True), (0.0, False), (1.0, True)])
def test_fused_mosaic_matches_python(tmp_path, cutout_prob, random_padding):
    """Fused C++ mosaic == numpy canvas + cv2 2:1 resize, same RNG stream."""
    import cv2

    root = synthetic.generate_kitti_dataset(
        str(tmp_path), num_train=6, num_val=1, num_test=1, seed=3)
    ds = _mosaic_ds(root, cutout_prob, random_padding)
    for seed in range(4):
        rng_n = np.random.default_rng((11, seed))
        rng_p = np.random.default_rng((11, seed))
        _, fused, t_n, m_n = ds._load_mosaic_native(seed % len(ds), rng_n)
        _, canvas, t_p, m_p = ds._load_mosaic_python(seed % len(ds), rng_p)
        ref = cv2.resize(canvas, (608, 608), interpolation=cv2.INTER_LINEAR)
        assert fused.shape == (608, 608, 3)
        np.testing.assert_array_equal(t_n, t_p)
        np.testing.assert_array_equal(m_n, m_p)
        # identical RNG consumption -> identical stream position
        assert rng_n.bit_generator.state == rng_p.bit_generator.state
        np.testing.assert_allclose(fused, ref, atol=1e-6)


def test_fused_mosaic_dispatch_and_fallback(tmp_path):
    """load_mosaic uses the fused path; unsupported transforms fall back."""
    root = synthetic.generate_kitti_dataset(
        str(tmp_path), num_train=4, num_val=1, num_test=1, seed=4)
    ds = _mosaic_ds(root)
    _, img, _, _ = ds.load_mosaic(0, np.random.default_rng(0))
    assert img.shape == (608, 608, 3)  # fused path returns the final canvas

    class Sepia:  # an image transform the probe can't record
        def __call__(self, rng, img, tm):
            return img * 0.9, tm

    ds2 = _mosaic_ds(root)
    ds2.aug_transforms.transforms.append(Sepia())
    _, img2, t2, m2 = ds2.load_mosaic(0, np.random.default_rng(0))
    assert img2.shape == (1216, 1216, 3)  # python canvas (resized by loader)

    os.environ["CYV4_PYTHON_MOSAIC"] = "1"
    try:
        _, img3, t3, m3 = ds.load_mosaic(0, np.random.default_rng(0))
    finally:
        del os.environ["CYV4_PYTHON_MOSAIC"]
    assert img3.shape == (1216, 1216, 3)
