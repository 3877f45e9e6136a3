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
