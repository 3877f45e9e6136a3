"""CLI smoke tests: every entry point runs end-to-end on synthetic data.

The reference had no CLI coverage at all (SURVEY.md §4); these run the real
argv surfaces in-process on tiny configs.
"""

import json
import os

import numpy as np
import pytest

from complex_yolov4_tpu.data import synthetic


@pytest.fixture(scope="module")
def kitti_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kitti_cli"))
    synthetic.generate_kitti_dataset(root, num_train=4, num_val=2, num_test=2,
                                     seed=3, write_images=True)
    return root


def test_train_cli_end_to_end(kitti_root, tmp_path):
    from complex_yolov4_tpu.cli.train import main

    wd = str(tmp_path / "wd")
    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--batch_size", "2", "--num_epochs", "1", "--subdivisions", "1",
          "--working_dir", wd, "--checkpoint_freq", "1", "--print_freq", "1",
          "--compute_dtype", "float32", "--no_val"])
    ckpt = os.path.join(wd, "checkpoints", "complexer_yolo", "epoch_1")
    assert os.path.isdir(ckpt)
    log = os.path.join(wd, "logs", "complexer_yolo", "logger_complexer_yolo.txt")
    assert os.path.isfile(log)

    # resume from the checkpoint for one more epoch
    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--batch_size", "2", "--num_epochs", "2", "--subdivisions", "1",
          "--working_dir", wd, "--checkpoint_freq", "1", "--print_freq", "1",
          "--compute_dtype", "float32", "--no_val", "--resume_path", ckpt])
    assert os.path.isdir(os.path.join(wd, "checkpoints", "complexer_yolo", "epoch_2"))


def test_test_cli_writes_images(kitti_root, tmp_path):
    from complex_yolov4_tpu.cli.test import main

    wd = str(tmp_path / "wd")
    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--num_samples", "1", "--working_dir", wd, "--save_test_output",
          "--compute_dtype", "float32"])
    results = os.path.join(wd, "results", "complexer_yolo")
    assert any(f.endswith(".jpg") for f in os.listdir(results))


def test_evaluate_cli_runs(kitti_root, capsys):
    from complex_yolov4_tpu.cli.evaluate import main

    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--num_samples", "2", "--compute_dtype", "float32"])
    out = capsys.readouterr().out
    assert "mAP" in out


def test_find_anchors_cli(kitti_root, capsys):
    from complex_yolov4_tpu.cli.find_anchors import main

    main(["--dataset_dir", kitti_root, "--num_anchors", "3"])
    out = capsys.readouterr().out
    assert "avg IoU" in out and "anchors" in out


def test_train_val_split_cli(tmp_path, capsys):
    from complex_yolov4_tpu.cli.train_val_split import main

    root = str(tmp_path / "ds")
    main(["--dataset_dir", root, "--num_ids", "100", "--val_size", "0.25"])
    train = open(os.path.join(root, "ImageSets", "train.txt")).read().split()
    val = open(os.path.join(root, "ImageSets", "val.txt")).read().split()
    assert len(train) == 75 and len(val) == 25
    assert not set(train) & set(val)


def test_pretrained_weights_flow(kitti_root, tmp_path):
    """Export darknet weights, reload through --pretrained_path."""
    import jax

    from complex_yolov4_tpu.cli.evaluate import main
    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net
    from complex_yolov4_tpu.models import weights_io as wio

    spec = get_model_spec("complex_yolov4_tiny")
    params, state = net.init_params(spec, jax.random.PRNGKey(7))
    wpath = str(tmp_path / "model.weights")
    wio.save_darknet_weights(spec, params, state, wpath)
    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--num_samples", "1", "--pretrained_path", wpath,
          "--compute_dtype", "float32"])
