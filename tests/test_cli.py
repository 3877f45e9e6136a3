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


def test_train_cli_epoch_preload_sync_checkpoint(kitti_root, tmp_path):
    # Round-5 tunnel-wedge flags: all of an epoch's batches uploaded before
    # the first dispatch, and the async checkpoint joined before training
    # on. Must be drop-in equivalent on the training contract surface.
    from complex_yolov4_tpu.cli.train import main

    wd = str(tmp_path / "wd_pre")
    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--batch_size", "2", "--num_epochs", "1", "--subdivisions", "1",
          "--working_dir", wd, "--checkpoint_freq", "1", "--print_freq", "1",
          "--compute_dtype", "float32", "--no_val",
          "--epoch_preload", "--sync_checkpoint"])
    assert os.path.isdir(
        os.path.join(wd, "checkpoints", "complexer_yolo", "epoch_1"))
    log = open(os.path.join(wd, "logs", "complexer_yolo",
                            "logger_complexer_yolo.txt")).read()
    assert "joined (sync)" in log


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


def test_export_cli_all_formats(kitti_root, tmp_path):
    from complex_yolov4_tpu.cli.export import main

    # darknet binary
    out_w = str(tmp_path / "model.weights")
    main(["--model", "complex_yolov4_tiny", "--format", "darknet",
          "--output", out_w])
    assert os.path.getsize(out_w) > 1_000_000

    # orbax
    out_o = str(tmp_path / "ckpt")
    main(["--model", "complex_yolov4_tiny", "--format", "orbax",
          "--output", out_o])
    assert os.path.isdir(out_o)

    # stablehlo serving artifact (small input for test speed)
    out_s = str(tmp_path / "model.shlo")
    main(["--model", "complex_yolov4_tiny", "--format", "stablehlo",
          "--output", out_s, "--img_size", "128", "--max_boxes", "16"])
    assert os.path.getsize(out_s) > 10_000  # program only; weights are args

    # the serialized program must run after deserialization
    import jax
    from jax import export as jexport

    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net

    restored = jexport.deserialize(open(out_s, "rb").read())
    spec = get_model_spec("complex_yolov4_tiny")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    # the artifact's weight signature is bf16 (cast_conv_params at export:
    # half-size serving payloads, numerically identical program)
    fparams = net.cast_conv_params(net.fold_batchnorm(spec, params, state))
    imgs = np.zeros((1, 128, 128, 3), np.float32)
    dets, masks = restored.call(fparams, imgs)
    assert dets.shape == (1, 16, 9)

    # points-input serving artifact: raster runs inside the program
    out_p = str(tmp_path / "model_pts.shlo")
    main(["--model", "complex_yolov4_tiny", "--format", "stablehlo",
          "--output", out_p, "--input", "points", "--max_points", "2048",
          "--max_boxes", "16", "--img_size", "128"])  # raster 608 -> resize 128
    restored_p = jexport.deserialize(open(out_p, "rb").read())
    pts = np.zeros((1, 2048, 4), np.float32)
    pts[0, :, 0] = np.linspace(1, 40, 2048)
    pts[0, :, 1] = np.linspace(-20, 20, 2048)
    dets_p, masks_p = restored_p.call(fparams, pts,
                                      np.ones((1, 2048), np.float32))
    assert dets_p.shape == (1, 16, 9)
    assert np.all(np.isfinite(np.asarray(dets_p)))


def test_train_cli_profiler_flag(kitti_root, tmp_path):
    from complex_yolov4_tpu.cli.train import main

    wd = str(tmp_path / "wd")
    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--batch_size", "2", "--num_epochs", "1", "--subdivisions", "1",
          "--working_dir", wd, "--print_freq", "1", "--compute_dtype",
          "float32", "--no_val", "--profile_steps", "1", "--profile_start", "1"])
    logs = os.path.join(wd, "logs", "complexer_yolo")
    assert any("plugins" in d or "trace" in d.lower()
               for d in os.listdir(logs)), os.listdir(logs)


def test_test_cli_video_output(kitti_root, tmp_path):
    from complex_yolov4_tpu.cli.test import main

    wd = str(tmp_path / "wd")
    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--num_samples", "2", "--working_dir", wd, "--save_test_output",
          "--output_format", "video", "--compute_dtype", "float32"])
    results = os.path.join(wd, "results", "complexer_yolo")
    vids = [f for f in os.listdir(results) if f.endswith(".avi")]
    assert vids and os.path.getsize(os.path.join(results, vids[0])) > 10_000


def test_train_cli_with_cfgfile(kitti_root, tmp_path):
    """--cfgfile path: build the model from the darknet DSL end-to-end."""
    cfg = "/root/reference/src/config/cfg/complex_yolov4_tiny.cfg"
    if not os.path.isfile(cfg):
        import pytest

        pytest.skip("reference cfg tree not present")
    from complex_yolov4_tpu.cli.train import main

    wd = str(tmp_path / "wd")
    main(["--dataset_dir", kitti_root, "--cfgfile", cfg, "--batch_size", "2",
          "--num_epochs", "1", "--subdivisions", "1", "--working_dir", wd,
          "--checkpoint_freq", "1", "--print_freq", "1",
          "--compute_dtype", "float32", "--no_val"])
    assert os.path.isdir(os.path.join(wd, "checkpoints", "complexer_yolo", "epoch_1"))


def test_evaluate_cli_quantized(kitti_root, capsys):
    """--quantize int8: PTQ calibrates on loader batches and the quantized
    program produces the mAP report."""
    from complex_yolov4_tpu.cli.evaluate import main

    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--num_samples", "2", "--compute_dtype", "float32",
          "--quantize", "int8", "--calib_batches", "1"])
    out = capsys.readouterr().out
    assert "PTQ int8" in out and "mAP" in out


def test_evaluate_cli_cells_raster(kitti_root, capsys):
    """--cells_raster end-to-end through the eval CLI (the one COO surface
    no test touched: calib-loader twin, batch_cap tail wiring). num_samples
    (1) < batch_size (2) so the only batch IS a remainder — it must serve
    through the padded full-batch program, not retrace."""
    from complex_yolov4_tpu.cli.evaluate import main

    main(["--dataset_dir", kitti_root, "--model", "complex_yolov4_tiny",
          "--num_samples", "1", "--batch_size", "2", "--cells_raster",
          "--compute_dtype", "float32"])
    out = capsys.readouterr().out
    assert "mAP" in out
