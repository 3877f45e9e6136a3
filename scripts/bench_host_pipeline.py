"""Host input-pipeline rate (VERDICT r1 #5: host supply must outrun the chip).

Measures the training loader's sustained frames/sec on this host for the four
data configs, no device involved:
  plain            image batches (host raster)
  mosaic           fused native mosaic (raster+flip+cutout+placement+resize)
  plain-deferred   device_raster=True (compact points + aug decisions only)
  mosaic-deferred  mosaic + device_raster (what cli.train runs by default)

Synthetic dataset; steady-state over N batches after a warmup epoch pass.
CYV4_PYTHON_MOSAIC=1 measures the numpy mosaic fallback instead.
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from complex_yolov4_tpu.data import synthetic  # noqa: E402
from complex_yolov4_tpu.data.loader import create_train_loader  # noqa: E402

BATCH = int(os.environ.get("BATCH", "8"))
N_SAMPLES = int(os.environ.get("N_SAMPLES", "64"))
N_BATCHES = int(os.environ.get("N_BATCHES", "24"))


def rate(loader) -> float:
    done = 0
    t0 = None
    frames = 0
    while frames < N_BATCHES * BATCH:
        loader.set_epoch(done)
        for batch in loader:
            n = (batch["batch"] if "cells" in batch
                 else batch["image" if "image" in batch else "points"].shape[0])
            if t0 is None:  # first batch is pipeline fill — start after it
                t0 = time.perf_counter()
            else:
                frames += n
            if frames >= N_BATCHES * BATCH:
                break
        done += 1
    return frames / (time.perf_counter() - t0)


def main():
    with tempfile.TemporaryDirectory() as root:
        synthetic.generate_kitti_dataset(root, num_train=N_SAMPLES,
                                         num_val=N_SAMPLES, num_test=2,
                                         seed=0)
        for name, kw in (
            ("plain", {}),
            ("mosaic", {"mosaic": True, "random_padding": True,
                        "cutout_prob": 0.5}),
            ("plain-deferred", {"device_raster": True}),
            ("mosaic-deferred", {"mosaic": True, "random_padding": True,
                                 "cutout_prob": 0.5, "device_raster": True}),
        ):
            loader = create_train_loader(root, BATCH, num_samples=N_SAMPLES,
                                         **kw)
            print(f"{name:16s} {rate(loader):7.1f} frames/s", flush=True)

        # COO serving supply (VERDICT r3 #3a): the from_cells eval path pays
        # per-batch host aggregation — its sustained samples/s bounds the
        # achievable end-to-end from_cells throughput on this host.
        from complex_yolov4_tpu import native
        from complex_yolov4_tpu.data.loader import create_val_loader

        for name, avail in (("cells-native", True), ("cells-numpy", False)):
            if avail and not native.is_available():
                print(f"{name:16s} (native lib unavailable)")
                continue
            orig = native.is_available
            native.is_available = lambda: avail  # force the arm's path
            try:
                loader = create_val_loader(root, BATCH,
                                           num_samples=N_SAMPLES,
                                           device_raster=True,
                                           cells_raster=True)
                print(f"{name:16s} {rate(loader):7.1f} frames/s", flush=True)
            finally:
                native.is_available = orig


if __name__ == "__main__":
    main()
