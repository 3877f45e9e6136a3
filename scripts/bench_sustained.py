"""Sustained single-host COO serving throughput (VERDICT r4 #5).

bench.py's headline aggregates the batch's point clouds to COO cells ONCE
outside the timed loop — it measures the device pipeline. In sustained
production serving every batch pays host-side work too: disk read, crop,
C++ cell aggregation, flat packing (data/loader.py, prefetch thread). On a
1-core host the aggregation supply rate (~420 f/s native, r4) is below the
device rate (620+), so the honest steady-state number is the smaller one —
IF the loader's prefetch actually hides host work behind device time.

Three measurements, same program and checkpoint-free init as bench.py:
  device   — re-serve one preloaded batch (bench.py's quantity)
  supply   — iterate the loader alone (host aggregation + IO ceiling)
  sustained— full pipelined loop: loader (prefetch=2) + depth-1 in-flight
             inference, blocking only on the previous batch's detections
             (the cli.evaluate/test serving pattern, evaluator.py:231-258)

Usage (real chip): python scripts/bench_sustained.py [--epochs 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="/tmp/synthetic_kitti_128")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--nms_k", type=int,
                    default=int(os.environ.get("BENCH_NMS_K", "64")))
    ap.add_argument("--model", default="complex_yolov4")
    ap.add_argument("--num_samples", type=int, default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (wiring dry runs)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from complex_yolov4_tpu.data import create_val_loader, synthetic
    from complex_yolov4_tpu.evaluation import make_inference_fn
    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net
    from complex_yolov4_tpu.utils import chiplock

    chiplock.acquire()

    if not os.path.isdir(args.dataset):
        n = 128
        synthetic.generate_kitti_dataset(args.dataset, num_train=n,
                                         num_val=n // 2, num_test=n // 4,
                                         seed=0)

    spec = net.fold_spec(get_model_spec(args.model))
    params0, state0 = net.init_params(get_model_spec(args.model),
                                      jax.random.PRNGKey(0))
    params = net.cast_conv_params(
        net.fold_batchnorm(get_model_spec(args.model), params0, state0))

    quant = None
    if args.quant == "int8":
        from complex_yolov4_tpu.models import quantize as qz

        calib_loader = create_val_loader(args.dataset, args.batch_size,
                                         num_samples=8)
        calib = [np.asarray(b["image"]) for b in calib_loader]
        quant = qz.quantize_model(spec, params, calib)
        print(f"int8 PTQ: {len(quant)} convs", file=sys.stderr)

    infer = make_inference_fn(spec, compute_dtype=jnp.bfloat16, quant=quant,
                              from_cells=True, max_boxes=args.nms_k)
    # Resident weights: without this every dispatch re-uploads ~128 MB of
    # params through the 0.03 GB/s tunnel (measured 85 f/s "device" rate in
    # the first r5 run — a measurement bug, not a pipeline property).
    params = jax.device_put(params)
    if quant is not None:
        quant = jax.device_put(quant)
    jax.block_until_ready(params)

    # One loader object re-iterated per epoch: the derived cell capacity
    # scans the split once at construction, not once per epoch.
    ld = create_val_loader(args.dataset, args.batch_size,
                           num_samples=args.num_samples,
                           device_raster=True, cells_raster=True)

    def loader():
        return ld

    def dispatch(batch):
        return infer(params, {}, jnp.asarray(batch["cells"]),
                     jnp.asarray(batch["cell_keys"]),
                     jnp.asarray(batch["cell_dens"]), batch["batch"],
                     batch.get("batch_cap", batch["batch"]))

    # -- warmup / compile on the first batch. The device-rate loop reuses
    # this batch; make its arrays device-resident so the metric measures
    # compute, not 20 re-uploads of the same cells through the tunnel.
    first = next(iter(loader()))
    for k in ("cells", "cell_keys", "cell_dens"):
        first[k] = jax.device_put(np.asarray(first[k]))
    nb = first["batch"]
    dets, masks = dispatch(first)
    v = float(np.asarray(dets).ravel()[0])
    assert np.isfinite(v)

    # -- supply: loader alone (host aggregation + disk + packing)
    t0 = time.perf_counter()
    n_sup = 0
    for _ in range(args.epochs):
        for batch in loader():
            n_sup += batch["batch"]
    supply = n_sup / (time.perf_counter() - t0)
    print(f"supply (host aggregation+IO) : {supply:8.2f} f/s", flush=True)

    # -- device: the preloaded-batch rate (bench.py's quantity, this program)
    iters = 20
    for _ in range(3):
        dets, masks = dispatch(first)
    jax.block_until_ready((dets, masks))
    t0 = time.perf_counter()
    for _ in range(iters):
        dets, masks = dispatch(first)
    jax.block_until_ready((dets, masks))
    _ = float(np.asarray(dets).ravel()[0])
    device = nb * iters / (time.perf_counter() - t0)
    print(f"device (preloaded batch)     : {device:8.2f} f/s", flush=True)

    # -- sustained: full pipelined serving loop
    t0 = time.perf_counter()
    n_fr = 0
    pending = None
    for _ in range(args.epochs):
        for batch in loader():
            out = dispatch(batch)
            if pending is not None:
                _ = float(np.asarray(pending[0]).ravel()[0])  # block on N-1
            pending = out
            n_fr += batch["batch"]
    _ = float(np.asarray(pending[0]).ravel()[0])
    sustained = n_fr / (time.perf_counter() - t0)

    overlap = (min(supply, device) and
               sustained / min(supply, device))
    print(f"sustained (pipelined serving): {sustained:8.2f} f/s "
          f"= {100 * overlap:.0f}% of min(supply, device)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
