"""NMS detection-capacity mAP gate (VERDICT r3 #5).

The serving NMS tail scales ~k^2 in the suppress-matrix pair IoU (0.9 of the
1.4 ms tail at k=128); real post-NMS scenes hold ~10-30 detections. This
gate re-runs the round-2 accuracy protocol (trained flagship checkpoint,
64-frame held-out synthetic val split, identical serving numerics) at
detection capacities 256 (eval default) / 128 (bench default) / 64
(candidate) — if mAP holds within the 0.5-pt budget at k=64, BENCH_NMS_K's
default flips.

Usage:
    python scripts/gate_nms_k.py --ckpt /tmp/r4gate/checkpoints/gate/epoch_200 \
        [--dataset /tmp/synthetic_kitti_128] [--ks 256,128,64]
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
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--dataset", default="/tmp/synthetic_kitti_128")
    ap.add_argument("--ks", default="256,128,64")
    ap.add_argument("--batch_size", type=int, default=16)
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--model", default="complex_yolov4")
    ap.add_argument("--num_samples", type=int, default=None,
                    help="cap val frames (CPU dry runs)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU platform (wiring dry runs)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from complex_yolov4_tpu.data import create_val_loader
    from complex_yolov4_tpu.evaluation import evaluate_map, make_inference_fn
    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net
    from complex_yolov4_tpu.cli.common import load_weights

    spec = get_model_spec(args.model)
    params, state = load_weights(spec, args.ckpt)

    quant = None
    if args.quant == "int8":
        from complex_yolov4_tpu.models import quantize as qz

        fparams = net.fold_batchnorm(spec, params, state)
        spec = net.fold_spec(spec)
        params, state = fparams, {}
        calib_loader = create_val_loader(args.dataset, args.batch_size,
                                         num_samples=min(
                                             8, args.num_samples or 8))
        calib = [np.asarray(b["image"]) for b in calib_loader]
        quant = qz.quantize_model(spec, params, calib)
        print(f"int8 PTQ: {len(quant)} convs (bench serving config)")

    loader = create_val_loader(args.dataset, args.batch_size,
                               num_samples=args.num_samples,
                               device_raster=True, cells_raster=True)
    # Pre-upload every val batch's device arrays and BLOCK before any
    # dispatch: through the axon tunnel, H2D interleaved with queued
    # executions wedges the server (same mechanism cli.train --epoch_preload
    # removes; the r5 gate eval froze exactly there). A list satisfies
    # evaluate_map's len+iter contract; jnp.asarray on a committed device
    # array is a no-op, so the infer path is unchanged.
    import jax

    batches = list(loader)
    for b in batches:
        for k in ("cells", "cell_keys", "cell_dens"):
            if k in b:
                b[k] = jax.device_put(np.asarray(b[k]))
    jax.block_until_ready([b["cells"] for b in batches if "cells" in b])
    loader = batches
    rows = []
    for k in [int(v) for v in args.ks.split(",")]:
        infer = make_inference_fn(spec, compute_dtype=jnp.bfloat16,
                                  quant=quant, from_cells=True, max_boxes=k)
        t0 = time.perf_counter()
        out = evaluate_map(infer, params, state, loader)
        dt = time.perf_counter() - t0
        rows.append((k, float(out["mAP"]), dt))
        print(f"k={k:4d}: mAP {out['mAP']:.4f}  "
              f"APs {np.round(np.asarray(out['AP']), 4).tolist()}  "
              f"wall {dt:.1f}s", flush=True)

    base = rows[0][1]
    for k, m, _ in rows[1:]:
        print(f"k={k}: dmAP vs k={rows[0][0]} = {m - base:+.4f} "
              f"({'PASS' if abs(m - base) < 0.005 else 'FAIL'} at 0.5-pt gate)")


if __name__ == "__main__":
    sys.exit(main())
