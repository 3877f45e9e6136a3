"""Per-stage breakdown of the e2e inference pipeline on the real chip.

Measures, with the differential async-timing protocol (PERF.md), at the
bench default config (packed raster, int8 PTQ, batch 16, 608):
  - raster only
  - raster + forward (no NMS)
  - full pipeline (raster + forward + NMS)
and reports per-stage ms/batch by differencing.

Usage: python scripts/bench_stages.py [--quant none] [--nms_k 128]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def timed(fn, args, iters=20, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    # poisoned-buffer guard: force a real read
    flat = jax.tree_util.tree_leaves(out)
    assert np.all(np.isfinite(np.asarray(flat[0]))), "non-finite output"
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--nms_k", type=int, default=128)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--layout", default="coo", choices=["coo", "flat"])
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from complex_yolov4_tpu.data import bev as bev_mod
    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net
    from complex_yolov4_tpu.models import quantize as qz
    from complex_yolov4_tpu.ops.nms import nms_batch

    batch = args.batch
    spec = get_model_spec("complex_yolov4")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    # Keep folded params on HOST until after quantization: quantize_weights
    # reads every kernel with np.asarray, and a device tree would drag
    # ~256 MB back through the 0.03 GB/s tunnel (hours).
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)

    # flat-packed layout (bench default): one shared buffer + frame ids
    flat_cap = batch * 14336
    clustered = os.environ.get("BENCH_SCENE", "diffuse") == "clustered"
    print(f"scene={'clustered' if clustered else 'diffuse'}", file=sys.stderr)
    clouds = [bev_mod.remove_points_outside(
        synthetic.sample_scene(np.random.default_rng(b),
                               clustered=clustered)[0])
        for b in range(batch)]
    pf, ff, mf = bev_mod.pack_points_flat(clouds, flat_cap)
    points = jnp.asarray(pf)
    fid = jnp.asarray(ff)
    mask = jnp.asarray(mf)
    if args.layout == "coo":
        cl, kl = zip(*[bev_mod.aggregate_bev_cells(c) for c in clouds])
        total_cells = sum(len(c) for c in cl)
        # Same default AND same env override as bench.py, so stage-timing
        # arms can never silently run a different capacity than the e2e
        # bench when BENCH_COO_CAP is pinned for a sweep.
        coo_cap = int(os.environ.get(
            "BENCH_COO_CAP",
            str(min(max(total_cells + total_cells // 8, 1024), flat_cap))))
        print(f"coo: {total_cells} cells, capacity {coo_cap}",
              file=sys.stderr, flush=True)
        cc, kk, dd = bev_mod.pack_cells_flat(list(cl), list(kl), coo_cap)
        cells, keys, dens = jnp.asarray(cc), jnp.asarray(kk), jnp.asarray(dd)

        def raster(*a):
            return bev_mod.make_bev_map_from_cells(a[0], a[1], a[2], batch)
        raster_args = (cells, keys, dens)
    else:
        def raster(*a):
            return bev_mod.make_bev_map_jax_flat(a[0], a[1], a[2], batch)
        raster_args = (points, fid, mask)

    quant = None
    if args.quant == "int8":
        calib = np.stack([
            bev_mod.make_bev_map(
                bev_mod.remove_points_outside(
                    synthetic.sample_scene(np.random.default_rng(100 + i))[0]))
            for i in range(2)
        ])
        quant = qz.quantize_model(fspec, fparams, [calib])
        print(f"quant: {len(quant)} convs", file=sys.stderr, flush=True)
    fparams = jax.device_put(fparams)

    @jax.jit
    def raster_only(*rargs):
        return jnp.sum(raster(*rargs), axis=(1, 2, 3))  # reduce: nothing elided

    @jax.jit
    def raster_fwd(params, quant, *rargs):
        images = raster(*rargs)
        decoded, _ = net.apply(fspec, params, {}, images,
                               compute_dtype=jnp.bfloat16, quant=quant)
        return jnp.sum(decoded, axis=(1, 2))

    @jax.jit
    def full(params, quant, *rargs):
        images = raster(*rargs)
        decoded, _ = net.apply(fspec, params, {}, images,
                               compute_dtype=jnp.bfloat16, quant=quant)
        return nms_batch(decoded, 0.5, 0.5, args.nms_k)

    t_r = timed(raster_only, raster_args, args.iters)
    t_rf = timed(raster_fwd, (fparams, quant) + raster_args, args.iters)
    t_all = timed(full, (fparams, quant) + raster_args, args.iters)

    print(f"config: quant={args.quant} nms_k={args.nms_k} batch={batch} "
          f"layout={args.layout}")
    print(f"raster-only:        {t_r * 1e3:7.2f} ms/batch")
    print(f"raster+forward:     {t_rf * 1e3:7.2f} ms/batch "
          f"(forward ~ {(t_rf - t_r) * 1e3:.2f})")
    print(f"full pipeline:      {t_all * 1e3:7.2f} ms/batch "
          f"(nms+decode-tail ~ {(t_all - t_rf) * 1e3:.2f})")
    print(f"e2e frames/sec:     {batch / t_all:7.1f}")


if __name__ == "__main__":
    sys.exit(main())
