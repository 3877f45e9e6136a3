"""Isolated fused-stage kernel benchmark: Pallas segment vs the XLA layer
sequence it replaces, on the real chip.

Timing protocol: differential + amortized through the axon tunnel (see
scripts/bench_convs.py and PERF.md).

Usage: python scripts/bench_fused.py [--tiles 19,38,76] [--batch 16]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="auto")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net
    from complex_yolov4_tpu.ops import fused_stage as fs

    B, K = args.batch, args.k
    spec = get_model_spec("complex_yolov4")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    segs = fs.plan_segments(fspec, 608)
    widths = {2: 304, 12: 152}

    def diff_time(fn, k_scan, *a, m1=1, m2=3):
        v = fn(*a)
        jax.block_until_ready(v)
        float(np.asarray(v).ravel()[0])

        def run(m):
            t0 = time.perf_counter()
            for _ in range(m):
                v = fn(*a)
            jax.block_until_ready(v)
            float(np.asarray(v).ravel()[0])
            return time.perf_counter() - t0

        run(m1)
        return (run(m2) - run(m1)) / (m2 - m1) / k_scan

    def xla_segment(seg):
        acts = fs._ACTS

        def run_ops(x):
            vals = {-1: x}
            for oi, op in enumerate(seg.ops):
                if op.kind in ("conv1x1", "conv3x3"):
                    p = fparams[f"layer{op.layer_index}"]
                    k = 1 if op.kind == "conv1x1" else 3
                    pad = 0 if k == 1 else 1
                    y = jax.lax.conv_general_dilated(
                        vals[op.srcs[0]], jnp.asarray(p["w"], jnp.bfloat16),
                        (1, 1), [(pad, pad), (pad, pad)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.bfloat16)
                    vals[oi] = acts[op.activation](
                        y + jnp.asarray(p["b"], jnp.bfloat16))
                elif op.kind == "shortcut":
                    vals[oi] = acts[op.activation](
                        vals[op.srcs[0]] + vals[op.srcs[1]])
                elif op.kind == "concat":
                    vals[oi] = jnp.concatenate(
                        [vals[s] for s in op.srcs], axis=-1)
                elif op.kind == "slice":
                    v = vals[op.srcs[0]]
                    c = v.shape[-1] // op.groups
                    vals[oi] = v[..., op.group_id * c:(op.group_id + 1) * c]
                else:
                    vals[oi] = vals[op.srcs[0]]
            return vals[len(seg.ops) - 1]

        return run_ops

    for seg in segs:
        width = widths[seg.start]
        x = jnp.asarray(
            np.random.randn(B, width, width, seg.cin) * 0.3, jnp.bfloat16)
        sp = fs.segment_params(seg, fparams)
        run_ops = xla_segment(seg)

        @jax.jit
        def run_xla(x):
            def body(acc, i):
                y = run_ops(x + i.astype(x.dtype))
                return acc + jnp.sum(y.astype(jnp.float32)), None
            acc, _ = jax.lax.scan(
                body, jnp.float32(0), jnp.arange(K, dtype=jnp.int32))
            return acc

        dt = diff_time(run_xla, K, x)
        print(f"seg {seg.start}..{seg.end} @{width}  XLA: {dt*1e3:7.3f} ms/batch",
              flush=True)

        tiles = ([fs.pick_tile(seg.ops, width, seg.halo)]
                 if args.tiles == "auto"
                 else [int(t) for t in args.tiles.split(",") if width % int(t) == 0])
        layouts = ["plain"] + (["packed2"] if fs.packed_ok(seg) else [])
        for layout in layouts:
            spl = fs.segment_params(seg, fparams, layout=layout)
            for tile in tiles:
                def make(tile, layout):
                    @jax.jit
                    def run_fused(x, *sp):
                        def body(acc, i):
                            y = fs.apply_segment(
                                seg, x + i.astype(x.dtype), list(sp),
                                width=width, tile=tile, layout=layout)
                            return acc + jnp.sum(y.astype(jnp.float32)), None
                        acc, _ = jax.lax.scan(
                            body, jnp.float32(0), jnp.arange(K, dtype=jnp.int32))
                        return acc
                    return run_fused

                try:
                    dt = diff_time(make(tile, layout), K, x, *spl)
                    print(f"  fused {layout:7s} tile={tile:3d}: "
                          f"{dt*1e3:7.3f} ms/batch", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"  fused {layout:7s} tile={tile:3d}: ERR "
                          f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
