"""Per-layer IN-NETWORK cost attribution via truncated-prefix timing.

The missing artifact behind three rounds of conv work (VERDICT r3 #1): the
flagship forward measures ~24.75 ms/batch against a 15.07 ms per-layer floor
(scripts/roofline.py), and every optimization so far was aimed by ISOLATED
conv benchmarks that did not survive in-network. This script produces the
in-network table: it jits truncated prefixes of the real network at the
bench-default serving config, times each with the PERF.md protocol
(async-chained dispatches + block_until_ready + a forced scalar read), and
differences consecutive prefixes — delta(K) is the in-network cost of layers
(prev, K], directly comparable to the same span's roofline floor.

Each prefix reduces EVERY live tensor (the executor's own liveness set,
network.apply(stop_after=...)) to one f32 scalar: XLA cannot DCE side
branches held for later routes, and the scalar read defeats the tunnel's
point-slice pushing. The reduction itself fuses into the producing epilogue,
and its cost difference between consecutive prefixes is bounded by the last
activation's bandwidth (~0.2 ms at 304^2) — fine for finding multi-ms
offenders; judge deltas, not absolutes.

--grad times jax.grad of the same truncated scalar instead (training config:
unfolded params, train=True BN, bf16, batch 8) — delta(K) is then the
fwd+bwd cost of the span; subtracting the forward table splits the backward.

Usage (on the real chip):
  python scripts/bench_prefix.py --layers stages          # ~30 boundaries
  python scripts/bench_prefix.py --layers convs --start 0 --end 30
  python scripts/bench_prefix.py --layers 3,7,12,55       # explicit
  python scripts/bench_prefix.py --grad --layers stages --batch 8
Output: a table on stdout + CSV (--csv PATH) for later analysis.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from roofline import compute_rows  # noqa: E402


def timed(fn, args, iters, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    v = float(np.asarray(out).ravel()[0])  # poisoned-buffer guard
    assert np.isfinite(v), f"non-finite prefix output {v}"
    return dt


def pick_layers(mode: str, spec, start: int, end: int):
    from complex_yolov4_tpu.models.spec import (ConvSpec, MaxPoolSpec,
                                                RouteSpec, UpsampleSpec,
                                                YoloSpec)

    n = len(spec.layers)
    end = n - 1 if end < 0 else min(end, n - 1)
    if mode == "all":
        return list(range(start, end + 1))
    if mode == "convs":
        return [i for i in range(start, end + 1)
                if isinstance(spec.layers[i], ConvSpec)]
    if mode == "stages":
        # Structural boundaries: stride-2 convs, multi-input routes (CSP /
        # SPP / PAN joins), upsamples, maxpools, heads — the places PERF.md
        # suspects layout transitions.
        ids = []
        for i in range(start, end + 1):
            l = spec.layers[i]
            if (isinstance(l, ConvSpec) and l.stride == 2) \
               or (isinstance(l, RouteSpec) and len(l.layers) > 1) \
               or isinstance(l, (UpsampleSpec, MaxPoolSpec, YoloSpec)):
                ids.append(i)
        if ids and ids[-1] != end:
            ids.append(end)
        return ids
    return sorted({int(x) for x in mode.split(",")})


def describe(spec, i, chans) -> str:
    from complex_yolov4_tpu.models.spec import (ConvSpec, MaxPoolSpec,
                                                RouteSpec, ShortcutSpec,
                                                UpsampleSpec, YoloSpec)

    l = spec.layers[i]
    if isinstance(l, ConvSpec):
        cin = chans[i - 1] if i > 0 else spec.in_channels
        return (f"conv{l.size}x{l.size}{'s2' if l.stride == 2 else ''} "
                f"{cin}->{l.filters}")
    if isinstance(l, RouteSpec):
        return f"route{'x' + str(len(l.layers)) if len(l.layers) > 1 else ''}"
    if isinstance(l, ShortcutSpec):
        return "shortcut"
    if isinstance(l, MaxPoolSpec):
        return f"maxpool{l.size}"
    if isinstance(l, UpsampleSpec):
        return "upsample"
    if isinstance(l, YoloSpec):
        return "yolo-head"
    return type(l).__name__


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", default="stages",
                    help="stages | convs | all | comma-separated indices")
    ap.add_argument("--start", type=int, default=0)
    ap.add_argument("--end", type=int, default=-1)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--quant", default="int8", choices=["int8", "none"])
    ap.add_argument("--grad", action="store_true",
                    help="time grad of the truncated scalar (training config)")
    ap.add_argument("--csv", default="")
    ap.add_argument("--model", default="complex_yolov4")
    ap.add_argument("--bpack", type=int, default=0,
                    help="batch_pack factor for the prefix (0 = off)")
    ap.add_argument("--img_size", type=int, default=0,
                    help="override input size (CPU smoke: 96)")
    args = ap.parse_args()

    import jax

    if os.environ.get("BENCH_PLATFORM"):  # CPU smoke: the axon sitecustomize
        jax.config.update("jax_platforms",  # pins JAX_PLATFORMS, so override
                          os.environ["BENCH_PLATFORM"])  # post-import
    import jax.numpy as jnp

    from complex_yolov4_tpu.data import bev as bev_mod
    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net

    batch = args.batch
    kw = ({"width": args.img_size, "height": args.img_size}
          if args.img_size else {})
    spec = get_model_spec(args.model, **kw)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))

    images = np.stack([
        bev_mod.make_bev_map(bev_mod.remove_points_outside(
            synthetic.sample_scene(np.random.default_rng(b))[0]))
        for b in range(batch)
    ])
    if images.shape[1] != spec.height:
        import cv2

        images = np.stack([cv2.resize(im, (spec.width, spec.height))
                           for im in images])

    if args.grad:
        run_spec, run_params, run_state, quant = spec, params, state, None
        compute_dtype = jnp.bfloat16
        mode_desc = f"grad, train=True, bf16, batch {batch}"
    else:
        run_spec = net.fold_spec(spec)
        run_params = net.fold_batchnorm(spec, params, state)
        run_state = {}
        quant = None
        if args.quant == "int8":
            from complex_yolov4_tpu.models import quantize as qz

            quant = qz.quantize_model(run_spec, run_params, [images[:2]])
        run_params = net.cast_conv_params(run_params)
        compute_dtype = jnp.bfloat16
        mode_desc = (f"forward, bf16, quant={args.quant}, batch {batch}, "
                     f"bpack={args.bpack} (bench-default serving config)")

    x = jnp.asarray(images)
    run_params = jax.device_put(run_params)

    chans = spec.out_channels()
    layer_ids = pick_layers(args.layers, spec, args.start, args.end)
    floors = {r[0]: r for r in compute_rows(net.fold_spec(spec), batch)}

    def scalar_of(live, heads):
        # heads are the decoded per-head (B, n, 10) arrays (f32)
        s = jnp.float32(0.0)
        for t in live:
            s = s + jnp.sum(t.astype(jnp.float32))
        for hd in heads:
            s = s + jnp.sum(hd.astype(jnp.float32))
        return s

    def make_prefix(k):
        if args.grad:
            def loss_fn(p, xx):
                live, heads = net.apply(run_spec, p, run_state, xx,
                                        train=True,
                                        compute_dtype=compute_dtype,
                                        stop_after=k)
                return scalar_of(live, heads)

            g = jax.jit(lambda p, xx: jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b).astype(jnp.float32)),
                jax.grad(loss_fn)(p, xx), jnp.float32(0.0)))
            return lambda: g(run_params, x)

        f = jax.jit(lambda p, q, xx: scalar_of(*net.apply(
            run_spec, p, run_state, xx, compute_dtype=compute_dtype,
            quant=q, stop_after=k, batch_pack=args.bpack or None)))
        return lambda: f(run_params, quant, x)

    print(f"# prefix attribution: {mode_desc}; {len(layer_ids)} boundaries",
          flush=True)
    rows_out = []
    prev_ms = 0.0
    prev_k = -1
    for k in layer_ids:
        fn = make_prefix(k)
        t0 = time.perf_counter()
        ms = timed(fn, (), args.iters) * 1e3
        compile_s = time.perf_counter() - t0 - args.iters * ms / 1e3
        delta = ms - prev_ms
        span_floor = sum(floors[i][6] for i in range(prev_k + 1, k + 1)
                         if i in floors) * 1e3
        desc = describe(spec, k, chans)
        print(f"[{k:3d}] {desc:26s} prefix {ms:7.3f} ms  "
              f"delta {delta:7.3f}  floor {span_floor:6.3f}  "
              f"x{delta / span_floor if span_floor > 1e-9 else float('nan'):5.2f}"
              f"  (compile {compile_s:.0f}s)", flush=True)
        rows_out.append((k, desc, ms, delta, span_floor))
        prev_ms, prev_k = ms, k

    if args.csv:
        with open(args.csv, "w") as f:
            f.write("layer,desc,prefix_ms,delta_ms,span_floor_ms\n")
            for r in rows_out:
                f.write(f"{r[0]},{r[1]},{r[2]:.4f},{r[3]:.4f},{r[4]:.4f}\n")
        print(f"csv -> {args.csv}")


if __name__ == "__main__":
    sys.exit(main())
