"""Per-shape conv microbenchmark on the real chip: bf16 vs int8 vs rewrites.

Timing protocol (critical on the axon tunnel): the synchronous round trip
costs ~50 ms regardless of work, but async dispatches pipeline. Every number
here is differential — time M2 async calls and M1 async calls of the same
jitted function (block + forced scalar read once per batch of calls) and
report (T2-T1)/(M2-M1). See PERF.md.

Usage: python scripts/bench_convs.py [--variants bf16,int8] [--shapes early|all]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

# (in_hw, cin, cout, k, stride, count_in_net, GF_per_frame_total)
SHAPES = [
    (608, 3, 32, 3, 1, 1),
    (608, 32, 64, 3, 2, 1),
    (304, 32, 64, 3, 1, 1),
    (304, 64, 64, 1, 1, 3),
    (304, 64, 128, 3, 2, 1),
    (152, 64, 64, 3, 1, 2),
    (152, 128, 64, 1, 1, 2),
    (152, 128, 256, 3, 2, 1),
    (76, 128, 128, 3, 1, 8),
    (76, 128, 256, 3, 1, 3),
    (76, 256, 128, 1, 1, 6),
    (38, 256, 256, 3, 1, 8),
    (38, 256, 512, 3, 1, 5),
    (38, 512, 256, 1, 1, 9),
    (19, 512, 512, 3, 1, 4),
    (19, 512, 1024, 3, 1, 5),
    (19, 1024, 512, 1, 1, 8),
]

EARLY = {608, 304, 152}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="bf16,int8")
    ap.add_argument("--shapes", default="all", choices=["early", "all"])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--inner", type=int, default=8, help="convs per jit call")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    variants = args.variants.split(",")
    B, K = args.batch, args.inner

    def diff_time(fn, *a, m1=2, m2=10):
        v = fn(*a)
        jax.block_until_ready(v)
        float(np.asarray(v).ravel()[0])  # forced read: catch poisoned buffers

        def run(m):
            t0 = time.perf_counter()
            for _ in range(m):
                v = fn(*a)
            jax.block_until_ready(v)
            float(np.asarray(v).ravel()[0])
            return time.perf_counter() - t0

        run(m1)  # extra warmup
        best = min((run(m2) - run(m1)) / (m2 - m1) for _ in range(3))
        return best / K

    def conv(x, w, stride, ptype):
        pad = (w.shape[0] - 1) // 2
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype)

    def make_bf16(hw, cin, cout, k, s):
        x = jnp.asarray(np.random.randn(B, hw, hw, cin) * 0.3, jnp.bfloat16)
        w = jnp.asarray(np.random.randn(k, k, cin, cout) * 0.05, jnp.bfloat16)

        @jax.jit
        def run(x, w):
            acc = jnp.float32(0)
            for i in range(K):
                y = conv(x + jnp.bfloat16(i * 1e-3), w, s, jnp.bfloat16)
                acc += y[0, 0, 0, 0].astype(jnp.float32)
            return acc

        return run, (x, w)

    def make_int8(hw, cin, cout, k, s):
        x = jnp.asarray(np.random.randint(-64, 65, (B, hw, hw, cin)), jnp.int8)
        w = jnp.asarray(np.random.randint(-5, 6, (k, k, cin, cout)), jnp.int8)

        @jax.jit
        def run(x, w):
            acc = jnp.int32(0)
            for i in range(K):
                y = conv(x + jnp.int8(i), w, s, jnp.int32)
                acc += y[0, 0, 0, 0]
            return acc

        return run, (x, w)

    makers = {"bf16": make_bf16, "int8": make_int8}

    print(f"{'shape':>30} " + " ".join(f"{v:>16}" for v in variants))
    for hw, cin, cout, k, s, n in SHAPES:
        if args.shapes == "early" and hw not in EARLY:
            continue
        out = hw // s
        gf = B * out * out * k * k * cin * cout * 2 / 1e9
        cols = []
        for v in variants:
            try:
                fn, a = makers[v](hw, cin, cout, k, s)
                dt = diff_time(fn, *a)
                cols.append(f"{dt*1e3:7.3f}ms {gf/dt/1e3:5.1f}T")
            except Exception as e:  # noqa: BLE001
                cols.append(f"ERR {type(e).__name__[:10]}")
        print(f"{hw:4d}^2 {cin:4d}->{cout:4d} k{k} s{s} x{n}: " + " ".join(f"{c:>16}" for c in cols), flush=True)


if __name__ == "__main__":
    sys.exit(main())
