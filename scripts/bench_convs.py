"""Per-shape conv microbenchmark on the real chip: bf16 vs int8 vs rewrites.

Timing protocol (critical on the axon tunnel): the synchronous round trip
costs ~45-55 ms with tens-of-ms jitter, but async dispatches pipeline. Every
number here is therefore differential AND amortized: each jitted call runs
the conv K times via lax.scan (K sized so one call is 30-60 ms of pure
compute), and we report median of ((T(m2 calls) - T(m1 calls))/(m2-m1))/K.
See PERF.md "Raw platform measurements".

Usage: python scripts/bench_convs.py [--variants bf16,int8] [--shapes early|all]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

# (in_hw, cin, cout, k, stride, count_in_net) — decision-critical subset first
# (remote compiles cost minutes per entry; full-net truth comes from in-network
# A/B anyway, this sweep only ranks candidate rewrites).
SHAPES = [
    # s2d phase-conv shapes (one of the 4 per rewritten early conv):
    (152, 128, 64, 2, 1, 0),   # 304^2 32->64 s1 rewrite
    (76, 256, 64, 2, 1, 0),    # 152^2 64->64 s1 rewrite
    (152, 256, 128, 2, 2, 0),  # 304^2 64->128 s2 rewrite
    (76, 512, 256, 2, 2, 0),   # 152^2 128->256 s2 rewrite
    # the originals those replace:
    (304, 32, 64, 3, 1, 1),
    (152, 64, 64, 3, 1, 2),
    (304, 64, 128, 3, 2, 1),
    (152, 128, 256, 3, 2, 1),
    # early 1x1s (lane-starved?) and their s2d grouped rewrites:
    (304, 64, 64, 1, 1, 3),
    (152, 128, 64, 1, 1, 2),
    # mid/late spot checks (int8 leverage lives here):
    (76, 128, 128, 3, 1, 8),
    (38, 256, 512, 3, 1, 5),
    (19, 512, 1024, 3, 1, 5),
    (38, 512, 256, 1, 1, 9),
]

EARLY = {608, 304, 152}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="bf16,int8")
    ap.add_argument("--shapes", default="all", choices=["early", "all"])
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    variants = args.variants.split(",")
    B = args.batch

    def diff_time(fn, k_scan, *a, m1=1, m2=3):
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
        return (run(m2) - run(m1)) / (m2 - m1) / k_scan

    def conv(x, w, stride, ptype):
        k = w.shape[0]
        pad = [(1, 0), (1, 0)] if k == 2 else [((k - 1) // 2,) * 2] * 2
        return jax.lax.conv_general_dilated(
            x, w, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=ptype)

    def pick_k(gf):
        # one call ~= 40 ms of compute assuming ~100 TFLOP/s
        c_est = gf * 1e9 / 100e12
        return int(np.clip(0.04 / max(c_est, 1e-6), 8, 512))

    def make(hw, cin, cout, k, s, dtype, ptype, eps):
        x0 = (np.random.randn(B, hw, hw, cin) * 0.3).astype(np.float32)
        if dtype == jnp.int8:
            x = jnp.asarray(np.random.randint(-64, 65, (B, hw, hw, cin)), jnp.int8)
            w = jnp.asarray(np.random.randint(-5, 6, (k, k, cin, cout)), jnp.int8)
        else:
            x = jnp.asarray(x0, dtype)
            w = jnp.asarray(np.random.randn(k, k, cin, cout) * 0.05, dtype)
        out = hw // s
        gf = B * out * out * k * k * cin * cout * 2 / 1e9
        K = pick_k(gf)

        @jax.jit
        def run(x, w):
            def body(acc, i):
                y = conv(x + i.astype(x.dtype), w, s, ptype)
                # Full-output reduction: XLA pushes a point slice through the
                # conv (computes ONE pixel) — a sum cannot be pushed down.
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0),
                                  jnp.arange(K, dtype=jnp.int32) * eps)
            return acc

        return run, (x, w), K, gf

    makers = {
        "bf16": lambda *s: make(*s, jnp.bfloat16, jnp.bfloat16, 1),
        "int8": lambda *s: make(*s, jnp.int8, jnp.int32, 1),
    }

    print(f"{'shape':>30} " + " ".join(f"{v:>16}" for v in variants), flush=True)
    for hw, cin, cout, k, s, n in SHAPES:
        if args.shapes == "early" and hw not in EARLY:
            continue
        cols = []
        for v in variants:
            try:
                fn, a, K, gf = makers[v](hw, cin, cout, k, s)
                dt = diff_time(fn, K, *a)
                cols.append(f"{dt*1e3:7.3f}ms {gf/dt/1e3:5.1f}T")
            except Exception as e:  # noqa: BLE001
                cols.append(f"ERR {type(e).__name__[:10]}")
        print(f"{hw:4d}^2 {cin:4d}->{cout:4d} k{k} s{s} x{n}: "
              + " ".join(f"{c:>16}" for c in cols), flush=True)


if __name__ == "__main__":
    sys.exit(main())
