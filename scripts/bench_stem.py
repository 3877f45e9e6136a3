"""Isolated on-chip A/B: XLA conv0 (+mish epilogue) vs the Pallas stem
kernel (ops/stem_conv.py), at the real conv0 shapes (packed and unpacked).

Scan-differential timing per PERF.md "Timing through the axon tunnel": each
jitted call runs the op K times via lax.scan with a full-output reduction
(a point slice would be pushed through the conv), numbers are
(T(m2)-T(m1))/(m2-m1)/K with a forced scalar read after block_until_ready.

The stem-kernel arm INCLUDES its XLA transpose+pad prologue — that cost is
part of the path and must not be benched away. Variants:
  xla   — bf16 conv + bias + mish (the shipped path)
  stem  — transpose/pad + Pallas patches kernel (bias + mish fused)
Usage: python scripts/bench_stem.py [--shapes packed,unpacked] [--tiles 16,32]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="packed,unpacked")
    ap.add_argument("--tiles", default="16,32")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from complex_yolov4_tpu.ops import stem_conv

    # (label, B, C_in, C_out): conv0 of the flagship at batch 16.
    SHAPES = {
        "packed": ("conv0 bpack=2 (8,608,608,6)->64", 8, 6, 64),
        "unpacked": ("conv0 plain (16,608,608,3)->32", 16, 3, 32),
    }
    HW = 608

    def diff_time(fn, k_scan, *a, m1=1, m2=3):
        v = fn(*a)
        jax.block_until_ready(v)
        float(np.asarray(v).ravel()[0])  # forced read: catch poisoned buffers

        def run(m):
            t0 = time.perf_counter()
            for _ in range(m):
                out = fn(*a)
            jax.block_until_ready(out)
            float(np.asarray(out).ravel()[0])
            return time.perf_counter() - t0

        run(m1)
        return (run(m2) - run(m1)) / (m2 - m1) / k_scan

    def mish(x):
        s = jnp.exp(jnp.minimum(x, 20.0))
        q = s * s + 2.0 * s
        return jnp.where(x > 20.0, x, x * q / (q + 2.0))

    for name in args.shapes.split(","):
        label, b, cin, cout = SHAPES[name]
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, HW, HW, cin)) * 0.3,
                        jnp.float32)
        w = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05,
                        jnp.float32)
        bias = jnp.asarray(rng.standard_normal(cout) * 0.05, jnp.float32)
        K = 8  # ~40 ms/call at the measured ~5 ms/op

        @jax.jit
        def run_xla(x, w, bias):
            wb = w.astype(jnp.bfloat16)

            def body(acc, i):
                y = jax.lax.conv_general_dilated(
                    (x + i).astype(jnp.bfloat16), wb, (1, 1),
                    [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.bfloat16)
                y = mish(y + bias.astype(jnp.bfloat16))
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                jnp.arange(K, dtype=jnp.float32) * 1e-3)
            return acc

        @jax.jit
        def run_im2col(x, w, bias):
            # Same one-MXU-pass thesis as the Pallas kernel, expressed in
            # pure XLA: 9 shifted slices concatenated channel-wise (im2col)
            # feeding a single K=9*C_in matmul. XLA owns the layout; if the
            # concat fuses into the dot there is no patch materialization.
            wb = w.reshape(9 * cin, cout).astype(jnp.bfloat16)
            bb = bias.astype(jnp.bfloat16)

            def body(acc, i):
                xb = (x + i).astype(jnp.bfloat16)
                xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
                pats = jnp.concatenate(
                    [xp[:, dy:dy + HW, dx:dx + HW, :]
                     for dy in range(3) for dx in range(3)], axis=-1)
                y = jax.lax.dot_general(
                    pats.reshape(-1, 9 * cin), wb,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                ).reshape(b, HW, HW, cout)
                y = mish(y + bb)
                return acc + jnp.sum(y.astype(jnp.float32)), None

            acc, _ = jax.lax.scan(
                body, jnp.float32(0),
                jnp.arange(K, dtype=jnp.float32) * 1e-3)
            return acc

        def make_stem(tile_h):
            @jax.jit
            def run_stem(x, w, bias):
                def body(acc, i):
                    y = stem_conv.conv3x3_stem(x + i, w, bias,
                                               activation="mish",
                                               tile_h=tile_h)
                    return acc + jnp.sum(y.astype(jnp.float32)), None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0),
                    jnp.arange(K, dtype=jnp.float32) * 1e-3)
                return acc

            return run_stem

        gf = b * HW * HW * 9 * cin * cout * 2 / 1e9
        dt = diff_time(run_xla, K, x, w, bias)
        print(f"{label}: xla {dt*1e3:7.3f} ms ({gf/dt/1e3:5.1f} T)",
              flush=True)
        try:
            dt = diff_time(run_im2col, K, x, w, bias)
            print(f"{label}: im2col {dt*1e3:7.3f} ms ({gf/dt/1e3:5.1f} T)",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label}: im2col ERR {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        for tile in args.tiles.split(","):
            try:
                dt = diff_time(make_stem(int(tile)), K, x, w, bias)
                print(f"{label}: stem r={tile:>2} {dt*1e3:7.3f} ms "
                      f"({gf/dt/1e3:5.1f} T)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{label}: stem r={tile} ERR {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    sys.exit(main())
