"""Stem-conv (layer 0/1) lowering variants, isolated, on the real chip.

The round-4 attribution table (scripts/bench_prefix.py, PERF.md) localized
the conv gap to the first layers: conv0 (3x3, 3->32 @608) runs at 5.69
ms/batch-16 in-network against a 0.51 ms bandwidth floor (11x, 1.8 TFLOP/s),
conv1 (3x3 s2, 32->64) at 3.17 vs 0.69. XLA:TPU's conv kernels collapse at
tiny channel counts. This times drop-in lowerings of those exact layers so
the e2e fix is aimed by measurement:

  conv0-base        XLA conv, f32 input (what the network runs today)
  conv0-bf16in      XLA conv, pre-cast bf16 input (isolates the convert)
  conv0-pad8/16     input channel-padded with zero weight rows
  conv0-dot         im2col patches (9 shifted slices) + (27, 32) matmul
  conv0-s2d         s2d(2) input -> phase-variant conv -> s2d output
  conv01-base       conv0 + mish + conv1(s2) chain as the network runs it
  conv01-s2d        both layers in the s2d domain (entry s2d included),
                    exiting at natural (304, 304, 64) layout
  conv01-s2d-pre    same but entry s2d EXCLUDED (what a raster that emits
                    phase-major layout directly would see)

Timing: PERF.md protocol (async chain + block + forced read).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np


def timed(fn, args, reps_hi=12):
    """Scan-differential (axon timing memory): fn's FIRST positional arg is
    the input tensor, varied per rep INSIDE one jit so identical-dispatch
    caching cannot lie; dispatch overhead cancels in the rep difference."""
    import jax
    import jax.numpy as jnp

    x, *rest = args

    def run(reps, x):
        def body(c, i):
            return fn(x + i.astype(x.dtype) * 1e-6, *rest), 0.0

        out, _ = jax.lax.scan(body, fn(x, *rest), jnp.arange(reps))
        return out

    r1 = jax.jit(run, static_argnums=0)
    for reps in (1, reps_hi):  # compile both
        v = float(np.asarray(r1(reps, x)).ravel()[0])
        assert np.isfinite(v), v
    t0 = time.perf_counter()
    v1 = r1(1, x)
    assert np.isfinite(float(np.asarray(v1).ravel()[0]))
    t1 = time.perf_counter()
    v2 = r1(reps_hi, x)
    assert np.isfinite(float(np.asarray(v2).ravel()[0]))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps_hi - 1)


def main() -> None:
    import jax

    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])
    import jax.numpy as jnp

    from complex_yolov4_tpu.data import bev as bev_mod
    from complex_yolov4_tpu.data import synthetic
    from complex_yolov4_tpu.models import s2d as s2d_mod

    batch = int(os.environ.get("BENCH_BATCH", "16"))
    iters = int(os.environ.get("BENCH_ITERS", "30"))
    rng = jax.random.PRNGKey(0)
    images = np.stack([
        bev_mod.make_bev_map(bev_mod.remove_points_outside(
            synthetic.sample_scene(np.random.default_rng(b))[0]))
        for b in range(batch)
    ])
    x = jnp.asarray(images)  # (B, 608, 608, 3) f32
    w0 = jax.random.normal(rng, (3, 3, 3, 32), jnp.float32) * 0.1
    b0 = jnp.zeros((32,), jnp.float32)
    w1 = jax.random.normal(rng, (3, 3, 32, 64), jnp.float32) * 0.05
    b1 = jnp.zeros((64,), jnp.float32)

    def mish(v):
        s = jnp.exp(jnp.minimum(v, 20.0))
        q = s * s + 2.0 * s
        return jnp.where(v > 20.0, v, v * q / (q + 2.0))

    def conv(v, w, stride=1):
        return jax.lax.conv_general_dilated(
            v.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
            window_strides=(stride, stride), padding=[(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.bfloat16)

    def epi(v, b):
        return mish(v + b.astype(v.dtype)).astype(jnp.bfloat16)

    results = {}

    @jax.jit
    def conv0_base(x, w, b):
        return jnp.sum(epi(conv(x, w), b).astype(jnp.float32))

    results["conv0-base"] = timed(conv0_base, (x, w0, b0), iters)

    xb = x.astype(jnp.bfloat16)
    results["conv0-bf16in"] = timed(conv0_base, (xb, w0, b0), iters)

    for pad_c in (8, 16):
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c - 3)))
        wp = jnp.pad(w0, ((0, 0), (0, 0), (0, pad_c - 3), (0, 0)))
        results[f"conv0-pad{pad_c}"] = timed(conv0_base, (xp, wp, b0), iters)

    @jax.jit
    def conv0_dot(x, w, b):
        xb = x.astype(jnp.bfloat16)
        xp = jnp.pad(xb, ((0, 0), (1, 1), (1, 1), (0, 0)))
        n, h = x.shape[0], x.shape[1]
        taps = [xp[:, dy:dy + h, dx:dx + h, :]
                for dy in range(3) for dx in range(3)]
        patches = jnp.concatenate(taps, axis=-1)  # (B, H, W, 27)
        y = jax.lax.dot_general(
            patches.reshape(-1, 27), w.reshape(27, -1).astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16).reshape(n, h, h, -1)
        return jnp.sum(epi(y, b).astype(jnp.float32))

    results["conv0-dot"] = timed(conv0_dot, (x, w0, b0), iters)

    @jax.jit
    def conv0_s2d(x, w, b):
        g = s2d_mod.s2d(x.astype(jnp.bfloat16))
        y = s2d_mod.conv3x3_s2d(g, w, 1, jnp.bfloat16, "phase")
        y = mish(y + jnp.tile(b, 4).astype(y.dtype))
        return jnp.sum(y.astype(jnp.float32))

    results["conv0-s2d"] = timed(conv0_s2d, (x, w0, b0), iters)

    @jax.jit
    def conv01_base(x, w0, b0, w1, b1):
        h = epi(conv(x, w0), b0)
        h = epi(conv(h, w1, 2), b1)
        return jnp.sum(h.astype(jnp.float32))

    results["conv01-base"] = timed(conv01_base, (x, w0, b0, w1, b1), iters)

    def _conv01_s2d_body(g, w0, b0, w1, b1):
        y = s2d_mod.conv3x3_s2d(g, w0, 1, jnp.bfloat16, "phase")
        y = mish(y + jnp.tile(b0, 4).astype(y.dtype))
        z = s2d_mod.conv3x3_s2d(y.astype(jnp.bfloat16), w1, 2, jnp.bfloat16,
                                "phase")
        z = mish(z + jnp.tile(b1, 4).astype(z.dtype))
        return jnp.sum(s2d_mod.d2s(z).astype(jnp.float32))

    @jax.jit
    def conv01_s2d(x, w0, b0, w1, b1):
        return _conv01_s2d_body(s2d_mod.s2d(x.astype(jnp.bfloat16)),
                                w0, b0, w1, b1)

    results["conv01-s2d"] = timed(conv01_s2d, (x, w0, b0, w1, b1), iters)

    g_pre = jax.jit(lambda x: s2d_mod.s2d(x.astype(jnp.bfloat16)))(x)
    conv01_s2d_pre = jax.jit(_conv01_s2d_body)
    results["conv01-s2d-pre"] = timed(conv01_s2d_pre,
                                      (g_pre, w0, b0, w1, b1), iters)

    def conv0_f32(x, w, b):
        y = jax.lax.conv_general_dilated(
            x.astype(jnp.float32), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return jnp.sum(mish(y + b))

    results["conv0-f32"] = timed(conv0_f32, (x, w0, b0), iters)

    from complex_yolov4_tpu.ops import pallas_conv

    on_tpu = jax.default_backend() in ("tpu", "axon")

    def conv0_pallas(x, w, b):
        y = pallas_conv.conv3x3_fused(x.astype(jnp.bfloat16), w, b,
                                      stride=1, activation="mish")
        return jnp.sum(y.astype(jnp.float32))

    if on_tpu and pallas_conv.shape_ok(608, 608, 3, 32, 3, 1):
        results["conv0-pallas"] = timed(conv0_pallas, (x, w0, b0), iters)

    def conv1_pallas(h, w, b):
        y = pallas_conv.conv3x3_fused(h, w, b, stride=2, activation="mish")
        return jnp.sum(y.astype(jnp.float32))

    h1 = jax.jit(lambda x: epi(conv(x, w0), b0))(x)  # (B, 608, 608, 32) bf16
    if on_tpu and pallas_conv.shape_ok(608, 608, 32, 64, 3, 2):
        results["conv1-pallas"] = timed(conv1_pallas, (h1, w1, b1), iters)

    def conv1_base(h, w, b):
        return jnp.sum(epi(conv(h, w, 2), b).astype(jnp.float32))

    results["conv1-base"] = timed(conv1_base, (h1, w1, b1), iters)

    print(f"batch {batch}, 608^2, bf16 compute; ms/batch")
    for k, v in results.items():
        print(f"  {k:16s} {v * 1e3:7.3f} ms")


if __name__ == "__main__":
    sys.exit(main())
