"""Microbench: scatter dtype/op matrix for the BEV raster (axon protocol).

Last measured (PERF.md): f32 scatter-add 0.16 ms vs i32 scatter-add 4.0 ms and
i32 scatter-max 4.1 ms per batch-16 — a pure dtype effect. The packed raster
key is a non-negative int32 strictly below 0x7f800000 (inf), so its bitcast
to f32 is finite and monotone: f32 scatter-max over bitcast keys computes the
same argmax as i32 scatter-max. If f32 max rides the fast path, the raster's
two scatters cost ~0.3 ms instead of ~7.3.

Timing: scan-differential protocol (see memory/axon-timing-protocol) — R reps
inside one jit with varied input, differenced against 1 rep.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, GRID = 16, 20480, 609
NC = B * GRID * GRID


def timed(fn, reps_hi=32):
    def run(reps, x):
        def body(c, i):
            return fn(x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)), 0.0

        out, _ = jax.lax.scan(body, fn(x), jnp.arange(reps))
        return out

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (B, N)).astype(np.float32))
    r1 = jax.jit(run, static_argnums=0)
    _ = float(r1(1, x).ravel()[0]); _ = float(r1(reps_hi, x).ravel()[0])
    t0 = time.perf_counter()
    v = r1(1, x); assert np.isfinite(float(v.ravel()[0]))
    t1 = time.perf_counter()
    v = r1(reps_hi, x); assert np.isfinite(float(v.ravel()[0]))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps_hi - 1) * 1e3


def main():
    rng = np.random.default_rng(0)
    cells = jnp.asarray(rng.integers(0, NC, (B * N,), dtype=np.int64).astype(np.int32))

    def mk(op, dtype):
        def fn(x):
            vals = x.ravel().astype(dtype)
            tgt = jnp.zeros((NC + 1,), dtype)
            if op == "add":
                return tgt.at[cells].add(vals, mode="drop")
            return tgt.at[cells].max(vals, mode="drop")

        return fn

    for op in ("add", "max"):
        for dtype in (jnp.float32, jnp.int32):
            ms = timed(mk(op, dtype))
            print(f"scatter-{op} {jnp.dtype(dtype).name}: {ms:.3f} ms", flush=True)

    # bitcast-f32 packed-key max: key = (z_bits>>8<<8 | r8) viewed as f32
    def packed_f32(x):
        z = jnp.clip(x.ravel(), 0.0, 4.0)
        zb = jax.lax.bitcast_convert_type(z, jnp.int32)
        key = ((zb >> 8) << 8) | 37
        keyf = jax.lax.bitcast_convert_type(key, jnp.float32)
        tgt = jnp.full((NC + 1,), -1.0, jnp.float32)
        return tgt.at[cells].max(keyf, mode="drop")

    print(f"packed-key f32 max: {timed(packed_f32):.3f} ms", flush=True)


if __name__ == "__main__":
    main()
