"""Remote-Mosaic capability ladder (round 5) — the D1-D12 bisect behind the
stem-kernel closure (PERF.md "Round-5 stem Pallas kernel").

Findings on the axon remote compile service (each probe ~1 s to fail,
20-60 s to compile; run controls first — the service itself flip-flops):
  D1/D2  non-overlapping Element row blocks compile; OVERLAPPING halo
         windows (step r, size r+2) crash the helper (HTTP 500)
  D4     manual-DMA halo (pltpu.make_async_copy from an ANY-space ref)
         crashes identically
  D8/D9  with everything legal, compiles up to ~16 grid blocks / ~47 MB of
         output array; (2,12) blocks with identical per-block code fails
  D11    a full per-frame grid (1,16) compiles; lax.map over frames fails;
         8 unrolled per-frame calls in one jit compile
  D12    the compiled kernel executes ~650x slower than XLA's 9-tap conv
         (1941.9 ms vs 3.0 ms, batch-8 packed conv0) — Element-block DMA
         degenerating to per-element transfers is the consistent mechanism

Usage (real chip): python scripts/probe_pallas_limits.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def run(name, fn, *args):
        try:
            out = jax.block_until_ready(fn(*args))
            print(f"{name}: OK", flush=True)
            return out
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return None

    def mish(v):
        s = jnp.exp(jnp.minimum(v, 20.0))
        q = s * s + 2.0 * s
        return jnp.where(v > 20.0, v, v * q / (q + 2.0))

    c_in, c_out, wpad, w_in, r = 6, 64, 640, 608, 38

    def kern(x_ref, w_ref, b_ref, o_ref, patches_ref):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            patches_ref[9 * c_in:, :, :] = jnp.zeros(
                (64 - 9 * c_in, r, wpad), jnp.float32)
            patches_ref[:, :, w_in:] = jnp.zeros(
                (64, r, wpad - w_in), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                for ci in range(c_in):
                    patches_ref[(ky * 3 + kx) * c_in + ci, :, :w_in] = (
                        x_ref[0, ci, ky:ky + r, kx:kx + w_in])
        acc = mish(jax.lax.dot_general(
            patches_ref[:].astype(jnp.bfloat16), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b_ref[:])
        o_ref[0] = acc[:, :w_in, :].astype(jnp.bfloat16)

    def build(b_sz, n_t, overlap=False):
        # overlap=True replicates the crashing halo-window pattern (step r,
        # size r+2); overlap=False expects a pre-haloed input (step r+2).
        step = r if overlap else r + 2
        return pl.pallas_call(
            kern, grid=(b_sz, n_t),
            in_specs=[
                pl.BlockSpec(
                    (pl.Element(1), pl.Element(c_in), pl.Element(r + 2),
                     pl.Element(wpad)),
                    lambda b, i: (b, 0, i * step, 0)),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, r, w_in, c_out),
                                   lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b_sz, r * n_t, w_in, c_out),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((64, r, wpad), jnp.float32)])

    rng = np.random.default_rng(0)
    ws = jnp.asarray(rng.standard_normal((64, c_out)) * 0.05, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((1, c_out)) * 0.05, jnp.float32)

    def x_for(b_sz, n_t, overlap=False):
        rows = r * n_t + 2 if overlap else (r + 2) * n_t
        return jnp.asarray(
            rng.standard_normal((b_sz, c_in, rows, wpad)) * 0.1, jnp.float32)

    # controls + ladder
    run("D1 (1,4) pre-halo [control]", build(1, 4), x_for(1, 4), ws, b2)
    run("D2 (1,4) OVERLAP halo", build(1, 4, overlap=True),
        x_for(1, 4, overlap=True), ws, b2)
    for b_sz, n_t in ((2, 8), (2, 12), (1, 16), (8, 16)):
        run(f"D8 ({b_sz},{n_t}) blocks={b_sz*n_t} pre-halo",
            build(b_sz, n_t), x_for(b_sz, n_t), ws, b2)

    # D12: unrolled per-frame calls + steady-state timing vs XLA
    f1 = build(1, 16)
    x8 = jnp.asarray(rng.standard_normal((8, 1, c_in, (r + 2) * 16, wpad))
                     * 0.1, jnp.float32)

    @jax.jit
    def unrolled(x8, ws, b2):
        return jnp.concatenate([f1(x8[i], ws, b2) for i in range(8)], axis=0)

    out = run("D12 unrolled 8 per-frame calls", unrolled, x8, ws, b2)
    if out is not None:
        K = 10
        t0 = time.perf_counter()
        for _ in range(K):
            out = unrolled(x8, ws, b2)
        jax.block_until_ready(out)
        float(np.asarray(out).ravel()[0])
        print(f"D12 timing: {(time.perf_counter()-t0)/K*1e3:.1f} ms per "
              "batch-8 conv0 (XLA 9-tap: ~3.0 ms)", flush=True)


if __name__ == "__main__":
    sys.exit(main())
