"""Bisect the remote Mosaic compiler crash in ops/stem_conv.py (round 4).

The full kernel dies with an opaque `tpu_compile_helper subprocess exit
code 1` (no HLO retrievable through the tunnel). Suspects, probed one at a
time (every probe uses a legal (8,128) scalar-tile or 4D out block):
  P0  scratch zero + reshape + lane-slice sum   (reshape alone, no input)
  P1  Element-overlap input + 54 halo slab copies (taps alone)
  P2  P1 + the scratch reshape (k_pad, r, w_pad) -> (k_pad, r*w_pad),
      which merges sublane and lane dims (a relayout)
  P4  taps + 3D-lhs dot_general contracting dim0 (NO reshapes) -> 4D out
The first failing probe localizes the crash; P4 is also the candidate fix
if the reshapes are the problem and Mosaic accepts the 3D contraction.
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_sz, c_in, h, w_in = 2, 6, 608, 608
    r = 38
    k = 9 * c_in
    k_pad = 64
    w_pad = 640
    c_out = 64

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b_sz, c_in, h + 2, w_in + 2)),
        jnp.float32)
    w2d = jnp.asarray(
        np.random.default_rng(1).standard_normal((k_pad, c_out)) * 0.05,
        jnp.bfloat16)

    in_spec = pl.BlockSpec(
        (pl.Element(1), pl.Element(c_in), pl.Element(r + 2),
         pl.Element(w_in + 2)),
        lambda b, i: (b, 0, i * r, 0))
    scalar_out = dict(
        out_specs=pl.BlockSpec((8, 128), lambda b, i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    scratch = [pltpu.VMEM((k_pad, r, w_pad), jnp.float32)]

    def taps(x_ref, patches_ref):
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            patches_ref[k:, :, :] = jnp.zeros((k_pad - k, r, w_pad),
                                              jnp.float32)
            patches_ref[:, :, w_in:] = jnp.zeros((k_pad, r, w_pad - w_in),
                                                 jnp.float32)
        for ky in range(3):
            for kx in range(3):
                for ci in range(c_in):
                    patches_ref[(ky * 3 + kx) * c_in + ci, :, :w_in] = (
                        x_ref[0, ci, ky:ky + r, kx:kx + w_in])

    def p0(x_ref, o_ref, patches_ref):
        patches_ref[:] = jnp.zeros((k_pad, r, w_pad), jnp.float32)
        flat = patches_ref[:].reshape(k_pad, r * w_pad)
        s = jnp.sum(flat[:, : r * w_in])  # slice in merged-lane coordinates
        o_ref[:, :] = jnp.full((8, 128), s, jnp.float32)

    def p1(x_ref, o_ref, patches_ref):
        taps(x_ref, patches_ref)
        s = jnp.sum(patches_ref[:])
        o_ref[:, :] = jnp.full((8, 128), s, jnp.float32)

    def p2(x_ref, o_ref, patches_ref):
        taps(x_ref, patches_ref)
        flat = patches_ref[:].reshape(k_pad, r * w_pad)
        s = jnp.sum(flat[:, : r * w_in])
        o_ref[:, :] = jnp.full((8, 128), s, jnp.float32)

    def p4(x_ref, w_ref, o_ref, patches_ref):
        taps(x_ref, patches_ref)
        acc = jax.lax.dot_general(
            patches_ref[:].astype(jnp.bfloat16), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # (r, w_pad, c_out)
        o_ref[0] = acc[:, :w_in, :].astype(jnp.bfloat16)

    def run(name, kern, with_w, out4d):
        kwargs = dict(
            grid=(b_sz, h // r),
            in_specs=[in_spec] + (
                [pl.BlockSpec(memory_space=pltpu.VMEM)] if with_w else []),
            scratch_shapes=scratch)
        if out4d:
            kwargs.update(
                out_specs=pl.BlockSpec((1, r, w_in, c_out),
                                       lambda b, i: (b, i, 0, 0)),
                out_shape=jax.ShapeDtypeStruct((b_sz, h, w_in, c_out),
                                               jnp.bfloat16))
        else:
            kwargs.update(**scalar_out)
        try:
            f = pl.pallas_call(kern, **kwargs)
            out = jax.block_until_ready(f(x, w2d) if with_w else f(x))
            val = float(np.asarray(out).ravel()[0])
            print(f"{name}: OK (out[0]={val:.4f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    run("P0 reshape-only", p0, False, False)
    run("P1 taps-only", p1, False, False)
    run("P2 taps+reshape", p2, False, False)
    run("P4 taps+3d-dot (no reshape)", p4, True, True)


if __name__ == "__main__":
    sys.exit(main())
