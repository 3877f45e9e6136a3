"""Mosaic crash bisect, wave 2 (see probe_stem_mosaic.py — ALL wave-1
probes crashed the remote compile helper in <1s, so the culprit is in their
shared structure, not the reshape/dot). Separates the remaining suspects:
  Q0  3D VMEM scratch alone (no inputs at all)
  Q1  plain (non-Element) blocked input + halo-free tap slab copies + scratch
  Q2  pl.Element overlapping input spec alone (no scratch, just a sum)
  Q3  Q1 with a 2-axis grid (grid structure control for Q0/Q1)
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b_sz, c_in = 2, 6
    r, w_pad = 38, 640
    k_pad = 64
    hp = 640  # probe-only padded H: 16 blocks of 40 rows, no overlap needed

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((b_sz, c_in, hp, w_pad)),
        jnp.float32)
    scalar_out = dict(
        out_specs=pl.BlockSpec((8, 128), lambda *_: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))
    scratch = [pltpu.VMEM((k_pad, r, w_pad), jnp.float32)]

    def q0(o_ref, patches_ref):
        patches_ref[:] = jnp.zeros((k_pad, r, w_pad), jnp.float32)
        o_ref[:, :] = jnp.full((8, 128), jnp.sum(patches_ref[:]), jnp.float32)

    def q1(x_ref, o_ref, patches_ref):
        for t in range(9):
            for ci in range(c_in):
                patches_ref[t * c_in + ci, :, :] = x_ref[0, ci, t:t + r, :]
        o_ref[:, :] = jnp.full((8, 128), jnp.sum(patches_ref[:]), jnp.float32)

    def q2(x_ref, o_ref):
        o_ref[:, :] = jnp.full((8, 128), jnp.sum(x_ref[:]), jnp.float32)

    def run(name, kern, **kwargs):
        try:
            f = pl.pallas_call(kern, **kwargs, **scalar_out)
            out = jax.block_until_ready(f(x) if kwargs.get("in_specs")
                                        else f())
            val = float(np.asarray(out).ravel()[0])
            print(f"{name}: OK (out[0]={val:.4f})", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    run("Q0 scratch-only", q0, grid=(2,), scratch_shapes=scratch)
    run("Q1 plain-input+taps", q1, grid=(b_sz, hp // r - 1),
        in_specs=[pl.BlockSpec((1, c_in, r + 2, w_pad),
                               lambda b, i: (b, 0, i, 0))],
        scratch_shapes=scratch)
    run("Q2 element-overlap-only", q2, grid=(b_sz, 16),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(c_in), pl.Element(r + 2),
             pl.Element(w_pad)),
            lambda b, i: (b, 0, i * r, 0))])


if __name__ == "__main__":
    sys.exit(main())
