"""Minimal Mosaic remote-compile canaries (round 5).

Round-4's stem-kernel crash was blamed on the sublane/lane-merging reshape;
the round-5 probe run falsified that: ALL probes including P0 (reshape-only,
no input taps) fail with the same instant `tpu_compile_helper subprocess
exit code 1` (HTTP 500). These canaries bisect from the absolute floor:

  C0  out = x + 1, plain (8, 128) blocks          — the simplest possible
      Mosaic kernel; if this fails, Pallas is categorically unavailable
      through the remote-compile service and every Pallas lever closes.
  C1  C0 + a VMEM scratch buffer
  C2  C0 with a pl.Element input BlockSpec (the stem kernel's halo pattern)
  C3  in-kernel dot_general (MXU path), plain blocks

Each prints OK/ERR and continues; total runtime seconds (failures are
instant HTTP 500s, successes compile 20-60 s).
"""

from __future__ import annotations

import sys

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(np.arange(8 * 128, dtype=np.float32).reshape(8, 128))
    w = jnp.ones((128, 128), jnp.float32)

    def run(name, fn, *args):
        try:
            out = jax.block_until_ready(fn(*args))
            v = float(np.asarray(out).ravel()[0])
            print(f"{name}: OK (out[0]={v:.2f})", flush=True)
            return True
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return False

    def c0_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[:, :] + 1.0

    run("C0 add1 plain-blocks", pl.pallas_call(
        c0_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)), x)

    def c1_kernel(x_ref, o_ref, scratch):
        scratch[:, :] = x_ref[:, :] + 1.0
        o_ref[:, :] = scratch[:, :]

    run("C1 add1 + VMEM scratch", pl.pallas_call(
        c1_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)]), x)

    def c2_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[0, :, :] + 1.0

    run("C2 add1 + Element in-spec", pl.pallas_call(
        c2_kernel,
        grid=(2,),
        in_specs=[pl.BlockSpec(
            (pl.Element(1), pl.Element(8), pl.Element(128)),
            lambda i: (i, 0, 0))],
        out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)),
        jnp.stack([x, x]))

    def c3_kernel(x_ref, w_ref, o_ref):
        o_ref[:, :] = jnp.dot(x_ref[:, :], w_ref[:, :],
                              preferred_element_type=jnp.float32)

    run("C3 in-kernel dot", pl.pallas_call(
        c3_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)), x, w)


if __name__ == "__main__":
    sys.exit(main())
