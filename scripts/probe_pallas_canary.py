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

    # C4/C5: the stem kernel's one structural difference from the passing
    # canaries — an Element input block whose LANE dim is not a 128
    # multiple (610 = 608 + 2px halo). C5 is the lane-aligned control.
    def c45_kernel(x_ref, o_ref):
        o_ref[:, :] = x_ref[0, :, :128] + 1.0

    for name, wdt in (("C4 Element width 610 (stem-like)", 610),
                      ("C5 Element width 640 (aligned)", 640)):
        xw = jnp.asarray(np.zeros((2, 8, wdt), np.float32))
        run(name, pl.pallas_call(
            c45_kernel,
            grid=(2,),
            in_specs=[pl.BlockSpec(
                (pl.Element(1), pl.Element(8), pl.Element(wdt)),
                lambda i: (i, 0, 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32)), xw)

    # C6: aligned-width dress rehearsal of the real stem tile — Element
    # halo block, 9*C_in slab copies into a (64, r, 640) scratch, 3D-lhs
    # dot_general, 4D bf16 out. If this runs, the production kernel only
    # needs its input width padded to a lane multiple.
    c_in, r, wpad, c_out = 6, 38, 640, 64
    xs = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, c_in, r + 2, wpad)),
        jnp.float32)
    ws = jnp.asarray(
        np.random.default_rng(1).standard_normal((64, c_out)) * 0.05,
        jnp.bfloat16)

    wsub = wpad - 2  # 638 output columns (mirrors the real kernel's :w_in)

    def c6_kernel(x_ref, w_ref, o_ref, patches_ref):
        patches_ref[9 * c_in:, :, :] = jnp.zeros(
            (64 - 9 * c_in, r, wpad), jnp.float32)
        patches_ref[:, :, wsub:] = jnp.zeros((64, r, wpad - wsub), jnp.float32)
        for ky in range(3):
            for kx in range(3):
                for ci in range(c_in):
                    patches_ref[(ky * 3 + kx) * c_in + ci, :, :wsub] = (
                        x_ref[0, ci, ky:ky + r, kx:kx + wsub])
        acc = jax.lax.dot_general(
            patches_ref[:].astype(jnp.bfloat16), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[0] = acc[:, :wsub, :].astype(jnp.bfloat16)

    run("C6 stem dress-rehearsal (aligned)", pl.pallas_call(
        c6_kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((pl.Element(1), pl.Element(c_in), pl.Element(r + 2),
                          pl.Element(wpad)), lambda i: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, wsub, c_out), lambda i: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, r, wsub, c_out), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((64, r, wpad), jnp.float32)]), xs, ws)

    # C7 series: C6 passed, the real kernel fails — walk the remaining
    # differences one at a time on real conv0-packed dimensions.
    b_sz, h = 2, 608
    xf = jnp.asarray(
        np.random.default_rng(2).standard_normal(
            (b_sz, c_in, h + 2, wpad)) * 0.3, jnp.float32)
    bias2d = jnp.asarray(
        np.random.default_rng(3).standard_normal((1, c_out)) * 0.05,
        jnp.float32)

    def mk(with_when, with_bias, kern_name):
        def kern(*refs):
            if with_bias:
                x_ref, w_ref, b_ref, o_ref, patches_ref = refs
            else:
                x_ref, w_ref, o_ref, patches_ref = refs

            def zero():
                patches_ref[9 * c_in:, :, :] = jnp.zeros(
                    (64 - 9 * c_in, r, wpad), jnp.float32)
                patches_ref[:, :, wsub:] = jnp.zeros(
                    (64, r, wpad - wsub), jnp.float32)

            if with_when:
                pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))(zero)
            else:
                zero()
            for ky in range(3):
                for kx in range(3):
                    for ci in range(c_in):
                        patches_ref[(ky * 3 + kx) * c_in + ci, :, :wsub] = (
                            x_ref[0, ci, ky:ky + r, kx:kx + wsub])
            acc = jax.lax.dot_general(
                patches_ref[:].astype(jnp.bfloat16), w_ref[:],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if with_bias:
                acc = acc + b_ref[:]
            o_ref[0] = acc[:, :wsub, :].astype(jnp.bfloat16)

        in_specs = [
            pl.BlockSpec((pl.Element(1), pl.Element(c_in), pl.Element(r + 2),
                          pl.Element(wpad)), lambda b, i: (b, 0, i * r, 0)),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ]
        args = [xf, ws]
        if with_bias:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
            args.append(bias2d)
        run(kern_name, pl.pallas_call(
            kern,
            grid=(b_sz, h // r),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((1, r, wsub, c_out),
                                   lambda b, i: (b, i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b_sz, h, wsub, c_out),
                                           jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((64, r, wpad), jnp.float32)]), *args)

    mk(False, False, "C7a C6 + real grid/index maps")
    mk(True, False, "C7b C7a + pl.when one-time zero")
    mk(True, True, "C7c C7b + bias input (the full kernel)")


if __name__ == "__main__":
    sys.exit(main())
