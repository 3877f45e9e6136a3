"""Pallas fused 3x3 convolution for small-channel, high-resolution layers.

Why: profiling the complex_yolov4 forward on v5e shows XLA's conv kernels
running at ~5-20 TFLOP/s on the early backbone stages (608^2..152^2 with
32-128 channels) while the late stages hit >100 TFLOP/s — the early layers
are 38% of the FLOPs but ~77% of the runtime. This kernel reformulates those
convs as one explicit im2col matmul per output row-tile: contraction depth
9*C_in (288..1152) keeps the MXU fed, and the halo windows stream through
VMEM via `pl.Element` overlapping blocks with automatic pipelining.

Scope: kernel 3x3, stride 1 or 2, SAME padding, NHWC/HWIO, bias + activation
fused, inference only (the training path keeps XLA convs and autodiff).
Falls back to XLA outside the supported envelope (see `supported`).

STATUS: numerically correct (tests/test_pallas_conv.py) but DISABLED by
default (`ENABLED = False`): measured on v5e, the Mosaic lowering of the
halo-slice stores runs lane-starved with the small channel count in the
minor dimension, leaving the kernel ~8x slower than XLA's conv for now.
Next iteration needs a channels>=128-in-lanes data layout (w_out in lanes,
channels x taps in sublanes) — tracked for the next optimization round.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x):
    # Single-transcendental mish (see models.network._act).
    s = jnp.exp(jnp.minimum(x, 20.0))
    q = s * s + 2.0 * s
    return jnp.where(x > 20.0, x, x * q / (q + 2.0))


_ACTS = {
    "mish": _mish,
    "leaky": lambda x: jax.nn.leaky_relu(x, 0.1),
    "relu": jax.nn.relu,
    "linear": lambda x: x,
}


# bf16 bytes for the im2col tile. Mosaic spills every live vector temporary
# to the VMEM stack, so the working set is several times the patch tile;
# ~1.5 MB keeps the whole kernel inside the 16 MB scoped budget.
_VMEM_PATCH_BUDGET = 3 * 1024 * 1024


def pick_tile_h(h_out: int, w_out: int, c_in: int) -> Optional[int]:
    """Largest row-tile in {32, 16, 8, 4} that divides h_out and fits the
    im2col tile in the VMEM budget; None if none does."""
    for tile_h in (32, 16, 8, 4):
        if h_out % tile_h:
            continue
        if tile_h * w_out * 9 * c_in * 2 <= _VMEM_PATCH_BUDGET:
            return tile_h
    return None


# Opt-in switch for the executor (see module docstring STATUS).
ENABLED = False


def shape_ok(h: int, w: int, c_in: int, c_out: int, size: int, stride: int) -> bool:
    """Shape envelope this kernel can compile for (independent of ENABLED)."""
    if size != 3 or stride not in (1, 2):
        return False
    h_out, w_out = h // stride, w // stride
    if w % stride or h % stride:
        return False
    # Lane-starved region: small channel counts at high resolution. Beyond
    # 128 output channels XLA's conv is already near roofline.
    if c_in > 128 or c_out > 128 or w_out < 128:
        return False
    return pick_tile_h(h_out, w_out, c_in) is not None


def supported(h: int, w: int, c_in: int, c_out: int, size: int, stride: int) -> bool:
    """Envelope where the executor should route a conv through this kernel."""
    return ENABLED and shape_ok(h, w, c_in, c_out, size, stride)


@functools.partial(
    jax.jit,
    static_argnames=("stride", "activation", "interpret"))
def conv3x3_fused(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    stride: int = 1,
    activation: str = "leaky",
    interpret: bool = False,
) -> jnp.ndarray:
    """y = act(conv3x3_SAME(x, w) + bias), bf16 in/out, f32 accumulate.

    Args:
      x: (B, H, W, C_in). w: (3, 3, C_in, C_out) HWIO. bias: (C_out,).
    Returns (B, H/stride, W/stride, C_out) in x.dtype.
    """
    b_sz, h, w_in, c_in = x.shape
    c_out = w.shape[-1]
    h_out, w_out = h // stride, w_in // stride
    assert shape_ok(h, w_in, c_in, c_out, 3, stride), (
        f"unsupported conv3x3 shape {x.shape} -> {c_out} s{stride}")
    tile_h = pick_tile_h(h_out, w_out, c_in)

    # SAME padding (1 px) + 1 extra row/col so every Element window and every
    # even-length stride-2 reshape stays in bounds.
    xp = jnp.pad(x, ((0, 0), (1, 1 + 1), (1, 1 + 1), (0, 0)))
    win_h = tile_h * stride + 2
    win_w = w_in + 2  # holds taps kx + stride*j for all kx in 0..2

    w2d = w.reshape(9 * c_in, c_out).astype(jnp.bfloat16)
    bias2d = bias.reshape(1, c_out).astype(jnp.float32)
    act = _ACTS[activation]

    def kernel(x_ref, w_ref, b_ref, o_ref, patches_ref):
        # Each tap is read straight from the windowed input ref (keeps the
        # live vector set to one tap) and staged through the VMEM scratch:
        # stores normalize the offset layouts of the halo slices (Mosaic
        # cannot concat them directly) and the staged buffer reshapes
        # cleanly for the MXU.
        for ky in range(3):
            for kx in range(3):
                if stride == 1:
                    t = x_ref[0, ky:ky + tile_h, kx:kx + w_out, :]
                else:
                    rows = x_ref[0, ky:ky + 2 * tile_h, :, :]
                    rows = rows.reshape(tile_h, 2, rows.shape[1], c_in)[:, 0]
                    cols = rows[:, kx:kx + 2 * w_out]
                    t = cols.reshape(tile_h, w_out, 2, c_in)[:, :, 0]
                tap = 3 * ky + kx
                patches_ref[:, :, tap * c_in:(tap + 1) * c_in] = t.astype(jnp.bfloat16)
        patches = patches_ref[:].reshape(tile_h * w_out, 9 * c_in)
        acc = jnp.dot(patches, w_ref[:], preferred_element_type=jnp.float32)
        y = act(acc + b_ref[:])
        o_ref[0] = y.reshape(tile_h, w_out, c_out).astype(o_ref.dtype)

    grid = (b_sz, h_out // tile_h)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # Mosaic requires all-or-none Element dims.
            pl.BlockSpec(
                (pl.Element(1), pl.Element(win_h), pl.Element(win_w + 1),
                 pl.Element(c_in)),
                lambda b, i: (b, i * tile_h * stride, 0, 0),
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_h, w_out, c_out), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_sz, h_out, w_out, c_out), x.dtype),
        scratch_shapes=[pltpu.VMEM((tile_h, w_out, 9 * c_in), jnp.bfloat16)],
        interpret=interpret,
    )(xp, w2d, bias2d)
