"""Pallas stem convolution: 3x3 stride-1 conv for tiny input channel counts.

Why (round-4 per-layer attribution, PERF.md): XLA:TPU lowers a 3x3 conv as 9
per-tap matmuls whose contraction dim is padded to the 128-lane MXU tile.
For conv0 (C_in=3, or 6/12 batch-packed) that is 9 MXU passes over
M = B*H*W rows with ~95% of every pass wasted on K-padding — measured
5.69 ms unpacked / 4.95 ms packed against a ~0.5 ms single-pass floor; it is
the single worst layer in the network and batch packing barely moves it
because the tap-pass count stays 9. The whole 9-tap contraction is only
K = 9*C_in <= 126 lanes deep, so ONE MXU pass over an im2col patch matrix
does the same math 9x cheaper.

The previous attempt (ops/pallas_conv.py) staged patches K-minor — (M, 9C)
with 9C in lanes — and measured ~8x SLOWER than XLA: every tap store used
C_in/128 of each vector register. Its docstring prescribes the fix this
kernel implements: keep W in lanes and K = taps*C in SUBLANES. Patch
formation is then 9*C_in full-occupancy (R, W) slab copies per row tile
(plain static slices of a width-padded input block — no lane concat, no
roll, no edge masks: SAME-padding zeros come in with the slices), and the
single MXU pass contracts the sublane dim:

    out (R*Wp, C_out) = dot(scratch (K_pad, R*Wp)^T, w2d (K_pad, C_out))

with the transposed-lhs contraction done natively by the MXU
(dimension_numbers ((0,), (0,))). Bias + activation fuse into the epilogue,
output lands NHWC directly.

Input must be channels-second ("NCHW", padded +1 px per side and width
right-padded to a lane multiple): the caller transposes once in XLA —
equivalently this kernel PICKS the early layout, the way the reference picks
NCHW for cuDNN (reference src/models/darknet2pytorch.py:162).

Scope: kernel 3x3, stride 1, SAME padding, C_in <= 14 (K = 9*C_in fits one
MXU K-tile), bias + activation fused, inference only. Unpacked (C_in=3) and
batch-packed (C_in = 3p) conv0 both qualify; everything else keeps XLA convs.

STATUS (round 5): CLOSED BY MEASUREMENT — keep default OFF (STEM_PALLAS=1
is interpret/A-B only). The full bisect finally ran on a healthy compile
service (scripts/probe_pallas_canary.py C0-C7 + D1-D12, PERF.md r5):
the r4 crash decomposed into (a) a flip-flopping remote compile service,
(b) overlapping Element halo windows and manual-DMA halo loads both crash
Mosaic (fixed here: XLA-materialized halo -> non-overlapping blocks),
(c) Element lane dims must be 128-aligned (fixed: width-padded blocks),
(d) a compile-size boundary near ~47 MB of output array (a per-frame
grid compiles; the full batch needs unrolled per-frame calls). With all
of that fixed the kernel COMPILES AND RUNS — **650x slower than XLA's
9-tap conv** (1941.9 ms vs 3.0 ms, batch-8 packed conv0, steady state),
consistent with Element-block DMA degenerating to per-element transfers.
The reshape-free 3D-lhs dot_general formulation and interpret-mode
correctness (tests/test_stem_conv.py, 6 tests) stand; conv0's gap to its
physics floor stays unreachable on this toolchain (XLA im2col 3.4x slower
r4; this kernel 650x slower r5; XLA's own lowering at 93% of its padded
speed of light).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mish(x):
    # Single-transcendental mish (matches models.network._act).
    s = jnp.exp(jnp.minimum(x, 20.0))
    q = s * s + 2.0 * s
    return jnp.where(x > 20.0, x, x * q / (q + 2.0))


_ACTS = {
    "mish": _mish,
    "leaky": lambda x: jax.nn.leaky_relu(x, 0.1),
    "relu": jax.nn.relu,
    "linear": lambda x: x,
}


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def supported(h: int, w: int, c_in: int, c_out: int,
              size: int, stride: int, activation: str) -> bool:
    """Shape envelope this kernel accepts."""
    return (size == 3 and stride == 1 and c_in <= 14 and c_out % 8 == 0
            and activation in _ACTS and h % 8 == 0 and w >= 128
            and _pick_tile_h(h) is not None)


def _pick_tile_h(h: int):
    """Row tile r for the halo'd input block (r+2 rows tall).

    Mosaic requires the block's last-two dims be (8, 128)-divisible OR equal
    to the array dims. The width block is always the full padded width
    (equal → legal); the row block r+2 must be 8-divisible — r=38 is the
    one divisor of 608 that qualifies (40 rows, grid 16). Small inputs take
    one full-height block (rows == array rows → equal → legal)."""
    for r in (38, 30, 22, 14, 6):
        if h % r == 0:
            return r
    if h <= 64:  # full-height block: scratch stays small
        return h
    return None


@functools.partial(
    jax.jit, static_argnames=("activation", "interpret", "tile_h"))
def conv3x3_stem(
    x: jnp.ndarray,
    w: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    activation: str = "mish",
    interpret: bool = False,
    tile_h: int | None = None,
) -> jnp.ndarray:
    """y = act(conv3x3_SAME_s1(x, w) + bias) for tiny C_in, bf16 out.

    Args:
      x: (B, H, W, C_in) float32 (the raster image; cast to bf16 in-kernel,
         identically to the plain path's pre-conv cast — casting commutes
         with the patch slicing).
      w: (3, 3, C_in, C_out) HWIO (folded weights; block-diagonal when batch
         packed). bias: (C_out,).
    Returns (B, H, W, C_out) bfloat16.
    """
    b_sz, h, w_in, c_in = x.shape
    c_out = w.shape[-1]
    assert supported(h, w_in, c_in, c_out, 3, 1, activation), (
        f"unsupported stem conv {x.shape} -> {c_out}")
    assert x.dtype == jnp.float32, x.dtype  # f32 raster in (cast in-kernel)
    r = tile_h or _pick_tile_h(h)
    assert h % r == 0, (h, r)
    k = 9 * c_in
    k_pad = _round_up(k, 16)          # bf16 sublane granule
    w_pad = _round_up(w_in, 128)      # lane-aligned padded width
    n_pad = w_pad - w_in

    # Channels-second + 1px SAME halo. One XLA copy (fuses pad+transpose);
    # ~0.2 ms at conv0 size vs the ~4 ms the kernel saves. Two block-spec
    # legality constraints found by the r5 remote-Mosaic bisect
    # (scripts/probe_pallas_canary.py C4-C7 + D1-D4):
    #   - the Element block's lane dim must be 128-aligned (640, not 610);
    #   - OVERLAPPING Element windows (the r+2-row halo blocks at step r)
    #     crash the compiler, and so does the manual-DMA alternative — only
    #     non-overlapping blocks compile (probe D1 vs D2/D4).
    # So the halo is materialized in XLA: row group i of `xh` holds input
    # rows [i*r, i*r + r + 2), and the kernel reads NON-overlapping
    # (r+2)-row blocks at step r+2. Costs one gather of the (tiny) input
    # (~10 MB at conv0) — irrelevant next to the multi-ms saving.
    w_blk = _round_up(w_in + 2, 128)
    xp = jnp.pad(x.transpose(0, 3, 1, 2),
                 ((0, 0), (0, 0), (1, 1), (1, w_blk - w_in - 1)))
    n_t = h // r
    halo_rows = (np.arange(n_t)[:, None] * r
                 + np.arange(r + 2)[None, :]).reshape(-1)
    xh = jnp.take(xp, jnp.asarray(halo_rows), axis=2)

    w2d = jnp.zeros((k_pad, c_out), jnp.bfloat16).at[:k].set(
        w.reshape(k, c_out).astype(jnp.bfloat16))
    bias2d = bias.reshape(1, c_out).astype(jnp.float32)
    act = _ACTS[activation]

    def kernel(x_ref, w_ref, b_ref, o_ref, patches_ref):
        # Pad lanes/sublanes of the scratch are zeroed once (the grid is
        # sequential on-core and scratch persists; taps only ever write
        # [0:k, :, 0:w_in]); padded weight rows are zero too, so the pad
        # region contributes exact +0.0 in the f32 accumulator.
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _():
            if k_pad > k:
                patches_ref[k:, :, :] = jnp.zeros(
                    (k_pad - k, r, w_pad), jnp.float32)
            if n_pad:
                patches_ref[:, :, w_in:] = jnp.zeros(
                    (k_pad, r, n_pad), jnp.float32)

        # 9*C_in full-occupancy (r, w_in) slab copies: plain static slices
        # of the halo block — the width-padded input supplies the SAME zeros.
        for ky in range(3):
            for kx in range(3):
                for ci in range(c_in):
                    patches_ref[(ky * 3 + kx) * c_in + ci, :, :w_in] = (
                        x_ref[0, ci, ky:ky + r, kx:kx + w_in])

        # Reshape-free contraction (round 5): the former
        # (k_pad, r, w_pad) -> (k_pad, r*w_pad) scratch reshape merged the
        # sublane and lane dims — the prime suspect for the round-4 remote
        # Mosaic crash. The 3D-lhs dot_general contracts dim 0 directly and
        # leaves (r, w_pad) untouched, so no relayout is required anywhere
        # (probe_stem_mosaic.py::p4 formulation).
        acc = jax.lax.dot_general(
            patches_ref[:].astype(jnp.bfloat16), w_ref[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (r, w_pad, c_out)
        y = act(acc + b_ref[:])
        o_ref[0] = y[:, :w_in, :].astype(o_ref.dtype)

    grid = (b_sz, h // r)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (pl.Element(1), pl.Element(c_in), pl.Element(r + 2),
                 pl.Element(w_blk)),
                lambda b, i: (b, 0, i * (r + 2), 0),  # pre-haloed groups
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, r, w_in, c_out), lambda b, i: (b, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_sz, h, w_in, c_out), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((k_pad, r, w_pad), jnp.float32)],
        interpret=interpret,
    )(xh, w2d, bias2d)
