"""Batch-packed execution of the early backbone (pure XLA, exact).

Why (round-4 attribution, PERF.md): XLA:TPU lowers a 3x3 conv as 9 per-tap
matmuls whose contraction/output channel dims are padded to the 128-lane MXU
tile. The early layers (C_in 3..64) therefore waste 2-42x of every MXU pass
on padding — conv0 (3->32 @608) measures 5.69 ms against a 0.51 ms floor,
and cycles = 9 * M/8 * ceil(C/128) * ceil(N/128) reproduces every measured
early-layer time. The padding cannot be avoided (XLA picks the algorithm),
but M can: pack p frames of the batch into the channel dim and give every
conv a BLOCK-DIAGONAL kernel (frame f's channels only connect to frame f's
outputs). The p^2-fold "extra" FLOPs land entirely inside lanes that were
already padding, while the MXU row count M = B*H*W drops p-fold:

    cycles_packed = 9 * (M/p)/8 * ceil(pC/128) * ceil(pN/128)

For p=2 and C=N=64 that is exactly half the unpacked cycles. The transform
is numerically EXACT (padding-zero contributions accumulate as +0.0 in the
MXU's f32 accumulator; spatial dims are untouched, so strides/padding/
maxpool/upsample are unaffected; routes and CSP group slices become
per-frame-block lane slices).

Segment planning mirrors models/s2d.py: a maximal prefix of the layer list
where every conv's packed tile count does not exceed p times its unpacked
tile count (gain or neutral), nothing outside the segment references its
interior, and no quantized conv sits inside. Entry packs the input batch
(one transpose), exit unpacks (one transpose at the segment's far smaller
activation).

Reference parity: this changes scheduling only, never math — the executor's
packed path is tested bit-comparable to the plain path
(tests/test_models.py::test_batch_pack_*).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax.numpy as jnp

from .spec import ConvSpec, MaxPoolSpec, NetSpec, RouteSpec, ShortcutSpec, UpsampleSpec


def _tiles(c: int) -> int:
    return -(-c // 128)


def plan_segment(spec: NetSpec, p: int,
                 quant_keys=()) -> Optional[Tuple[int, int]]:
    """Maximal packed prefix [0, end] for pack factor `p`, or None.

    A conv is admissible when ceil(pC/128)*ceil(pN/128) <= p * ceil(C/128) *
    ceil(N/128) (packed cycles <= unpacked cycles) and it is not quantized;
    routes/shortcuts must reference the segment interior only. The end is
    then shrunk until no later layer references the interior (the end
    layer's own output is unpacked at exit, so references to `end` are
    fine)."""
    if p < 2 or not spec.layers or not isinstance(spec.layers[0], ConvSpec):
        return None
    chans = (spec.in_channels,) + spec.out_channels()
    quant_idx = {int(k[5:]) for k in quant_keys}

    end = -1
    for i, l in enumerate(spec.layers):
        if isinstance(l, ConvSpec):
            if i in quant_idx:
                break
            c, n = chans[i], l.filters
            if _tiles(p * c) * _tiles(p * n) > p * _tiles(c) * _tiles(n):
                break
        elif isinstance(l, RouteSpec):
            if any(s < 0 or s >= i for s in l.layers):
                break
            if l.groups > 1 and chans[l.layers[0] + 1] % l.groups:
                break
        elif isinstance(l, ShortcutSpec):
            if l.from_index < 0 or l.from_index >= i:
                break
        elif not isinstance(l, (MaxPoolSpec, UpsampleSpec)):
            break  # yolo head or unknown: stop
        end = i
    if end < 1:
        return None

    def refs(l) -> List[int]:
        if isinstance(l, RouteSpec):
            return list(l.layers)
        if isinstance(l, ShortcutSpec):
            return [l.from_index]
        return []

    changed = True
    while changed:
        changed = False
        for j in range(end + 1, len(spec.layers)):
            inner = [r for r in refs(spec.layers[j]) if r < end]
            if inner:
                end = max(inner)  # referenced layer becomes the new end
                changed = True
                break
    if end < 1:
        return None
    return 0, end


def pack(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B/p, H, W, p*C); group g packs frames g*p .. g*p+p-1
    as adjacent channel blocks."""
    b, h, w, c = x.shape
    assert b % p == 0
    return (x.reshape(b // p, p, h, w, c)
            .transpose(0, 2, 3, 1, 4)
            .reshape(b // p, h, w, p * c))


def unpack(y: jnp.ndarray, p: int) -> jnp.ndarray:
    """Inverse of `pack`."""
    g, h, w, pc = y.shape
    c = pc // p
    return (y.reshape(g, h, w, p, c)
            .transpose(0, 3, 1, 2, 4)
            .reshape(g * p, h, w, c))


def pack_kernel(w: jnp.ndarray, p: int) -> jnp.ndarray:
    """(k, k, C, N) HWIO -> block-diagonal (k, k, p*C, p*N): frame block f's
    input channels connect only to frame block f's outputs."""
    k1, k2, c, n = w.shape
    out = jnp.zeros((k1, k2, p * c, p * n), w.dtype)
    for f in range(p):
        out = out.at[:, :, f * c:(f + 1) * c, f * n:(f + 1) * n].set(w)
    return out


def pack_kernel_parts(w: jnp.ndarray, p: int,
                      part_channels: List[int]) -> jnp.ndarray:
    """Block-diagonal kernel whose input rows follow the PLAIN concatenation
    of frame-major packed parts (parts order), not the frame-major order.

    A packed multi-route concat whose sole consumer is the following conv
    does not need the per-frame-block lane interleave `packed_concat` pays
    (measured 3.46 ms at 304^2x256, r4 attribution): the plain
    jnp.concatenate of the packed parts — layout [part0-f0 | part0-f1 |
    part1-f0 | ...] — feeds a kernel whose input-channel blocks are laid out
    to match. Output stays frame-major. Exact, like `pack_kernel`."""
    k1, k2, c, n = w.shape
    assert sum(part_channels) == c, (part_channels, c)
    out = jnp.zeros((k1, k2, p * c, p * n), w.dtype)
    off_packed = 0
    off_orig = 0
    for cj in part_channels:
        for f in range(p):
            out = out.at[:, :, off_packed:off_packed + cj,
                         f * n:(f + 1) * n].set(
                w[:, :, off_orig:off_orig + cj, :])
            off_packed += cj
        off_orig += cj
    return out


def pack_channel_vec(v: jnp.ndarray, p: int) -> jnp.ndarray:
    """Per-channel vector (bias / BN affine) -> tiled for the packed layout."""
    return jnp.tile(v, p)


def packed_concat(parts: List[jnp.ndarray], channels: List[int],
                  p: int) -> jnp.ndarray:
    """Channel concat in the packed layout: per frame block, the original
    channel blocks of each input must be adjacent (like s2d.phase_concat)."""
    out = []
    for f in range(p):
        for t, c in zip(parts, channels):
            out.append(t[..., f * c:(f + 1) * c])
    return jnp.concatenate(out, axis=-1)


def packed_group_slice(t: jnp.ndarray, channels: int, groups: int,
                       group_id: int, p: int) -> jnp.ndarray:
    """CSP group route (original-channel slice) applied per frame block."""
    c = channels // groups
    return jnp.concatenate(
        [t[..., f * channels + group_id * c: f * channels + (group_id + 1) * c]
         for f in range(p)], axis=-1)
