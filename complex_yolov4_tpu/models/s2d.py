"""Space-to-depth execution of the early backbone (inference).

Why: XLA:TPU convolutions put channels in the 128-wide lane dimension. The
CSPDarknet53 stem (608^2..152^2, 32-128 channels — reference topology:
src/config/cfg/complex_yolov4.cfg layers 0-24) runs lane-starved at ~20-25
TFLOP/s while the C>=256 stages exceed 100 TFLOP/s. Space-to-depth (s2d)
trades spatial resolution for channel depth: x(B,H,W,C) -> y(B,H/2,W/2,4C)
with the 2x2 pixel phases stacked into channels (phase-major blocks
[p00|p01|p10|p11], each block the original C channels).

Every early-layer op has an EXACT rewrite in the s2d domain (outputs equal
the s2d of the original outputs, up to float addition order):

- elementwise (mish/leaky, shortcut add): unchanged — s2d commutes with
  elementwise ops;
- route concat / CSP group slice: per-phase channel blocks are sliced and
  re-concatenated to keep the canonical phase-major layout;
- 1x1 conv: the same (C, D) contraction applied per phase — a grouped conv
  with `feature_group_count=4` and the kernel replicated per group;
- 3x3 stride-1 conv: each *output* phase q=(qy,qx) is a 2x2-window conv over
  all 4 input phases: tap (dy,dx) of the original kernel lands at input
  phase ((qy+dy) & 1, (qx+dx) & 1) and window offset ((qy+dy)>>1,
  (qx+dx)>>1) which spans {-1,0} for q=0 and {0,1} for q=1 (asymmetric
  padding). 16/9 FLOP inflation, but contraction depth 4C fills the MXU.
- 3x3 stride-2 conv: same derivation with u = 2q+dy; the conv runs at
  stride 2 over the s2d input and emits the s2d of the half-resolution
  output, so the whole segment stays in the s2d domain across downsamples.

Two lowering variants, selected by `variant`:
- "phase": 4 convs with (2,2,4C,D) kernels (one per output phase), 1.78x
  FLOPs of the original, outputs concatenated phase-major;
- "dense": one conv with a (3,3,4C,4D) kernel containing the same taps
  (zeros elsewhere), 4x FLOPs but a single op with no concat copies.

Training keeps the standard executor (this is an inference-path
optimization; autodiff through it would work but is pointless).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spec import ConvSpec, MaxPoolSpec, NetSpec, RouteSpec, ShortcutSpec, UpsampleSpec, YoloSpec

# Minimum input spatial size for a layer to stay in the segment: at/below
# 128^2 the win disappears (channels are >=128 there in all four zoo nets).
MIN_SPATIAL = 150


def s2d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H/2, W/2, 4C), phase-major channel blocks."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def d2s(y: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `s2d`."""
    b, h, w, c4 = y.shape
    c = c4 // 4
    y = y.reshape(b, h, w, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, 2 * h, 2 * w, c)


def plan_segment(spec: NetSpec, height: Optional[int] = None,
                 min_spatial: Optional[int] = None) -> Optional[Tuple[int, int]]:
    """Maximal prefix [start, end] of layers (after the stem conv) that can
    run in the s2d domain: supported types only, input spatial >= min_spatial
    (default MIN_SPATIAL), and no later layer routes into the segment's
    interior. `height` is the actual input resolution (multiscale training
    and tests feed sizes != spec.height)."""
    if not spec.layers or not isinstance(spec.layers[0], ConvSpec):
        return None
    min_sp = MIN_SPATIAL if min_spatial is None else min_spatial
    # Output spatial size per layer.
    out_sp: List[int] = []
    for i, l in enumerate(spec.layers):
        in_sp = (height or spec.height) if i == 0 else out_sp[i - 1]
        if isinstance(l, RouteSpec):
            out_sp.append(out_sp[l.layers[0]])
        elif isinstance(l, (ConvSpec, MaxPoolSpec)):
            out_sp.append(in_sp // l.stride)
        elif isinstance(l, UpsampleSpec):
            out_sp.append(in_sp * l.stride)
        else:
            out_sp.append(in_sp)

    def refs(l) -> List[int]:
        if isinstance(l, RouteSpec):
            return list(l.layers)
        if isinstance(l, ShortcutSpec):
            return [l.from_index]
        return []

    start = 1
    end = 0
    for i in range(start, len(spec.layers)):
        l = spec.layers[i]
        in_sp = out_sp[i - 1] if not isinstance(l, RouteSpec) else None
        ok = (
            (isinstance(l, ConvSpec) and out_sp[i - 1] >= min_sp
             # 1x1 convs are only admitted at stride 1: the executor's
             # conv1x1_s2d has no stride plumbing, so a pointwise stride-2
             # conv inside a segment would silently run at stride 1.
             and ((l.size == 3 and l.pad and l.stride in (1, 2))
                  or (l.size == 1 and l.stride == 1)))
            or isinstance(l, (RouteSpec, ShortcutSpec))
        )
        if isinstance(l, (RouteSpec, ShortcutSpec)):
            ok = ok and out_sp[i] >= min_sp // 2  # operands are in-segment checks below
        if not ok:
            break
        if any(r < start - 1 for r in refs(l)):
            break
        end = i
    if end < start:
        return None
    # No later layer may reference the segment interior (its d2s outputs are
    # not kept; only the segment-end output is returned full-res). Shrink the
    # segment until that holds.
    changed = True
    while changed and end >= start:
        changed = False
        for i in range(end + 1, len(spec.layers)):
            inner = [r for r in refs(spec.layers[i]) if start - 1 <= r < end]
            if inner:
                end = max(inner)  # referenced output becomes the segment end
                changed = True
                break
    if end < start:
        return None
    return start, end


def _phase_kernel(w: jnp.ndarray, qy: int, qx: int, stride: int) -> jnp.ndarray:
    """(2, 2, 4C, D) kernel for output phase (qy, qx) of a 3x3 conv.
    Built with static-index jnp updates so BN-folded (traced) weights work;
    XLA constant-folds it when the weights are constants."""
    c, d = w.shape[2], w.shape[3]
    k = jnp.zeros((2, 2, 4 * c, d), w.dtype)
    for dy in (-1, 0, 1):
        u = stride * qy + dy
        py, oy = u & 1, u >> 1
        iy = oy + 1 if qy == 0 else oy
        for dx in (-1, 0, 1):
            v = stride * qx + dx
            px, ox = v & 1, v >> 1
            ix = ox + 1 if qx == 0 else ox
            blk = 2 * py + px
            k = k.at[iy, ix, blk * c:(blk + 1) * c, :].add(w[dy + 1, dx + 1])
    return k


def _dense_kernel(w: jnp.ndarray, stride: int) -> jnp.ndarray:
    """(3, 3, 4C, 4D) kernel computing all four output phases at once."""
    c, d = w.shape[2], w.shape[3]
    k = jnp.zeros((3, 3, 4 * c, 4 * d), w.dtype)
    for qy in (0, 1):
        for qx in (0, 1):
            q = 2 * qy + qx
            for dy in (-1, 0, 1):
                u = stride * qy + dy
                py, oy = u & 1, u >> 1
                for dx in (-1, 0, 1):
                    v = stride * qx + dx
                    px, ox = v & 1, v >> 1
                    blk = 2 * py + px
                    k = k.at[oy + 1, ox + 1,
                             blk * c:(blk + 1) * c,
                             q * d:(q + 1) * d].add(w[dy + 1, dx + 1])
    return k


def _conv(x, w, stride, pads, dtype, groups=1):
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype), (stride, stride), pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, preferred_element_type=dtype)


def conv3x3_s2d(y: jnp.ndarray, w: jnp.ndarray, stride: int, dtype,
                variant: str = "phase") -> jnp.ndarray:
    """3x3 conv rewrite: s2d input -> s2d output (phase-major blocks)."""
    w = jnp.asarray(w, jnp.float32)
    if variant == "dense":
        k = _dense_kernel(w, stride)
        return _conv(y, k, stride, [(1, 1), (1, 1)], dtype)
    outs = []
    for qy in (0, 1):
        for qx in (0, 1):
            k = _phase_kernel(w, qy, qx, stride)
            if stride == 1:
                pads = [(1, 0) if qy == 0 else (0, 1),
                        (1, 0) if qx == 0 else (0, 1)]
            else:
                pads = [(1, -1) if qy == 0 else (0, 0),
                        (1, -1) if qx == 0 else (0, 0)]
            outs.append(_conv(y, k, stride, pads, dtype))
    return jnp.concatenate(outs, axis=-1)


def conv1x1_s2d(y: jnp.ndarray, w: jnp.ndarray, dtype) -> jnp.ndarray:
    """1x1 conv rewrite: the same contraction per phase via a grouped conv."""
    k = jnp.concatenate([w] * 4, axis=-1)  # (1,1,C,4D): group g -> block g
    return _conv(y, k, 1, [(0, 0), (0, 0)], dtype, groups=4)


def phase_concat(tensors: List[jnp.ndarray], channels: List[int]) -> jnp.ndarray:
    """Concat s2d tensors so the result stays canonical phase-major:
    per phase, the original-channel blocks of each input are adjacent."""
    parts = []
    for p in range(4):
        for t, c in zip(tensors, channels):
            parts.append(t[..., p * c:(p + 1) * c])
    return jnp.concatenate(parts, axis=-1)


def phase_group_slice(t: jnp.ndarray, channels: int, groups: int,
                      group_id: int) -> jnp.ndarray:
    """CSP group route: original-channel slice [gid*c/g:(gid+1)*c/g] applied
    per phase block."""
    gsz = channels // groups
    lo = group_id * gsz
    parts = [t[..., p * channels + lo: p * channels + lo + gsz] for p in range(4)]
    return jnp.concatenate(parts, axis=-1)
