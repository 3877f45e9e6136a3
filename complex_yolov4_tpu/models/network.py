"""Pure-functional NHWC network executor for the darknet layer IR.

TPU-first design decisions (vs reference: src/models/darknet2pytorch.py):

- NHWC activations + HWIO conv weights — the layouts XLA:TPU tiles onto the
  MXU without transposes (the reference is NCHW/cuDNN).
- The Python loop over layer specs runs once at trace time under `jit`; XLA
  fuses conv+BN+activation chains. There is no per-forward interpretation.
- Compute dtype is configurable (bfloat16 by default for inference); BatchNorm
  statistics and parameters stay float32 for numerical parity.
- Decoded heads stay on device — no D2H copy per forward (the reference moves
  all 22,743 boxes to CPU every step, darknet2pytorch.py:228).

Parameters are a pytree ``{"layer{i}": {...}}``; BatchNorm running statistics
live in a separate ``state`` pytree so `apply` stays a pure function.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import fused_stage as fused_mod
from ..ops import pallas_conv
from ..ops import stem_conv as stem_mod
from . import bn_train as bn_train_mod
from . import bpack as bpack_mod
from . import s2d as s2d_mod
from .spec import ConvSpec, MaxPoolSpec, NetSpec, RouteSpec, ShortcutSpec, UpsampleSpec, YoloSpec
from .yolo_head import decode_head

Params = Dict[str, Any]
State = Dict[str, Any]

BN_EPS = 1e-5       # torch BatchNorm2d default, kept for weight-import parity
BN_MOMENTUM = 0.1   # torch convention: new = (1 - m) * old + m * batch
assert bn_train_mod.BN_EPS == BN_EPS  # the custom-VJP BN must share the eps


# Serving-only rational approximation of tanh(softplus(x)) on [-12, 4]
# (P4/Q4 Lawson-minimax fit; max |mish - approx| = 3.7e-3, below the bf16
# ulp at unit activation scale; poles excluded, Q >= 0.92 on the range).
# Replaces the exp + divide with 8 FMAs + 1 divide on the VPU — PERF.md
# lever #6; accuracy-gated like int8 (scripts/gate_mish.py).
_MISH_P = (0.6001953413151558, 0.1442384341413317, 0.0062036354390033795,
           -0.0006527109458260742, -4.05650302230369e-05)
_MISH_Q = (1.0, -0.29155779152950445, 0.193682869438228,
           -0.03783387168399598, 0.0027894831784528304)


def _horner(coefs, x):
    acc = jnp.full_like(x, coefs[-1])
    for c in coefs[-2::-1]:
        acc = acc * x + c
    return acc


def _act(x: jnp.ndarray, kind: str, mish_approx: bool = False) -> jnp.ndarray:
    if kind == "mish":
        if mish_approx:
            t = x.astype(jnp.float32)
            tc = jnp.clip(t, -12.0, 4.0)
            r = _horner(_MISH_P, tc) / _horner(_MISH_Q, tc)
            y = jnp.where(t > 4.0, t, jnp.where(t < -12.0, 0.0, t * r))
            return y.astype(x.dtype)
        # mish(x) = x * tanh(softplus(x)) == x * (s^2 + 2s) / (s^2 + 2s + 2)
        # with s = exp(x): one transcendental instead of three (exp/log/tanh),
        # exact algebraically; for x > 20 tanh(softplus(x)) == 1 in fp anyway.
        s = jnp.exp(jnp.minimum(x, 20.0))
        q = s * s + 2.0 * s
        return jnp.where(x > 20.0, x, x * q / (q + 2.0))
    if kind == "leaky":
        return jax.nn.leaky_relu(x, 0.1)
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "linear":
        return x
    raise ValueError(f"unknown activation {kind!r}")


def init_params(spec: NetSpec, rng: jax.Array, dtype=jnp.float32) -> Tuple[Params, State]:
    """Kaiming-style init matching torch Conv2d defaults closely enough for
    from-scratch training; returns (params, state)."""
    params: Params = {}
    state: State = {}
    chans = (spec.in_channels,) + spec.out_channels()
    rngs = jax.random.split(rng, len(spec.layers))
    for i, layer in enumerate(spec.layers):
        if not isinstance(layer, ConvSpec):
            continue
        cin, cout, k = chans[i], layer.filters, layer.size
        fan_in = cin * k * k
        bound = float(np.sqrt(1.0 / fan_in))
        w_key, b_key = jax.random.split(rngs[i])
        entry: Dict[str, Any] = {
            "w": jax.random.uniform(w_key, (k, k, cin, cout), dtype, -bound, bound)
        }
        if layer.batch_normalize:
            entry["bn_scale"] = jnp.ones((cout,), jnp.float32)
            entry["bn_bias"] = jnp.zeros((cout,), jnp.float32)
            state[f"layer{i}"] = {
                "mean": jnp.zeros((cout,), jnp.float32),
                "var": jnp.ones((cout,), jnp.float32),
            }
        else:
            entry["b"] = jax.random.uniform(b_key, (cout,), dtype, -bound, bound)
        params[f"layer{i}"] = entry
    return params, state


class _PartsConcat(tuple):
    """Deferred route-concat: the parts of a channel concat whose sole
    consumer is the next 1x1 conv. conv(concat(parts), w) is computed as
    sum_j conv(part_j, w_j) with w sliced along C_in — exact, and it deletes
    the concat's HBM write + read (the concats in yolov4's CSP transitions /
    SPP / PAN are 64-2048 channels at 19^2-304^2; reference materializes all
    of them, darknet2pytorch.py:200-215)."""

    __slots__ = ()


def _split_conv(parts, w: jnp.ndarray, stride: int, pad: int,
                compute_dtype) -> jnp.ndarray:
    """1x1 conv over a deferred concat: weight-sliced conv per part, summed
    in f32 before the compute-dtype cast (same rounding profile as the
    single conv's f32 MXU accumulator)."""
    off = 0
    acc = None
    for part in parts:
        c = part.shape[-1]
        y = jax.lax.conv_general_dilated(
            part.astype(compute_dtype),
            w[:, :, off:off + c, :].astype(compute_dtype),
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        acc = y if acc is None else acc + y
        off += c
    return acc.astype(compute_dtype)


def _conv(x: jnp.ndarray, w: jnp.ndarray, stride: int, pad: int,
          compute_dtype) -> jnp.ndarray:
    # Output in compute dtype: the MXU accumulates f32 internally either way,
    # and emitting bf16 keeps the conv transpose rule dtype-consistent under
    # grad (preferred_element_type=f32 with bf16 operands breaks it).
    # NOTE: lowering 1x1 convs as explicit matmuls wins 2-3x in ISOLATION at
    # high resolution but LOSES ~15% inside the fused network (layout
    # transitions between conv-chosen and dot-chosen layouts) — measured both
    # ways on v5e; keep every conv on the conv path.
    return jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        w.astype(compute_dtype),
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=compute_dtype,
    )


def _maxpool(x: jnp.ndarray, size: int, stride: int) -> jnp.ndarray:
    """Darknet maxpool variants (reference: src/models/darknet2pytorch.py:31-61,279-291)."""
    # Scalar -inf init keeps reduce_window on the max-monoid path, which is
    # the one with a reverse-mode rule (array inits hit the generic path).
    neg_inf = -float(np.inf)
    if stride == size:
        return jax.lax.reduce_window(
            x, neg_inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1), "VALID")
    if stride == 1 and size % 2 == 1:
        p = size // 2
        return jax.lax.reduce_window(
            x, neg_inf, jax.lax.max, (1, size, size, 1), (1, 1, 1, 1),
            [(0, 0), (p, p), (p, p), (0, 0)])
    # MaxPoolDark: replicate padding chosen so out = (in + (size-1) - size)//stride + 1
    h, w_ = x.shape[1], x.shape[2]
    p = size // 2

    def pads(dim: int) -> Tuple[int, int]:
        lo = (size - 1) // 2
        hi = lo + 1 if ((dim - 1) // stride) != ((dim + 2 * p - size) // stride) else lo
        return lo, hi

    (t, bm), (l, r) = pads(h), pads(w_)
    x = jnp.pad(x, [(0, 0), (t, bm), (l, r), (0, 0)], mode="edge")
    return jax.lax.reduce_window(
        x, neg_inf, jax.lax.max, (1, size, size, 1), (1, stride, stride, 1), "VALID")


def _upsample(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    x = jnp.repeat(x, stride, axis=1)
    return jnp.repeat(x, stride, axis=2)


def _use_pallas_default() -> bool:
    """Pallas kernels only on real TPU backends (axon = tunneled TPU)."""
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _use_fused_default() -> bool:
    """Fused-stage kernels are opt-in (FUSED_STAGE=1) until they beat the
    XLA path e2e — the first cut measured slower (PERF.md)."""
    import os

    return os.environ.get("FUSED_STAGE", "") == "1"


def _use_stem_default() -> bool:
    """Pallas stem conv (ops/stem_conv.py): FROZEN RESEARCH, opt-in
    (STEM_PALLAS=1). Correct in interpret mode but crashes the remote
    Mosaic compiler on the real chip — see the ops/stem_conv.py status
    note and PERF.md round-4 batch 5 before enabling."""
    import os

    return os.environ.get("STEM_PALLAS", "") == "1"


def apply(
    spec: NetSpec,
    params: Params,
    state: State,
    x: jnp.ndarray,
    *,
    train: bool = False,
    compute_dtype=jnp.bfloat16,
    use_pallas_conv: Optional[bool] = None,
    use_fused_stage: Optional[bool] = None,
    stem_pallas: Optional[bool] = None,
    s2d_early: Optional[str] = None,
    quant: Optional[Dict[str, Any]] = None,
    capture_act_max: bool = False,
    defer_route_concat: bool = False,
    stop_after: Optional[int] = None,
    batch_pack: Optional[int] = None,
    mish_approx: bool = False,
):
    """Run the network.

    Args:
      x: (B, H, W, C) BEV raster, float32 in [0, 1].
      train: batch statistics + running-stat updates when True.

    Returns:
      train=False: (decoded, head_raw) where decoded is (B, num_boxes, 7+C)
        with rows [x, y, w, l, im, re, conf, cls...] in input-pixel units
        (same semantics as reference yolo_layer.py:184-190), and head_raw is
        the list of per-head decode dicts (grid-unit boxes etc., for loss/tests).
      train=True: ((decoded, head_raw), new_state).

    s2d_early ("phase" | "dense" | None): run the lane-starved early backbone
    in the space-to-depth domain (exact rewrite, see models/s2d.py).
    Inference only; ignored when train=True.

    quant: per-layer int8 tree from models/quantize.py — convs present in it
    run on the int8 MXU path (quantize input, int8 conv, fused dequant+bias+
    activation epilogue); absent convs use the standard path. Inference only.

    capture_act_max: additionally return {layer_key: max|conv input|} as the
    last element (calibration support, models/quantize.py).

    batch_pack: pack `batch_pack` frames into the channel dim over the early
    backbone (block-diagonal kernels, exact — see models/bpack.py): the
    early convs' MXU time is 128-lane channel padding, and packing divides
    their row count p-fold. Works in inference AND training (train-mode BN
    computes exact per-original-channel batch statistics via a free
    minor-dim reshape); inert alongside s2d / fused segments / calibration,
    and when the batch is not divisible.

    stop_after: truncate the network after layer index `stop_after` and
    return (live_tensors, decoded_heads) instead of the normal structure —
    every tensor still held for a later route/shortcut plus the running
    activation, exactly the executor's liveness set, so a jitted prefix
    cannot dead-code-eliminate side branches. Measurement support for the
    per-layer in-network attribution (scripts/bench_prefix.py); overrides
    the train-mode return shape (no state merge).
    """
    if use_pallas_conv is None:
        use_pallas_conv = _use_pallas_default()
    if stem_pallas is None:
        stem_pallas = _use_stem_default()
    img_size = x.shape[1]
    outputs: List[Optional[jnp.ndarray]] = []
    new_state: State = {}
    decoded_heads = []
    head_raw = []

    # Liveness: free activations that no later route/shortcut needs.
    last_use = [i for i in range(len(spec.layers))]
    for i, layer in enumerate(spec.layers):
        if isinstance(layer, RouteSpec):
            for j in layer.layers:
                last_use[j] = max(last_use[j], i)
        elif isinstance(layer, ShortcutSpec):
            last_use[layer.from_index] = max(last_use[layer.from_index], i)
        if i > 0 and not isinstance(layer, RouteSpec):
            last_use[i - 1] = max(last_use[i - 1], i)

    seg = (s2d_mod.plan_segment(spec, img_size)
           if (s2d_early and not train and quant is None) else None)
    seg_out: Dict[int, jnp.ndarray] = {}
    act_max: Dict[str, jnp.ndarray] = {}
    # Fused CSP-stage kernels (ops/fused_stage.py): run each early-backbone
    # stage as ONE Pallas kernel with every intermediate VMEM-resident.
    # Inference/bf16/square inputs only; inert alongside s2d and calibration.
    if use_fused_stage is None:
        use_fused_stage = _use_fused_default()
    fused_by_start: Dict[int, Any] = {}
    if (use_fused_stage and not train and seg is None and not capture_act_max
            and compute_dtype == jnp.bfloat16 and x.shape[1] == x.shape[2]):
        for fseg in fused_mod.plan_segments(spec, img_size):
            if quant is None or all(
                    f"layer{o.layer_index}" not in quant for o in fseg.ops):
                fused_by_start[fseg.start] = fseg
    # Chained int8: producer epilogues requantize straight to the consumer's
    # int8 domain where the consumer is the sole reader (models/quantize.py).
    chain: set = set()
    if quant is not None and not train:
        from . import quantize as _qz
        chain = _qz.chain_set(spec, quant.keys())
    chans = (spec.in_channels,) + spec.out_channels()

    # Batch-packed early segment (models/bpack.py): interior activations
    # carry p frames in the channel dim; entry packs, the segment-end layer
    # unpacks, quantized convs never overlap (plan excludes them).
    bp = None
    if (batch_pack and seg is None and not fused_by_start
            and not capture_act_max and x.shape[0] % batch_pack == 0):
        # Training included: the backward of a block-diagonal conv enjoys
        # the same padded-pass halving, bn_train/the f32 stats path reduce
        # per original channel via a free minor-dim reshape.
        bp = bpack_mod.plan_segment(spec, batch_pack,
                                    (quant or {}).keys())
    bp_end = bp[1] if bp else -1

    # Multi-input routes whose sole consumer is the following 1x1 conv never
    # materialize: the conv runs weight-sliced over the parts (_PartsConcat).
    # Inference only; covers every CSP-transition / SPP / PAN concat.
    # DEFAULT OFF: the roofline promised 1.68 ms/batch but the same-session
    # on-chip A/B (scripts/r3_reconcile.sh, PERF.md round-3 log) measured the
    # deferred path 7% SLOWER e2e in every quant config (int8 460 vs 495) —
    # the weight-sliced part convs cost XLA more than the concat they avoid.
    # Kept selectable for A/B and as the parity-tested building block.
    defer_routes: set = set()
    if not train and defer_route_concat:
        for r, lyr in enumerate(spec.layers[:-1]):
            if (isinstance(lyr, RouteSpec) and len(lyr.layers) > 1
                    and isinstance(spec.layers[r + 1], ConvSpec)
                    and spec.layers[r + 1].size == 1
                    and last_use[r] == r + 1
                    and (seg is None or not (seg[0] <= r + 1 <= seg[1]))
                    and r > bp_end
                    and (r + 1) not in fused_by_start):
                defer_routes.add(r)

    def folded_wb(i: int, layer: ConvSpec):
        p = params[f"layer{i}"]
        if layer.batch_normalize:
            st = state[f"layer{i}"]
            inv = jax.lax.rsqrt(st["var"] + BN_EPS) * p["bn_scale"]
            return p["w"] * inv[None, None, None, :], p["bn_bias"] - st["mean"] * inv
        return p["w"], p["b"]

    h = x
    fused_until = -1
    bp_parts_order = None  # set by a packed route, consumed by the next conv
    for i, layer in enumerate(spec.layers):
        if stop_after is not None and i > stop_after:
            break
        if i <= fused_until:
            continue  # inside a fused segment; outputs already appended
        if i in fused_by_start:
            fseg = fused_by_start[i]
            layout = ("packed2" if fused_mod.packed_ok(fseg)
                      and h.shape[1] % 2 == 0 else "plain")
            sp = fused_mod.segment_params(
                fseg, lambda li: folded_wb(li, spec.layers[li]), layout=layout)
            h = fused_mod.apply_segment(
                fseg, h.astype(jnp.bfloat16), sp, width=h.shape[1],
                layout=layout)
            for _ in range(fseg.start, fseg.end):
                outputs.append(None)
            outputs.append(h)
            fused_until = fseg.end
            for j in range(fseg.end + 1):
                if outputs[j] is not None and last_use[j] <= fseg.end:
                    outputs[j] = None
            continue
        if seg is not None and seg[0] <= i <= seg[1]:
            # Space-to-depth domain execution (models/s2d.py): every op here
            # is an exact rewrite; tensors are canonical phase-major s2d.
            if i == seg[0]:
                seg_out[i - 1] = s2d_mod.s2d(h)
                g = seg_out[i - 1]
            if isinstance(layer, ConvSpec):
                w_eff, b_eff = folded_wb(i, layer)
                src = seg_out[i - 1]
                if layer.size == 3:
                    g = s2d_mod.conv3x3_s2d(src, w_eff, layer.stride,
                                            compute_dtype, s2d_early)
                else:
                    g = s2d_mod.conv1x1_s2d(src, w_eff, compute_dtype)
                g = g + jnp.tile(b_eff, 4).astype(g.dtype)
                g = _act(g, layer.activation, mish_approx).astype(compute_dtype)
            elif isinstance(layer, RouteSpec):
                if len(layer.layers) == 1:
                    src = seg_out[layer.layers[0]]
                    if layer.groups > 1:
                        g = s2d_mod.phase_group_slice(
                            src, chans[layer.layers[0] + 1],
                            layer.groups, layer.group_id)
                    else:
                        g = src
                else:
                    g = s2d_mod.phase_concat(
                        [seg_out[j] for j in layer.layers],
                        [chans[j + 1] for j in layer.layers])
            elif isinstance(layer, ShortcutSpec):
                g = seg_out[layer.from_index] + seg_out[i - 1]
                g = _act(g, layer.activation, mish_approx)
            else:  # pragma: no cover - plan_segment excludes other types
                raise AssertionError(f"unsupported s2d layer {layer!r}")
            seg_out[i] = g
            if i == seg[1]:
                h = s2d_mod.d2s(g).astype(compute_dtype)
                outputs.append(h)
                seg_out.clear()
            else:
                outputs.append(None)
            continue
        if bp is not None and i == 0:
            h = bpack_mod.pack(h, batch_pack)
        in_bp = bp is not None and i <= bp_end
        if isinstance(layer, ConvSpec):
            p = params.get(f"layer{i}")
            pad = (layer.size - 1) // 2 if layer.pad else 0
            if capture_act_max:
                if isinstance(h, _PartsConcat):
                    act_max[f"layer{i}"] = functools.reduce(
                        jnp.maximum,
                        [jnp.max(jnp.abs(part.astype(jnp.float32)))
                         for part in h])
                elif h.dtype == jnp.int8:  # chained input: max in the dequant domain
                    act_max[f"layer{i}"] = (
                        jnp.max(jnp.abs(h.astype(jnp.float32)))
                        * quant[f"layer{i}"]["s_x"])
                else:
                    act_max[f"layer{i}"] = jnp.max(jnp.abs(h.astype(jnp.float32)))
            if quant is not None and not train and f"layer{i}" in quant:
                q = quant[f"layer{i}"]
                if isinstance(h, _PartsConcat):
                    # weight-sliced int8 convs over the deferred concat parts,
                    # summed in the int32 accumulator domain (exact)
                    y = None
                    off = 0
                    for part in h:  # parts are never chained-int8 (chain_set
                        c = part.shape[-1]  # links conv->conv only)
                        pq = jnp.clip(
                            jnp.round(part.astype(jnp.float32) * (1.0 / q["s_x"])),
                            -127.0, 127.0).astype(jnp.int8)
                        yp = jax.lax.conv_general_dilated(
                            pq, q["w_i8"][:, :, off:off + c, :],
                            window_strides=(layer.stride, layer.stride),
                            padding=[(pad, pad), (pad, pad)],
                            dimension_numbers=("NHWC", "HWIO", "NHWC"),
                            preferred_element_type=jnp.int32)
                        y = yp if y is None else y + yp
                        off += c
                else:
                    if h.dtype == jnp.int8:  # producer already requantized for us
                        x_q = h
                    else:
                        x_q = jnp.clip(
                            jnp.round(h.astype(jnp.float32) * (1.0 / q["s_x"])),
                            -127.0, 127.0).astype(jnp.int8)
                    y = jax.lax.conv_general_dilated(
                        x_q, q["w_i8"],
                        window_strides=(layer.stride, layer.stride),
                        padding=[(pad, pad), (pad, pad)],
                        dimension_numbers=("NHWC", "HWIO", "NHWC"),
                        preferred_element_type=jnp.int32)
                h = y.astype(jnp.float32) * (q["s_x"] * q["w_scale"]) + q["b"]
                h = _act(h, layer.activation, mish_approx)
                if i in chain:  # requantize in-epilogue to the consumer's domain
                    h = jnp.clip(
                        jnp.round(h * (1.0 / quant[f"layer{i + 1}"]["s_x"])),
                        -127.0, 127.0).astype(jnp.int8)
                else:
                    h = h.astype(compute_dtype)
                outputs.append(h)
                for j in range(i + 1):
                    if outputs[j] is not None and last_use[j] <= i:
                        outputs[j] = None
                continue
            if (
                stem_pallas
                and not train
                and not isinstance(h, _PartsConcat)
                and h.dtype == jnp.float32
                and compute_dtype == jnp.bfloat16
                and layer.size == 3
                and layer.stride == 1
                and layer.pad
                and stem_mod.supported(
                    h.shape[1], h.shape[2], h.shape[-1],
                    layer.filters * (batch_pack if in_bp else 1),
                    layer.size, layer.stride, layer.activation)
            ):
                # Tiny-C_in stem conv as ONE MXU pass over im2col patches
                # (ops/stem_conv.py) — XLA's 9 K-padded tap matmuls are the
                # network's single worst layer (r4 attribution, PERF.md).
                # Triggers for conv0 only: later layers arrive in bf16.
                w_eff, b_eff = folded_wb(i, layer)
                if in_bp:
                    w_eff = bpack_mod.pack_kernel(w_eff, batch_pack)
                    b_eff = bpack_mod.pack_channel_vec(b_eff, batch_pack)
                h = stem_mod.conv3x3_stem(h, w_eff, b_eff,
                                          activation=layer.activation)
                outputs.append(h)
                for j in range(i + 1):
                    if outputs[j] is not None and last_use[j] <= i:
                        outputs[j] = None
                continue
            if (
                use_pallas_conv
                and not train
                and not in_bp
                and layer.size == 3
                and layer.pad
                and pallas_conv.supported(
                    h.shape[1], h.shape[2], h.shape[-1], layer.filters,
                    layer.size, layer.stride)
                and layer.activation in ("mish", "leaky", "relu", "linear")
            ):
                # Fused conv+affine+activation in one Pallas kernel for the
                # lane-starved high-resolution layers (see ops/pallas_conv.py).
                # BN (inference stats) folds into an effective weight/bias.
                if layer.batch_normalize:
                    st = state[f"layer{i}"]
                    inv = jax.lax.rsqrt(st["var"] + BN_EPS) * p["bn_scale"]
                    w_eff = p["w"] * inv[None, None, None, :]
                    b_eff = p["bn_bias"] - st["mean"] * inv
                else:
                    w_eff = p["w"]
                    b_eff = p["b"]
                h = pallas_conv.conv3x3_fused(
                    h.astype(compute_dtype), w_eff, b_eff,
                    stride=layer.stride, activation=layer.activation)
                outputs.append(h)
                for j in range(i + 1):
                    if outputs[j] is not None and last_use[j] <= i:
                        outputs[j] = None
                continue
            if isinstance(h, _PartsConcat):
                h = _split_conv(h, p["w"], layer.stride, pad, compute_dtype)
            elif in_bp and bp_parts_order is not None:
                # Input is a plain concat of packed parts (see the RouteSpec
                # branch): consume it with the parts-ordered kernel instead
                # of paying the frame-major lane interleave.
                h = _conv(h, bpack_mod.pack_kernel_parts(
                    p["w"], batch_pack, bp_parts_order),
                    layer.stride, pad, compute_dtype)
                bp_parts_order = None
            elif in_bp:
                h = _conv(h, bpack_mod.pack_kernel(p["w"], batch_pack),
                          layer.stride, pad, compute_dtype)
            else:
                h = _conv(h, p["w"], layer.stride, pad, compute_dtype)
            # Inference epilogue runs in compute dtype (the f32 MXU
            # accumulator is cast right after the conv) — halves HBM traffic
            # for every activation tensor. Training keeps the f32 epilogue so
            # BN batch statistics stay accurate.
            if not train:
                h = h.astype(compute_dtype)
            if layer.batch_normalize:
                normalized = False
                if train:
                    if h.dtype == jnp.bfloat16:
                        # bf16-residual custom-VJP BN (models/bn_train.py):
                        # same f32 batch statistics, exact gradient through
                        # them, but the backward stores the bf16 conv output
                        # instead of its f32 cast — the measured backward ran
                        # 3x the forward and this residual traffic is the
                        # gap (PERF.md r3 batch-2 breakdown). f32 training
                        # keeps the plain autodiff path (reference parity).
                        h, mean, var = bn_train_mod.bn_train(
                            h, p["bn_scale"], p["bn_bias"],
                            batch_pack if in_bp else 1)
                        normalized = True
                    elif in_bp:  # packed: stats per ORIGINAL channel
                        h = h.astype(jnp.float32)
                        r = h.reshape(h.shape[0], h.shape[1], h.shape[2],
                                      batch_pack, -1)
                        mean = jnp.mean(r, axis=(0, 1, 2, 3))
                        var = jnp.var(r, axis=(0, 1, 2, 3))
                    else:
                        h = h.astype(jnp.float32)  # f32 batch stats + epilogue
                        mean = jnp.mean(h, axis=(0, 1, 2))
                        var = jnp.var(h, axis=(0, 1, 2))
                    n = (h.shape[0] * h.shape[1] * h.shape[2]
                         * (batch_pack if in_bp else 1))
                    unbiased = var * (n / max(n - 1, 1))
                    old = state[f"layer{i}"]
                    new_state[f"layer{i}"] = {
                        "mean": (1 - BN_MOMENTUM) * old["mean"] + BN_MOMENTUM * mean,
                        "var": (1 - BN_MOMENTUM) * old["var"] + BN_MOMENTUM * unbiased,
                    }
                else:
                    st = state[f"layer{i}"]
                    mean, var = st["mean"], st["var"]
                if not normalized:
                    inv = jax.lax.rsqrt(var + BN_EPS) * p["bn_scale"]
                    scale, shift = inv, p["bn_bias"] - mean * inv
                    if in_bp:
                        scale = bpack_mod.pack_channel_vec(scale, batch_pack)
                        shift = bpack_mod.pack_channel_vec(shift, batch_pack)
                    h = h * scale.astype(h.dtype) + shift.astype(h.dtype)
            else:
                bias = (bpack_mod.pack_channel_vec(p["b"], batch_pack)
                        if in_bp else p["b"])
                h = h + bias.astype(h.dtype)
            h = _act(h, layer.activation, mish_approx)
            h = h.astype(compute_dtype)
        elif isinstance(layer, MaxPoolSpec):
            h = _maxpool(h, layer.size, layer.stride)
        elif isinstance(layer, UpsampleSpec):
            h = _upsample(h, layer.stride)
        elif isinstance(layer, RouteSpec):
            if in_bp:
                if len(layer.layers) == 1:
                    src = outputs[layer.layers[0]]
                    if layer.groups > 1:
                        h = bpack_mod.packed_group_slice(
                            src, chans[layer.layers[0] + 1], layer.groups,
                            layer.group_id, batch_pack)
                    else:
                        h = src
                elif (last_use[i] == i + 1 and i < bp_end
                      and isinstance(spec.layers[i + 1], ConvSpec)):
                    # Sole consumer is the next (packed) conv: skip the
                    # frame-major interleave, the conv's kernel rows are
                    # permuted to the parts order (bpack.pack_kernel_parts).
                    h = jnp.concatenate(
                        [outputs[j] for j in layer.layers], axis=-1)
                    bp_parts_order = [chans[j + 1] for j in layer.layers]
                else:
                    h = bpack_mod.packed_concat(
                        [outputs[j] for j in layer.layers],
                        [chans[j + 1] for j in layer.layers], batch_pack)
            elif len(layer.layers) == 1:
                src = outputs[layer.layers[0]]
                if layer.groups > 1:
                    c = src.shape[-1] // layer.groups
                    h = src[..., layer.group_id * c : (layer.group_id + 1) * c]
                else:
                    h = src
            elif i in defer_routes:
                h = _PartsConcat(outputs[j] for j in layer.layers)
            else:
                h = jnp.concatenate([outputs[j] for j in layer.layers], axis=-1)
        elif isinstance(layer, ShortcutSpec):
            h = outputs[layer.from_index] + outputs[i - 1]
            h = _act(h, layer.activation, mish_approx)
        elif isinstance(layer, YoloSpec):
            raw = decode_head(outputs[i - 1].astype(jnp.float32), layer, img_size)
            head_raw.append(raw)
            decoded_heads.append(raw["output"])
            h = outputs[i - 1]
        if bp is not None and i == bp_end:
            h = bpack_mod.unpack(h, batch_pack)  # segment exit
        outputs.append(h)
        # Drop dead activations so XLA's buffer liveness matches ours.
        for j in range(i + 1):
            if outputs[j] is not None and last_use[j] <= i:
                outputs[j] = None

    if stop_after is not None:
        live = [o for o in outputs if o is not None]
        # The final prefix layer may have no later consumer in last_use (its
        # only full-network reader is a route that jumps elsewhere) and get
        # liveness-pruned above — keep it, or XLA would DCE the layer.
        if not isinstance(h, _PartsConcat) and not any(o is h for o in live):
            live.append(h)
        return live, decoded_heads
    decoded = jnp.concatenate(decoded_heads, axis=1)
    if train:
        merged = dict(state)
        merged.update(new_state)
        return (decoded, head_raw), merged
    if capture_act_max:
        return decoded, head_raw, act_max
    return decoded, head_raw


def network_apply_fn(spec: NetSpec, *, train: bool = False, compute_dtype=jnp.bfloat16):
    """Partially-applied `apply` suitable for jit."""
    return functools.partial(apply, spec, train=train, compute_dtype=compute_dtype)


def num_parameters(params: Params) -> int:
    return sum(int(np.prod(v.shape)) for leaf in params.values() for v in leaf.values())


def fold_batchnorm(spec: NetSpec, params: Params, state: State) -> Params:
    """Fold BN running stats into conv weights for inference
    (y = scale*(conv(x)-mean)/sqrt(var+eps)+bias  ==  conv'(x)+b').
    Returns a new param tree where every conv has a bias and no BN entries."""
    # One batched D2H for the whole tree: folding math is numpy (float64 for
    # parity), and pulling ~550 arrays one np.asarray at a time costs a
    # synchronous ~50 ms tunnel round trip EACH through axon. No-op when the
    # params are already host-side.
    params, state = jax.device_get((params, state))
    folded: Params = {}
    for i, layer in enumerate(spec.layers):
        key = f"layer{i}"
        if key not in params:
            continue
        p = params[key]
        if isinstance(layer, ConvSpec) and layer.batch_normalize:
            st = state[key]
            inv = 1.0 / np.sqrt(np.asarray(st["var"], np.float64) + BN_EPS)
            scale = np.asarray(p["bn_scale"], np.float64) * inv
            w = np.asarray(p["w"], np.float64) * scale[None, None, None, :]
            b = np.asarray(p["bn_bias"], np.float64) - np.asarray(st["mean"], np.float64) * scale
            folded[key] = {"w": jnp.asarray(w, jnp.float32), "b": jnp.asarray(b, jnp.float32)}
        else:
            folded[key] = dict(p)
    return folded


def cast_conv_params(params: Params, dtype=jnp.bfloat16) -> Params:
    """Pre-cast folded conv weights/biases to the serving compute dtype.

    `apply` casts every kernel to the compute dtype inside the graph anyway
    (`_conv`), so serving from pre-cast params is numerically IDENTICAL —
    but it halves the weight bytes read from HBM per step (f32 -> bf16,
    ~256 MB -> 128 MB for the flagship) and deletes the per-call convert
    kernels. Serving only: checkpoints and training stay f32.

    UNFOLDED convs (entries still carrying BN leaves) are left entirely f32:
    the pallas/s2d/fused paths fold BN in-graph as w * rsqrt(var + eps) *
    scale, so a pre-cast unfolded kernel would be rounded BEFORE that fold —
    a double rounding the folded path never sees. Fold with
    `fold_batchnorm` first to cast everything."""
    return {
        k: {kk: (v.astype(dtype)
                 if kk in ("w", "b") and "bn_scale" not in p else v)
            for kk, v in p.items()}
        for k, p in params.items()
    }


def fold_spec(spec: NetSpec) -> NetSpec:
    """Spec matching `fold_batchnorm` output (all convs bias-only)."""
    layers = tuple(
        ConvSpec(l.filters, l.size, l.stride, l.pad, False, l.activation)
        if isinstance(l, ConvSpec) else l
        for l in spec.layers
    )
    return NetSpec(layers=layers, in_channels=spec.in_channels, width=spec.width,
                   height=spec.height, name=spec.name + "_folded")
