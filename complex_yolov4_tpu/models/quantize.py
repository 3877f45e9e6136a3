"""Post-training int8 quantization for the inference conv path.

v5e's int8 MXU path peaks at 394 TOPS (2x bf16), and int8 halves HBM
traffic on the bandwidth-bound layers; the per-shape sweep
(scripts/bench_convs.py, PERF.md) measured ~1.8-2x on most conv shapes.

Scheme (production-standard symmetric PTQ):
- weights: per-output-channel symmetric int8, s_w[oc] = maxabs(w[..,oc])/127,
  computed offline from BN-folded weights;
- activations: per-conv-input symmetric int8, s_x = calibrated maxabs / 127
  (running max over calibration batches, `calibrate`);
- conv: y_i32 = conv(x_i8, w_i8) on the int8 MXU path; the epilogue fuses
  dequant (s_x * s_w[oc]), bias, activation, and the bf16 cast. Inter-layer
  tensors stay bf16, so routes/shortcuts/maxpool/decode are untouched and
  each conv quantizes its own input (one fused VPU pass).

Per-layer selection matters (measured, PERF.md coverage sweep): only the
late backbone/neck convs with C_in >= 256 pay off in-network — that subset
captures the full e2e win, while quantizing every conv regresses 22%
(layout transitions around small-C int8 convs). `default_skip` encodes
that; callers can override with an explicit skip set. A conv absent from
the quant tree simply falls back to the standard path in `network.apply`.

Chained int8 (`chain_set`): where a quantized conv's sole consumer is the
next quantized conv, the producer's epilogue requantizes directly to the
consumer's int8 domain, skipping the bf16 round trip through HBM.

The reference has no quantization story (torch 1.5 era, GPU fp32/fp16);
this is a TPU-native serving feature, accuracy-gated by the mAP harness
(cli.evaluate --quantize int8 vs bf16 on the same checkpoint).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spec import ConvSpec, NetSpec, RouteSpec, ShortcutSpec, YoloSpec

Params = Dict[str, Any]


def consumers(spec: NetSpec) -> Dict[int, Set[int]]:
    """Layer index -> set of layer indices that read its output tensor.

    Sequential layers consume the previous output except RouteSpec (which
    reads only its listed sources); ShortcutSpec reads both the previous
    output and `from_index` (mirrors the liveness walk in network.apply)."""
    out: Dict[int, Set[int]] = {i: set() for i in range(len(spec.layers))}
    for j, layer in enumerate(spec.layers):
        if isinstance(layer, RouteSpec):
            for s in layer.layers:
                out[s].add(j)
            continue
        if isinstance(layer, ShortcutSpec):
            out[layer.from_index].add(j)
        if j > 0:
            out[j - 1].add(j)
    return out


def chain_set(spec: NetSpec, quant_keys) -> Set[int]:
    """Indices i whose output can stay int8: conv i and conv i+1 are both
    quantized and i+1 is the SOLE consumer of i's output, so the producer's
    epilogue can requantize directly with the consumer's s_x (no bf16
    round trip through HBM between them)."""
    keys = set(quant_keys)
    cons = consumers(spec)
    out: Set[int] = set()
    for i, layer in enumerate(spec.layers[:-1]):
        if (isinstance(layer, ConvSpec)
                and isinstance(spec.layers[i + 1], ConvSpec)
                and f"layer{i}" in keys and f"layer{i + 1}" in keys
                and cons[i] == {i + 1}):
            out.add(i)
    return out


def head_conv_indices(spec: NetSpec) -> Set[int]:
    """Indices of convs feeding a YOLO head directly."""
    out = set()
    for i, layer in enumerate(spec.layers):
        if isinstance(layer, YoloSpec) and i > 0:
            out.add(i - 1)
    return out


def default_skip(spec: NetSpec) -> Set[int]:
    """Convs kept in bf16 by default: everything with C_in < 256 plus the
    head convs. The in-network coverage sweep (PERF.md) measured that
    quantizing ONLY the late C_in >= 256 convs captures the entire e2e int8
    win (413 vs 412 f/s for the wider heuristic) while quantizing everything
    REGRESSES 22% (323 f/s) — small-C int8 convs lose their isolated gains
    to layout transitions in-network. Fewer quantized layers also means less
    accuracy risk."""
    chans = (spec.in_channels,) + spec.out_channels()
    skip = {0} | head_conv_indices(spec)
    for i, layer in enumerate(spec.layers):
        if isinstance(layer, ConvSpec) and chans[i] < 256:
            skip.add(i)
    return skip


def quantize_weights(
    spec: NetSpec,
    folded_params: Params,
    skip: Optional[Set[int]] = None,
) -> Params:
    """BN-folded params -> per-layer {w_i8 (HWIO), w_scale (cout,), b (cout,)}.
    Layers in `skip` (default `default_skip`) are omitted."""
    if skip is None:
        skip = default_skip(spec)
    # Batch the D2H: per-array np.asarray costs one synchronous tunnel round
    # trip each on axon (no-op for host-side trees).
    folded_params = jax.device_get(folded_params)
    out: Params = {}
    for i, layer in enumerate(spec.layers):
        key = f"layer{i}"
        if not isinstance(layer, ConvSpec) or i in skip or key not in folded_params:
            continue
        p = folded_params[key]
        if "b" not in p:
            raise ValueError(
                f"{key}: quantize_weights needs BN-folded params (fold_batchnorm)")
        w = np.asarray(p["w"], np.float32)
        s_w = np.maximum(np.abs(w).reshape(-1, w.shape[-1]).max(axis=0), 1e-12) / 127.0
        w_i8 = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
        out[key] = {
            "w_i8": jnp.asarray(w_i8),
            "w_scale": jnp.asarray(s_w, jnp.float32),
            "b": jnp.asarray(np.asarray(p["b"], np.float32)),
        }
    return out


def calibrate(
    spec: NetSpec,
    folded_params: Params,
    batches: Iterable[np.ndarray],
    *,
    compute_dtype=jnp.bfloat16,
) -> Dict[str, float]:
    """Run the bf16 network over calibration batches and record the running
    max |conv input| per layer. Returns {layer_key: max_abs}."""
    from . import network as net  # local import to avoid a cycle

    fspec = spec
    # params must be an ARGUMENT of the jitted fn, not a closure constant:
    # closing over them embeds every weight as a literal in the compiled
    # program, which blows up remote compiles through the axon tunnel
    # (same anti-pattern evaluation/evaluator.py documents).
    run = jax.jit(lambda p, x: net.apply(
        fspec, p, {}, x, compute_dtype=compute_dtype,
        use_pallas_conv=False, capture_act_max=True)[-1])
    # Upload the (host numpy, post-fold) weight tree ONCE: jit re-transfers
    # numpy arguments per call, and each re-upload of ~100 MB of weights
    # costs minutes through a slow H2D link when calib_batches > 1.
    folded_params = jax.device_put(folded_params)
    acc: Dict[str, float] = {}
    for batch in batches:
        maxes = jax.device_get(run(folded_params, jnp.asarray(batch)))
        for k, v in maxes.items():
            acc[k] = max(acc.get(k, 0.0), float(v))
    return acc


def make_quant(
    spec: NetSpec,
    folded_params: Params,
    act_max: Dict[str, float],
    *,
    skip: Optional[Set[int]] = None,
) -> Dict[str, Any]:
    """Assemble the quant tree consumed by `network.apply(..., quant=...)`:
    {layer_key: {w_i8, w_scale, b, s_x}}."""
    wq = quantize_weights(spec, folded_params, skip)
    out: Dict[str, Any] = {}
    for key, entry in wq.items():
        if key not in act_max:
            continue  # never observed in calibration (shouldn't happen)
        s_x = max(float(act_max[key]), 1e-12) / 127.0
        out[key] = dict(entry, s_x=jnp.float32(s_x))
    return out


def quantize_model(
    spec: NetSpec,
    folded_params: Params,
    batches: Sequence[np.ndarray],
    *,
    skip: Optional[Set[int]] = None,
    compute_dtype=jnp.bfloat16,
) -> Dict[str, Any]:
    """One-call PTQ: calibrate + quantize. `batches` are (B, H, W, 3) BEV
    rasters (a handful of real or synthetic frames suffices)."""
    act_max = calibrate(spec, folded_params, batches, compute_dtype=compute_dtype)
    return make_quant(spec, folded_params, act_max, skip=skip)
