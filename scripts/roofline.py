"""Per-layer roofline for the flagship forward (v5e, batch 16, 608x608).

For every layer of the folded complex_yolov4 spec, computes FLOPs and HBM
bytes (activations in + out + weights) under the bench dtype policy
(bf16 activations; int8 weights/activations for the C_in>=256 quantized
convs), and the per-layer floor time = max(compute, bandwidth):

  compute  = MACs*2 / peak      (bf16 197 TFLOP/s, int8 394 TOPS)
  bandwidth = bytes / 819 GB/s

Two aggregate floors:
  layer-by-layer — every conv round-trips activations through HBM (what XLA
  executes: conv->conv never fuses);
  perfectly-fused — weights + network input read once, head output written
  once (activations VMEM-resident; unreachable ideal, 128 MB VMEM permitting).

This bounds what ANY execution strategy can achieve and what fusion could
buy over XLA's layer-by-layer schedule. Host-only (no TPU needed).
"""

import sys

import numpy as np

from complex_yolov4_tpu.models import get_model_spec
from complex_yolov4_tpu.models import network as net
from complex_yolov4_tpu.models.spec import (
    ConvSpec, MaxPoolSpec, RouteSpec, ShortcutSpec, UpsampleSpec, YoloSpec)

PEAK_BF16 = 197e12
PEAK_INT8 = 394e12
HBM = 819e9
B = 16


def compute_rows(spec, batch=B):
    """Per-layer floor rows under the bench dtype policy. Each row:
    (layer_index, description, macs, bytes, t_compute_s, t_bandwidth_s,
    t_floor_s, is_int8). Importable (scripts/bench_prefix.py compares the
    measured in-network per-layer costs against these floors)."""
    B = batch
    chans = spec.out_channels()
    strides = spec.out_strides()
    size = spec.height

    # bench quant policy: C_in >= 256 convs run int8 (models/quantize.py
    # default_skip keeps stem/small-C/head in bf16)
    rows = []
    prev_c = spec.in_channels
    for i, l in enumerate(spec.layers):
        c_in = prev_c if i == 0 else chans[i - 1]
        if isinstance(l, RouteSpec):
            c_in = chans[i]  # route output is the layer's own channel count
        s = size // strides[i]
        if isinstance(l, ConvSpec):
            cin = chans[i - 1] if i > 0 else spec.in_channels
            h = size // strides[i]
            in_res = size // (strides[i - 1] if i > 0 else 1)
            macs = B * h * h * l.filters * cin * l.size * l.size
            is_int8 = cin >= 256
            act_bytes = 1 if is_int8 else 2
            bytes_ = (B * in_res * in_res * cin * act_bytes   # read input
                      + B * h * h * l.filters * act_bytes     # write output
                      + l.filters * cin * l.size * l.size * (1 if is_int8 else 2))
            t_c = 2 * macs / (PEAK_INT8 if is_int8 else PEAK_BF16)
            t_b = bytes_ / HBM
            rows.append((i, f"conv{l.size}x{l.size}{'s2' if l.stride==2 else ''}"
                         f" {cin}->{l.filters} @{h}",
                         macs, bytes_, t_c, t_b, max(t_c, t_b), is_int8))
        elif isinstance(l, (MaxPoolSpec, UpsampleSpec, ShortcutSpec)):
            h = size // strides[i]
            c = chans[i]
            bytes_ = B * h * h * c * 2 * 2
            rows.append((i, type(l).__name__, 0, bytes_, 0.0, bytes_ / HBM,
                         bytes_ / HBM, False))
        elif isinstance(l, RouteSpec) and len(l.layers) > 1:
            h = size // strides[i]
            c = chans[i]
            bytes_ = B * h * h * c * 2 * 2  # concat: read + write
            rows.append((i, "route-concat", 0, bytes_, 0.0, bytes_ / HBM,
                         bytes_ / HBM, False))
    return rows


def main():
    spec = net.fold_spec(get_model_spec("complex_yolov4"))
    size = spec.height
    chans = spec.out_channels()
    rows = compute_rows(spec, B)

    total_macs = sum(r[2] for r in rows)
    total_floor = sum(r[6] for r in rows)
    total_bw = sum(r[5] for r in rows)
    total_comp = sum(r[4] for r in rows)

    # bucket by resolution
    from collections import defaultdict
    buck = defaultdict(lambda: [0.0, 0.0, 0.0, 0])
    for i, name, macs, bytes_, t_c, t_b, t, q in rows:
        res = name.split("@")[-1] if "@" in name else "other"
        buck[res][0] += t * 1e3
        buck[res][1] += t_c * 1e3
        buck[res][2] += t_b * 1e3
        buck[res][3] += 1

    print(f"batch {B} @ {size}; total conv MACs {total_macs/1e9:.1f} G "
          f"({2*total_macs/1e9/B:.1f} GFLOP/frame)")
    print(f"layer-by-layer floor: {total_floor*1e3:7.2f} ms/batch "
          f"(compute-sum {total_comp*1e3:.2f}, bandwidth-sum {total_bw*1e3:.2f})")
    print("\nper-resolution floors (ms, layer-by-layer):")
    print(f"{'res':>8} {'floor':>8} {'compute':>8} {'bw':>8} {'n':>4}")
    for res in sorted(buck, key=lambda r: -buck[r][0]):
        f, c, bw, n = buck[res]
        print(f"{res:>8} {f:8.2f} {c:8.2f} {bw:8.2f} {n:4d}")

    # perfectly fused ideal
    w_bytes = sum((l.filters * (chans[i-1] if i else spec.in_channels)
                   * l.size * l.size * (1 if (chans[i-1] if i else 3) >= 256 else 2))
                  for i, l in enumerate(spec.layers) if isinstance(l, ConvSpec))
    in_bytes = B * size * size * 3 * 2
    out_bytes = B * 22743 * 10 * 4
    fused_floor = max(total_comp, (w_bytes + in_bytes + out_bytes) / HBM)
    print(f"\nperfectly-fused floor: {fused_floor*1e3:.2f} ms/batch "
          f"(weights {w_bytes/1e6:.0f} MB once)")
    print("\nworst 15 layers by floor time:")
    for r in sorted(rows, key=lambda r: -r[6])[:15]:
        i, name, macs, bytes_, t_c, t_b, t, q = r
        lim = "bw" if t_b > t_c else "mxu"
        print(f"  [{i:3d}] {name:28s} {t*1e3:6.3f} ms ({lim}"
              f"{', int8' if q else ''})")


if __name__ == "__main__":
    main()
