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


def packed_rows(spec, batch=B, p=2):
    """Per-layer floors for the SHIPPED packed program (bpack=p over the
    early segment, int8 C_in>=256 elsewhere — VERDICT r4 #3).

    Two floors per conv:
      physics  — true MACs at peak + real HBM bytes (hardware speed of
                 light; packing multiplies weight bytes by p^2 inside the
                 segment — block-diagonal kernels — but weights are
                 negligible next to early activations).
      lowering — XLA:TPU's conv algorithm is fixed: k*k per-tap matmuls
                 whose channel dims pad to the 128-lane MXU tile (the r4
                 attribution's confirmed mechanism). This floor prices the
                 PADDED FLOPs at full hardware peak — the best any
                 execution of XLA's lowering could do. Packing exists
                 precisely to shrink this number (p frames share one
                 padded pass).
    Rows: (idx, desc, t_physics_s, t_lowering_s, t_bw_s, is_int8,
    in_segment)."""
    from complex_yolov4_tpu.models import bpack as bpack_mod

    chans = (spec.in_channels,) + spec.out_channels()
    strides = spec.out_strides()
    size = spec.height
    quant_keys = [f"layer{i}" for i, l in enumerate(spec.layers)
                  if isinstance(l, ConvSpec) and chans[i] >= 256]
    seg = bpack_mod.plan_segment(spec, p, quant_keys) if p and p > 1 else None
    seg_end = seg[1] if seg else -1

    def tiles(c):
        return -(-c // 128)

    rows = []
    for i, l in enumerate(spec.layers):
        in_seg = seg is not None and i <= seg_end
        h = size // strides[i]
        if isinstance(l, ConvSpec):
            cin = chans[i]
            n = l.filters
            real_macs = batch * h * h * n * cin * l.size * l.size
            is_int8 = cin >= 256 and not in_seg
            peak = PEAK_INT8 if is_int8 else PEAK_BF16
            act_b = 1 if is_int8 else 2
            in_res = size // (strides[i - 1] if i > 0 else 1)
            w_mult = p * p if in_seg else 1
            bytes_ = (batch * in_res * in_res * cin * act_b
                      + batch * h * h * n * act_b
                      + n * cin * l.size * l.size * act_b * w_mult)
            t_phys = max(2 * real_macs / peak, bytes_ / HBM)
            # padded-tile FLOPs of the lowering actually executed
            b_eff = batch // p if in_seg else batch
            c_eff = (p * cin) if in_seg else cin
            n_eff = (p * n) if in_seg else n
            pad_macs = (b_eff * h * h * l.size * l.size
                        * tiles(c_eff) * 128 * tiles(n_eff) * 128)
            t_low = max(2 * pad_macs / peak, bytes_ / HBM)
            rows.append((i, f"conv{l.size}x{l.size}"
                         f"{'s2' if l.stride == 2 else ''} {cin}->{n} @{h}",
                         t_phys, t_low, bytes_ / HBM, is_int8, in_seg))
        elif isinstance(l, (MaxPoolSpec, UpsampleSpec, ShortcutSpec)):
            bytes_ = batch * h * h * chans[i + 1] * 2 * 2
            t = bytes_ / HBM
            rows.append((i, type(l).__name__, t, t, t, False, in_seg))
        elif isinstance(l, RouteSpec) and len(l.layers) > 1:
            bytes_ = batch * h * h * chans[i + 1] * 2 * 2
            t = bytes_ / HBM
            rows.append((i, "route-concat", t, t, t, False, in_seg))
    return rows, seg


def main_packed(p=2, raster_ms=4.4, nms_ms=1.4):
    """The VERDICT r4 #3 artifact: floors for the shipped packed program and
    the resulting credible e2e ceiling with today's measured tails."""
    spec = net.fold_spec(get_model_spec("complex_yolov4"))
    rows, seg = packed_rows(spec, B, p)
    conv_rows = [r for r in rows if r[1].startswith("conv")]
    sum_phys = sum(r[2] for r in rows)
    sum_low = sum(r[3] for r in rows)
    print(f"packed program: bpack={p} segment={seg}, int8 C_in>=256 outside; "
          f"batch {B} @ {spec.height}")
    print(f"physics floor  (true FLOPs @ peak + HBM): {sum_phys*1e3:7.2f} ms/batch")
    print(f"lowering floor (padded tiles @ peak)    : {sum_low*1e3:7.2f} ms/batch")
    for name, s in (("physics", sum_phys), ("lowering", sum_low)):
        e2e = s + (raster_ms + nms_ms) / 1e3
        print(f"e2e ceiling @ {name} floor + raster {raster_ms} ms "
              f"+ NMS {nms_ms} ms: {e2e*1e3:6.2f} ms = {B/e2e:6.0f} f/s/chip")
    print("\nworst 15 layers by LOWERING floor (the binding model):")
    for r in sorted(conv_rows, key=lambda r: -r[3])[:15]:
        i, name, t_p, t_l, t_b, q, in_seg = r
        print(f"  [{i:3d}] {name:28s} low {t_l*1e3:6.3f} phys {t_p*1e3:6.3f} "
              f"bw {t_b*1e3:6.3f} ms{' int8' if q else ''}"
              f"{' packed' if in_seg else ''}")


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
    if "--bpack" in sys.argv:
        main_packed(p=int(sys.argv[sys.argv.index("--bpack") + 1]))
    else:
        main()
