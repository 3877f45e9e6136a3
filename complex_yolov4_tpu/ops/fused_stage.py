"""Fused CSP-stage execution: one Pallas kernel per backbone stage.

Why: XLA never fuses conv->conv, so every early-backbone layer round-trips
its activations through HBM. At 304^2 x 64ch (stage 2 of CSPDarknet53,
reference src/models/darknet2pytorch.py layer walk) the stage moves ~237 MB
per frame for ~7.6 GFLOP — bandwidth-bound by an order of magnitude. This
module extracts maximal constant-resolution segments of {1x1 conv, 3x3/s1
conv, shortcut, route/concat/CSP-slice} from the typed IR (models/spec.py)
and executes each segment as ONE Pallas kernel: the input row-tile is DMA'd
to VMEM once, every intermediate lives in VMEM, and one output tile is
written back — HBM traffic drops to read-input + write-output.

Kernel structure (per grid step = one row tile of one frame):
- the input block is an overlapping `pl.Element` window with `halo` extra
  rows on each side, where halo = number of 3x3 convs in the segment
  (each 3x3 consumes one valid row per side);
- values shrink symmetrically: a 3x3 turns an h-row value into h-2 rows;
  merge points (shortcut/concat) center-slice operands to the common
  height; by construction the final height is exactly the tile size;
- each 3x3 masks its input rows that fall outside the real image before
  the tap dots (zero padding must be zero AFTER the pointwise prefix, not
  mish(bias)); taps are lane-concatenated per kernel row ky so the MXU
  contraction depth is 3*C_in instead of C_in;
- 1x1 convs are plain (rows*W, C) @ (C, C_out) dots, f32 accumulate,
  bf16 storage, activation fused.

Scope: inference only, stride-1 segments, C <= 128 and W >= 152 (the
lane-starved bandwidth-bound region; later stages run near roofline in XLA
already). Stride-2 transitions, maxpool, upsample and the heads stay XLA.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.spec import ConvSpec, NetSpec, RouteSpec, ShortcutSpec


def _mish(x):
    # Single-transcendental mish (see models.network._act), comparison-free:
    # the v5e VPU has no bf16 compare, and with the exp clamp the saturated
    # branch select is redundant anyway (q/(q+2) -> 1 within 1e-17 of x for
    # x > 20, far below bf16 resolution).
    s = jnp.exp(jnp.minimum(x, 20.0))
    q = s * s + 2.0 * s
    return x * (q / (q + 2.0))


_ACTS = {
    # max-based formulations avoid predicated selects (no bf16 compare).
    "mish": _mish,
    "leaky": lambda x: jnp.maximum(x, x * 0.1),
    "relu": lambda x: jnp.maximum(x, jnp.zeros_like(x)),
    "linear": lambda x: x,
}


@dataclass(frozen=True)
class SegOp:
    """One step of a fused segment. `srcs` index previous ops within the
    segment; -1 is the segment input (output of layer `start - 1`)."""

    kind: str                 # conv1x1 | conv3x3 | shortcut | concat | slice
    srcs: Tuple[int, ...]
    layer_index: int          # absolute index in spec.layers (params lookup)
    activation: str = "linear"
    cin: int = 0
    cout: int = 0
    groups: int = 1
    group_id: int = 0


@dataclass(frozen=True)
class Segment:
    start: int                # first spec layer replaced by the kernel
    end: int                  # last spec layer replaced (inclusive)
    ops: Tuple[SegOp, ...]
    halo: int                 # number of 3x3 convs
    cin: int
    cout: int


_MAX_C = 128
_MIN_W = 152
# bf16 bytes budget for one tile's live values. v5e has 128 MB of physical
# VMEM; the default 16 MB scoped limit is raised via CompilerParams
# (vmem_limit_bytes below). The estimate over-counts (it sums every op's
# full-height value as if all were live), so the budget can sit well above
# the target residency.
_VMEM_VALUE_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT = 110 * 1024 * 1024


def plan_segments(spec: NetSpec, img_size: int) -> List[Segment]:
    """Maximal fusable segments for `spec` at `img_size` input resolution.

    A segment is a run of layers at constant resolution where every layer is
    a stride-1 conv (k=1 or 3), a shortcut, or a route whose references all
    resolve inside the segment or to the segment input, with channel counts
    <= _MAX_C. Runs with fewer than 2 convs aren't worth a kernel launch.
    """
    chans = (spec.in_channels,) + spec.out_channels()
    # Resolution at the INPUT of each layer.
    res = []
    h = img_size
    for layer in spec.layers:
        res.append(h)
        if isinstance(layer, ConvSpec) and layer.stride == 2:
            h //= 2
        elif hasattr(layer, "stride") and getattr(layer, "stride", 1) == 2 \
                and not isinstance(layer, ConvSpec):
            h //= 2
        elif layer.__class__.__name__ == "UpsampleSpec":
            h *= getattr(layer, "stride", 2)

    segments: List[Segment] = []
    i = 1  # layer 0 output is the natural first segment input at earliest
    n = len(spec.layers)
    while i < n:
        seg = _try_segment(spec, chans, res, i)
        if seg is not None:
            segments.append(seg)
            i = seg.end + 1
        else:
            i += 1
    return segments


def _try_segment(spec: NetSpec, chans, res, start: int) -> Optional[Segment]:
    n = len(spec.layers)
    w0 = res[start]
    if w0 < _MIN_W:
        return None
    ops: List[SegOp] = []
    produced: Dict[int, int] = {start - 1: -1}  # spec index -> op id
    convs = halo = 0
    end = start - 1
    j = start
    while j < n:
        layer = spec.layers[j]
        if res[j] != w0:
            break
        if isinstance(layer, ConvSpec):
            if layer.stride != 1 or layer.size not in (1, 3) or not (
                    layer.pad or layer.size == 1):
                break
            if chans[j] > _MAX_C or layer.filters > _MAX_C:
                break
            if layer.activation not in _ACTS:
                break
            src = produced.get(j - 1)
            if src is None:
                break
            ops.append(SegOp(
                kind="conv1x1" if layer.size == 1 else "conv3x3",
                srcs=(src,), layer_index=j, activation=layer.activation,
                cin=chans[j], cout=layer.filters))
            convs += 1
            if layer.size == 3:
                halo += 1
        elif isinstance(layer, ShortcutSpec):
            a = produced.get(j - 1)
            b = produced.get(layer.from_index)
            if a is None or b is None:
                break
            ops.append(SegOp(kind="shortcut", srcs=(a, b), layer_index=j,
                             activation=getattr(layer, "activation", "linear"),
                             cout=chans[j + 1]))
        elif isinstance(layer, RouteSpec):
            srcs = tuple(produced.get(s) for s in layer.layers)
            if any(s is None for s in srcs):
                break
            total_c = sum(chans[s + 1] for s in layer.layers)
            if total_c > _MAX_C and len(srcs) > 1:
                break
            if layer.groups > 1:
                if len(srcs) != 1:
                    break
                ops.append(SegOp(kind="slice", srcs=srcs, layer_index=j,
                                 cin=chans[layer.layers[0] + 1],
                                 cout=chans[j + 1],
                                 groups=layer.groups, group_id=layer.group_id))
            elif len(srcs) == 1:
                ops.append(SegOp(kind="identity", srcs=srcs, layer_index=j,
                                 cout=chans[j + 1]))
            else:
                ops.append(SegOp(kind="concat", srcs=srcs, layer_index=j,
                                 cout=total_c))
        else:
            break
        produced[j] = len(ops) - 1
        end = j
        j += 1

    # Trim trailing non-conv ops: ending a segment on a route/shortcut whose
    # value the next XLA layer needs anyway is fine, but ending on an op
    # whose spec-output is ALSO needed later outside the segment is not —
    # the kernel only materialises the last op. Walk back until the last op
    # is the unique external output.
    while end >= start:
        if not _has_external_reader(spec, start, end):
            break
        end -= 1
        ops.pop()
    convs = sum(1 for o in ops if o.kind in ("conv1x1", "conv3x3"))
    if end - start + 1 < 2 or convs < 2:
        return None
    if not _fits_budget(ops, w0, _halo(ops)):
        return None
    return Segment(start=start, end=end, ops=tuple(ops), halo=_halo(ops),
                   cin=chans[start], cout=ops[-1].cout or chans[end + 1])


def _halo(ops: Sequence[SegOp]) -> int:
    return sum(1 for o in ops if o.kind == "conv3x3")


def _has_external_reader(spec: NetSpec, start: int, end: int) -> bool:
    """True if any layer AFTER `end` reads an output produced strictly
    inside [start, end - 1] (the kernel only materialises layer `end`)."""
    for j in range(end + 1, len(spec.layers)):
        layer = spec.layers[j]
        refs: List[int] = []
        if isinstance(layer, RouteSpec):
            refs = list(layer.layers)
        elif isinstance(layer, ShortcutSpec):
            refs = [layer.from_index]
        for r in refs:
            if start <= r < end:
                return True
    return False


def _fits_budget(ops: Sequence[SegOp], width: int, halo: int) -> bool:
    tile = pick_tile(ops, width, halo)
    return tile is not None


def pick_tile(ops: Sequence[SegOp], width: int, halo: int) -> Optional[int]:
    """Largest row tile that divides the height (== width for square inputs)
    and keeps the sum of live values under budget."""
    for tile in (76, 64, 56, 44, 38, 32, 28, 22, 19, 16, 8):
        if width % tile:
            continue
        h_t = tile + 2 * halo
        total = h_t * width * max(64, 128) * 2  # input value bf16 (padded lanes)
        for op in ops:
            total += h_t * width * max(op.cout, 1) * 2
        if total <= _VMEM_VALUE_BUDGET:
            return tile
    return None


def packed_ok(seg: Segment) -> bool:
    """True if the width-packed (P=2) kernel layout supports this segment:
    every concat feeds only conv1x1s inside the segment (lazy split-weight
    dots), no CSP group slice, and the final op emits a canonical value."""
    concat_ids = {i for i, o in enumerate(seg.ops) if o.kind == "concat"}
    for i, op in enumerate(seg.ops):
        if op.kind == "slice":
            return False
        if op.kind != "conv1x1" and any(s in concat_ids for s in op.srcs):
            return False
    if seg.ops[-1].kind in ("concat", "slice"):
        return False
    return True


def _blkdiag(w: jnp.ndarray) -> jnp.ndarray:
    """(C, D) -> (2C, 2D) block-diagonal [[w, 0], [0, w]]: a 1x1 conv in the
    width-packed domain (even/odd columns live in separate channel halves)."""
    z = jnp.zeros_like(w)
    return jnp.concatenate(
        [jnp.concatenate([w, z], 1), jnp.concatenate([z, w], 1)], 0)


def _pack_tap_row(wky: jnp.ndarray) -> jnp.ndarray:
    """(3, C, D) taps of one kernel row -> (6C, 2D) stacked [A; B; C] block
    weights for the packed u-shift formulation:

      y[2u]   = x[2u-1] W0 + x[2u] W1 + x[2u+1] W2
      y[2u+1] = x[2u]   W0 + x[2u+1] W1 + x[2u+2] W2

    with p[u] = (x[2u] || x[2u+1]):  A = [[0,0],[W0,0]] (from p[u-1]),
    B = [[W1, W0],[W2, W1]] (from p[u]), C = [[0, W2],[0,0]] (from p[u+1])."""
    w0, w1, w2 = wky[0], wky[1], wky[2]
    z = jnp.zeros_like(w0)
    a = jnp.concatenate(
        [jnp.concatenate([z, z], 1), jnp.concatenate([w0, z], 1)], 0)
    b = jnp.concatenate(
        [jnp.concatenate([w1, w0], 1), jnp.concatenate([w2, w1], 1)], 0)
    c = jnp.concatenate(
        [jnp.concatenate([z, w2], 1), jnp.concatenate([z, z], 1)], 0)
    return jnp.concatenate([a, b, c], 0)


def _wb_of(folded_params, layer_index: int):
    if callable(folded_params):
        return folded_params(layer_index)
    p = folded_params[f"layer{layer_index}"]
    return p["w"], p["b"]


def segment_params(seg: Segment, folded_params,
                   layout: str = "plain") -> List[jnp.ndarray]:
    """Flatten the segment's conv weights/biases in op order.

    plain:  1x1 conv -> [(C, C_out) bf16, (1, C_out) f32]; 3x3 conv ->
            [(3*C, C_out) bf16 per ky x3, (1, C_out) f32].
    packed2: 1x1 conv -> [(2C, 2C_out) blockdiag (one per concat source when
            the input is a lazy concat), (1, 2C_out)]; 3x3 conv ->
            [(6C, 2C_out) per ky x3, (1, 2C_out)].
    `folded_params` is either a BN-folded params dict or a callable
    layer_index -> (w_hwio, bias)."""
    packed = layout == "packed2"
    out: List[jnp.ndarray] = []
    for op in seg.ops:
        if op.kind not in ("conv1x1", "conv3x3"):
            continue
        w, b = _wb_of(folded_params, op.layer_index)
        w = jnp.asarray(w)             # HWIO
        b = jnp.asarray(b, jnp.float32).reshape(1, -1)
        if op.kind == "conv1x1":
            w2d = w.reshape(op.cin, op.cout)
            src_op = seg.ops[op.srcs[0]] if op.srcs[0] >= 0 else None
            if src_op is not None and src_op.kind == "concat" and \
                    _concat_is_lazy(seg, op.srcs[0]):
                # Lazy concat: one weight row-block per source; the kernel
                # sums per-source dots instead of materialising the concat.
                off = 0
                for s in src_op.srcs:
                    c_s = seg.ops[s].cout if s >= 0 else seg.cin
                    piece = w2d[off:off + c_s]
                    out.append((_blkdiag(piece) if packed else piece)
                               .astype(jnp.bfloat16))
                    off += c_s
            else:
                out.append((_blkdiag(w2d) if packed else w2d)
                           .astype(jnp.bfloat16))
            out.append(jnp.concatenate([b, b], axis=1) if packed else b)
        else:
            for ky in range(3):
                wk = (_pack_tap_row(w[ky]) if packed
                      else w[ky].reshape(3 * op.cin, op.cout))
                out.append(wk.astype(jnp.bfloat16))
            out.append(jnp.concatenate([b, b], axis=1) if packed else b)
    return out


def _concat_is_lazy(seg: Segment, concat_id: int) -> bool:
    """A concat stays unmaterialised when every consumer is a conv1x1."""
    for op in seg.ops:
        if concat_id in op.srcs and op.kind != "conv1x1":
            return False
    return concat_id != len(seg.ops) - 1  # final op must materialise


def _patch_scratch_shape(seg: Segment, width: int, tile: int, pk: int = 1):
    """Staging buffer for the widest 3x3 in the segment (None without one):
    (rows, width/pk, 3*pk*C) — same bytes in either layout."""
    h_t = tile + 2 * seg.halo
    cmax = max((o.cin for o in seg.ops if o.kind == "conv3x3"), default=0)
    if not cmax:
        return None
    return (h_t, width // pk, 3 * pk * cmax)


def _build_kernel(seg: Segment, width: int, tile: int, pk: int = 1):
    """Kernel closure executing seg.ops on one (tile + 2*halo)-row window.

    pk=2 selects the width-packed layout: adjacent column pairs live in the
    channel dimension, so every value carries 2*C channels and the 64/32-
    channel early-backbone ops fill all 128 VPU lanes / MXU columns. 1x1
    convs use block-diagonal weights, 3x3 convs the [A;B;C] u-shift blocks
    (see _pack_tap_row); the only layout conversions are one reshape at
    entry and one at exit."""
    halo = seg.halo
    h_t = tile + 2 * halo
    w_eff = width // pk
    acts = _ACTS
    has_3x3 = any(o.kind == "conv3x3" for o in seg.ops)
    lazy = {i for i, o in enumerate(seg.ops)
            if o.kind == "concat" and _concat_is_lazy(seg, i)}

    def kernel(x_ref, *refs):
        if has_3x3:
            patch_ref = refs[-1]
            refs = refs[:-1]
        w_refs = refs[:-1]
        o_ref = refs[-1]
        t = pl.program_id(1)
        # vals[i]: (rows_i, w_eff, pk*C) value of op i (input is -1), or a
        # tuple of parts for a lazy concat.
        x = x_ref[0].astype(jnp.bfloat16)
        if pk > 1:
            x = x.reshape(h_t, w_eff, pk * seg.cin)
        vals: Dict[int, Any] = {-1: x}
        wi = 0

        def center(vs):
            hmin = min(v.shape[0] for v in vs)
            return [v[(v.shape[0] - hmin) // 2:
                      (v.shape[0] - hmin) // 2 + hmin] for v in vs]

        for oi, op in enumerate(seg.ops):
            if op.kind == "conv1x1":
                src = vals[op.srcs[0]]
                parts = center(list(src)) if isinstance(src, tuple) else [src]
                h = parts[0].shape[0]
                acc = None
                for p_v in parts:
                    y = jnp.dot(p_v.reshape(h * w_eff, p_v.shape[-1]),
                                w_refs[wi][:],
                                preferred_element_type=jnp.float32)
                    wi += 1
                    acc = y if acc is None else acc + y
                b2d = w_refs[wi][:]
                wi += 1
                # bf16 epilogue (cast the f32 accumulator first): halves the
                # VPU cost of the activation and matches the XLA inference
                # path's bf16 bias/act semantics (network.apply).
                y = acts[op.activation]((acc + b2d).astype(jnp.bfloat16))
                vals[oi] = y.reshape(h, w_eff, pk * op.cout)
            elif op.kind == "conv3x3":
                v = vals[op.srcs[0]]
                h = v.shape[0]
                # Zero rows outside the real image: the window's halo rows at
                # the first/last tile hold pointwise(0-pad) garbage, and the
                # conv's zero padding must be zero HERE, not at the input.
                d = (h_t - h) // 2
                gr = (jax.lax.broadcasted_iota(jnp.int32, (h, 1, 1), 0)
                      + t * tile - halo + d)
                # multiply-mask: i32 compares are native, bf16 selects aren't
                v = v * ((gr >= 0) & (gr < width)).astype(v.dtype)
                vp = jnp.pad(v, ((0, 0), (1, 1), (0, 0)))
                # Stage the 3 shifted taps into VMEM scratch: the shifted
                # slices carry mismatched sublane offsets that Mosaic can
                # neither lane-concat nor (for bf16) roll, but stores
                # normalise the layout. One staging pass serves all 3 ky row
                # windows, giving K = 3*pk*C_in dots for the MXU.
                c = pk * op.cin
                for kx in range(3):
                    patch_ref[:h, :, kx * c:(kx + 1) * c] = vp[:, kx:kx + w_eff, :]
                b2d = w_refs[wi + 3][:]
                acc = None
                for ky in range(3):
                    patch = patch_ref[ky:ky + h - 2, :, :3 * c]
                    y = jnp.dot(patch.reshape((h - 2) * w_eff, 3 * c),
                                w_refs[wi + ky][:],
                                preferred_element_type=jnp.float32)
                    acc = y if acc is None else acc + y
                wi += 4
                y = acts[op.activation]((acc + b2d).astype(jnp.bfloat16))
                vals[oi] = y.reshape(h - 2, w_eff, pk * op.cout)
            elif op.kind == "shortcut":
                a, b = center([vals[op.srcs[0]], vals[op.srcs[1]]])
                vals[oi] = acts[op.activation](a + b).astype(jnp.bfloat16)
            elif op.kind == "concat":
                vs = center([vals[s] for s in op.srcs])
                if oi in lazy:
                    vals[oi] = tuple(vs)
                else:
                    assert pk == 1, "materialised concat needs plain layout"
                    vals[oi] = jnp.concatenate(vs, axis=-1)
            elif op.kind == "slice":
                assert pk == 1, "CSP slice needs plain layout"
                v = vals[op.srcs[0]]
                c = v.shape[-1] // op.groups
                vals[oi] = v[..., op.group_id * c:(op.group_id + 1) * c]
            elif op.kind == "identity":
                vals[oi] = vals[op.srcs[0]]
            else:  # pragma: no cover
                raise AssertionError(op.kind)

        out = vals[len(seg.ops) - 1]
        m = (out.shape[0] - tile) // 2
        if m:
            out = out[m:m + tile]
        if pk > 1:
            out = out.reshape(tile, width, seg.cout)
        o_ref[0] = out.astype(o_ref.dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=(
    "seg", "width", "interpret", "tile", "layout"))
def apply_segment(
    seg: Segment,
    x: jnp.ndarray,
    params: Sequence[jnp.ndarray],
    *,
    width: int,
    interpret: Optional[bool] = None,
    tile: Optional[int] = None,
    layout: str = "plain",
) -> jnp.ndarray:
    """Run one fused segment: x (B, H, W, C_in) -> (B, H, W, C_out).

    `params` must come from segment_params(seg, ..., layout=layout)."""
    if interpret is None:  # Mosaic only targets TPU; interpret elsewhere
        interpret = jax.default_backend() not in ("tpu", "axon")
    pk = 2 if layout == "packed2" else 1
    assert pk == 1 or (packed_ok(seg) and width % 2 == 0), layout
    b_sz, h, w_in, c_in = x.shape
    assert h == width and w_in == width, (x.shape, width)
    if tile is None:
        tile = pick_tile(seg.ops, width, seg.halo)
    assert tile is not None and width % tile == 0
    halo = seg.halo
    h_t = tile + 2 * halo
    xp = jnp.pad(x, ((0, 0), (halo, halo), (0, 0), (0, 0)))

    kernel = _build_kernel(seg, width, tile, pk)
    grid = (b_sz, h // tile)
    in_specs = [
        pl.BlockSpec(
            (pl.Element(1), pl.Element(h_t), pl.Element(w_in), pl.Element(c_in)),
            lambda b, t: (b, t * tile, 0, 0),
        ),
    ] + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in params]
    pshape = _patch_scratch_shape(seg, width, tile, pk)
    scratch = [pltpu.VMEM(pshape, jnp.bfloat16)] if pshape else []
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tile, w_in, seg.cout),
                               lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b_sz, h, w_in, seg.cout), x.dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(xp, *params)
