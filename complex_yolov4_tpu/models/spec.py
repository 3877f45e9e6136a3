"""Typed layer IR for darknet-style detection networks.

Instead of interpreting a list of raw cfg dicts on every forward pass
(reference: src/models/darknet2pytorch.py:162-230), the network topology is a
static, validated tuple of layer specs. The forward interpreter in
`models.network` walks this IR once at trace time; XLA sees a single fused
graph with no per-layer Python overhead at run time.

Route / shortcut references are resolved to absolute layer indices at spec
construction time, so the IR is position-independent and trivially analyzable
(e.g. for liveness or sharding decisions).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple, Union


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    """2-D convolution (+ optional BatchNorm) (+ activation).

    Mirrors the darknet [convolutional] block semantics
    (reference: src/models/darknet2pytorch.py:247-278).
    """

    filters: int
    size: int
    stride: int = 1
    pad: bool = True  # darknet pad flag: (size-1)//2 symmetric padding when set
    batch_normalize: bool = True
    activation: str = "leaky"  # mish | leaky | relu | linear

    def out_channels(self, in_channels: int) -> int:
        return self.filters


@dataclasses.dataclass(frozen=True)
class MaxPoolSpec:
    """Max pooling with darknet padding semantics.

    Three variants, matching the reference's dispatch
    (reference: src/models/darknet2pytorch.py:279-291):
      - stride == size: plain VALID pooling
      - stride == 1 and odd size: SAME padding with -inf fill (SPP pools)
      - otherwise: darknet's asymmetric replicate padding ("MaxPoolDark")
    """

    size: int
    stride: int


@dataclasses.dataclass(frozen=True)
class RouteSpec:
    """Concatenate (or slice) earlier layer outputs along channels.

    `layers` holds absolute layer indices. With a single source and
    `groups > 1`, emits channel group `group_id` of that source (the CSP
    partial-channel route; reference: src/models/darknet2pytorch.py:183-192).
    """

    layers: Tuple[int, ...]
    groups: int = 1
    group_id: int = 0


@dataclasses.dataclass(frozen=True)
class ShortcutSpec:
    """Residual add with the output of absolute layer `from_index`."""

    from_index: int
    activation: str = "linear"


@dataclasses.dataclass(frozen=True)
class UpsampleSpec:
    """Nearest-neighbor spatial upsampling by integer factor `stride`."""

    stride: int


@dataclasses.dataclass(frozen=True)
class YoloSpec:
    """Complex-YOLO detection head.

    `anchors` are the head's own (w, l, im, re) rows in *input-pixel* units —
    the masked subset of the cfg's full anchor list, with yaw pre-converted to
    (sin, cos) exactly like the reference
    (reference: src/models/darknet2pytorch.py:381-393). `stride` is the
    cumulative downsampling factor at this head.
    """

    anchors: Tuple[Tuple[float, float, float, float], ...]
    num_classes: int
    stride: int
    scale_x_y: float = 1.0
    ignore_thresh: float = 0.7

    @property
    def num_anchors(self) -> int:
        return len(self.anchors)


LayerSpec = Union[ConvSpec, MaxPoolSpec, RouteSpec, ShortcutSpec, UpsampleSpec, YoloSpec]


@dataclasses.dataclass(frozen=True)
class NetSpec:
    """A full network: input geometry + ordered layer specs."""

    layers: Tuple[LayerSpec, ...]
    in_channels: int = 3
    width: int = 608
    height: int = 608
    name: str = "net"

    @property
    def yolo_indices(self) -> Tuple[int, ...]:
        return tuple(i for i, l in enumerate(self.layers) if isinstance(l, YoloSpec))

    @property
    def num_classes(self) -> int:
        for l in self.layers:
            if isinstance(l, YoloSpec):
                return l.num_classes
        raise ValueError("NetSpec has no yolo head")

    def out_channels(self) -> Tuple[int, ...]:
        """Per-layer output channel counts (mirrors create_network bookkeeping,
        reference: src/models/darknet2pytorch.py:235-401)."""
        chans = []
        prev = self.in_channels
        for i, l in enumerate(self.layers):
            if isinstance(l, ConvSpec):
                prev = l.filters
            elif isinstance(l, RouteSpec):
                if len(l.layers) == 1:
                    prev = chans[l.layers[0]] // l.groups
                else:
                    prev = sum(chans[j] for j in l.layers)
            elif isinstance(l, (MaxPoolSpec, UpsampleSpec, ShortcutSpec, YoloSpec)):
                prev = chans[i - 1] if i > 0 else prev
            chans.append(prev)
        return tuple(chans)

    def out_strides(self) -> Tuple[int, ...]:
        """Per-layer cumulative stride (input pixels per activation cell)."""
        strides = []
        prev = 1
        for i, l in enumerate(self.layers):
            if isinstance(l, ConvSpec):
                prev = prev * l.stride
            elif isinstance(l, MaxPoolSpec):
                prev = prev * l.stride
            elif isinstance(l, UpsampleSpec):
                prev = prev // l.stride
            elif isinstance(l, RouteSpec):
                prev = strides[l.layers[0]]
            elif isinstance(l, (ShortcutSpec, YoloSpec)):
                prev = strides[i - 1] if i > 0 else prev
            strides.append(prev)
        return tuple(strides)

    def num_boxes(self, img_size: Optional[int] = None) -> int:
        """Total decoded boxes per image at a given input size (22743 at 608
        for complex-yolov4; reference: README 'concatenates decoded heads')."""
        size = img_size or self.height
        total = 0
        for i, l in enumerate(self.layers):
            if isinstance(l, YoloSpec):
                g = size // l.stride
                total += l.num_anchors * g * g
        return total

    def validate(self) -> "NetSpec":
        n = len(self.layers)
        for i, l in enumerate(self.layers):
            if isinstance(l, RouteSpec):
                for j in l.layers:
                    if not (0 <= j < i):
                        raise ValueError(f"route at layer {i} references layer {j}")
                if l.groups > 1 and len(l.layers) != 1:
                    raise ValueError(f"grouped route at layer {i} must have 1 source")
            if isinstance(l, ShortcutSpec) and not (0 <= l.from_index < i):
                raise ValueError(f"shortcut at layer {i} references layer {l.from_index}")
        if n == 0:
            raise ValueError("empty NetSpec")
        return self


def spec_summary(spec: NetSpec) -> str:
    """Layer-by-layer table (parity with the reference's print_cfg,
    src/models/darknet_utils.py:50-93): index, type, filters, output size."""
    chans = spec.out_channels()
    strides = spec.out_strides()
    lines = [f"{'idx':>4} {'type':<10} {'filters':>8} {'size':>12}"]
    for i, l in enumerate(spec.layers):
        size = spec.height // strides[i]
        kind = type(l).__name__.replace("Spec", "").lower()
        lines.append(f"{i:>4} {kind:<10} {chans[i]:>8} {size:>5} x {size:<5}")
    return "\n".join(lines)


def anchors_from_wly(wly: Tuple[Tuple[float, float, float], ...]) -> Tuple[Tuple[float, float, float, float], ...]:
    """(w, l, yaw) anchor triples -> (w, l, sin yaw, cos yaw) rows, matching the
    cfg ingestion at reference: src/models/darknet2pytorch.py:382-385."""
    return tuple((w, l, math.sin(yaw), math.cos(yaw)) for (w, l, yaw) in wly)
