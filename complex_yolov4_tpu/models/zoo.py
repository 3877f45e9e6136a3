"""Programmatic model zoo: the four Complex-YOLO topologies built natively.

Each builder emits the exact layer sequence the corresponding reference cfg
defines (reference: src/config/cfg/complex_yolov4.cfg etc.), expressed
structurally (CSP stages, residual blocks, SPP, PANet) instead of a flat cfg
file. `tests/test_models.py::test_zoo_matches_reference_cfg` verifies the emitted NetSpec is identical
to parsing the reference cfg when the reference tree is present.

Anchors are (w, l, yaw) in input pixels; yaw enters the spec as (sin, cos),
mirroring cfg ingestion (reference: src/models/darknet2pytorch.py:381-393).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .spec import (
    ConvSpec,
    MaxPoolSpec,
    NetSpec,
    RouteSpec,
    ShortcutSpec,
    UpsampleSpec,
    YoloSpec,
    anchors_from_wly,
)

# Full anchor sets (w, l, yaw) per family, from the reference cfgs.
ANCHORS_V4 = (
    (11, 15, 0), (10, 24, 0), (11, 25, 0),
    (23, 49, 0), (23, 55, 0), (24, 53, 0),
    (24, 60, 0), (27, 63, 0), (29, 74, 0),
)
ANCHORS_V4_TINY = (
    (11, 15, 0), (11, 25, 0), (23, 49, 0),
    (23, 55, 0), (24, 53, 0), (25, 61, 0),
)
ANCHORS_V3 = (
    (11, 14, -3.14), (11, 14, 0), (11, 14, 3.14),
    (11, 25, -3.14), (11, 25, 0), (11, 25, 3.14),
    (23, 51, -3.14), (23, 51, 0), (23, 51, 3.14),
)
ANCHORS_V3_TINY = (
    (16, 16, -3.14), (16, 16, 0), (16, 16, 3.14),
    (23, 51, -3.14), (23, 51, 0), (23, 51, 3.14),
)


class _Builder:
    """Accumulates layer specs; every emit returns the new layer's index."""

    def __init__(self) -> None:
        self.layers: List = []
        self.stride = 1
        self._strides: List[int] = []

    def _emit(self, spec) -> int:
        self.layers.append(spec)
        self._strides.append(self.stride)
        return len(self.layers) - 1

    def conv(self, filters: int, size: int, stride: int = 1, act: str = "leaky",
             bn: bool = True) -> int:
        self.stride *= stride
        return self._emit(ConvSpec(filters=filters, size=size, stride=stride,
                                   pad=True, batch_normalize=bn, activation=act))

    def maxpool(self, size: int, stride: int) -> int:
        self.stride *= stride
        return self._emit(MaxPoolSpec(size=size, stride=stride))

    def upsample(self, stride: int = 2) -> int:
        self.stride //= stride
        return self._emit(UpsampleSpec(stride=stride))

    def route(self, layers: Sequence[int], groups: int = 1, group_id: int = 0) -> int:
        self.stride = self._strides[layers[0]]
        return self._emit(RouteSpec(layers=tuple(layers), groups=groups, group_id=group_id))

    def shortcut(self, from_index: int, act: str = "linear") -> int:
        return self._emit(ShortcutSpec(from_index=from_index, activation=act))

    def yolo(self, anchors_wly, mask: Sequence[int], num_classes: int,
             scale_x_y: float, ignore_thresh: float = 0.7) -> int:
        all_rows = anchors_from_wly(tuple(anchors_wly))
        return self._emit(YoloSpec(
            anchors=tuple(all_rows[m] for m in mask),
            num_classes=num_classes,
            stride=self.stride,
            scale_x_y=scale_x_y,
            ignore_thresh=ignore_thresh,
        ))


def _csp_stage(b: _Builder, filters: int, blocks: int, first: bool = False) -> int:
    """One CSPDarknet53 stage: strided downsample, two partial paths, `blocks`
    residual units on one path, concat, transition. Returns the transition index."""
    split = filters if first else filters // 2
    inner = filters // 2
    down = b.conv(filters, 3, 2, "mish")
    a = b.conv(split, 1, 1, "mish")
    b.route([down])
    b.conv(split, 1, 1, "mish")
    for _ in range(blocks):
        b.conv(inner, 1, 1, "mish")
        x = b.conv(split, 3, 1, "mish")
        b.shortcut(x - 2)
    tail = b.conv(split, 1, 1, "mish")
    b.route([tail, a])
    return b.conv(filters, 1, 1, "mish")


def _conv_seq(b: _Builder, widths: Sequence[Tuple[int, int]], act: str = "leaky") -> int:
    idx = -1
    for filters, size in widths:
        idx = b.conv(filters, size, 1, act)
    return idx


def complex_yolov4(num_classes: int = 3, width: int = 608, height: int = 608) -> NetSpec:
    """CSPDarknet53 backbone + SPP + PANet neck + 3 Complex-YOLO heads
    (reference: src/config/cfg/complex_yolov4.cfg)."""
    b = _Builder()
    b.conv(32, 3, 1, "mish")
    _csp_stage(b, 64, 1, first=True)
    _csp_stage(b, 128, 2)
    c3 = _csp_stage(b, 256, 8)    # stride 8 transition
    c4 = _csp_stage(b, 512, 8)    # stride 16 transition
    c5 = _csp_stage(b, 1024, 4)   # stride 32 transition

    # SPP
    pre = _conv_seq(b, [(512, 1), (1024, 3), (512, 1)])
    p5 = b.maxpool(5, 1)
    b.route([pre])
    p9 = b.maxpool(9, 1)
    b.route([pre])
    p13 = b.maxpool(13, 1)
    b.route([p13, p9, p5, pre])
    spp = _conv_seq(b, [(512, 1), (1024, 3), (512, 1)])

    # PANet top-down: stride 32 -> 16
    b.conv(256, 1, 1, "leaky")
    up16 = b.upsample(2)
    b.route([c4])
    lat16 = b.conv(256, 1, 1, "leaky")
    b.route([lat16, up16])
    p4_mid = _conv_seq(b, [(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)])

    # stride 16 -> 8
    b.conv(128, 1, 1, "leaky")
    up8 = b.upsample(2)
    b.route([c3])
    lat8 = b.conv(128, 1, 1, "leaky")
    b.route([lat8, up8])
    p3 = _conv_seq(b, [(128, 1), (256, 3), (128, 1), (256, 3), (128, 1)])

    # heads (bottom-up PAN path between them)
    per_head = 3 * (7 + num_classes)
    b.conv(256, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V4, (0, 1, 2), num_classes, scale_x_y=1.2)

    b.route([p3])
    down16 = b.conv(256, 3, 2, "leaky")
    b.route([down16, p4_mid])
    p4 = _conv_seq(b, [(256, 1), (512, 3), (256, 1), (512, 3), (256, 1)])
    b.conv(512, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V4, (3, 4, 5), num_classes, scale_x_y=1.1)

    b.route([p4])
    down32 = b.conv(512, 3, 2, "leaky")
    b.route([down32, spp])
    _conv_seq(b, [(512, 1), (1024, 3), (512, 1), (1024, 3), (512, 1)])
    b.conv(1024, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V4, (6, 7, 8), num_classes, scale_x_y=1.05)

    return NetSpec(layers=tuple(b.layers), in_channels=3, width=width,
                   height=height, name="complex_yolov4").validate()


def _tiny_csp_stage(b: _Builder, filters: int) -> Tuple[int, int]:
    """CSP-tiny stage: full conv, grouped-route half, two convs, concat twice,
    maxpool. Returns (transition_index, pooled_index)."""
    full = b.conv(filters, 3, 1, "leaky")
    b.route([full], groups=2, group_id=1)
    a = b.conv(filters // 2, 3, 1, "leaky")
    c = b.conv(filters // 2, 3, 1, "leaky")
    b.route([c, a])
    trans = b.conv(filters, 1, 1, "leaky")
    b.route([full, trans])
    pooled = b.maxpool(2, 2)
    return trans, pooled


def complex_yolov4_tiny(num_classes: int = 3, width: int = 416, height: int = 416) -> NetSpec:
    """CSPDarknet-tiny backbone + 2 Complex-YOLO heads
    (reference: src/config/cfg/complex_yolov4_tiny.cfg)."""
    b = _Builder()
    per_head = 3 * (7 + num_classes)
    b.conv(32, 3, 2, "leaky")
    b.conv(64, 3, 2, "leaky")
    _tiny_csp_stage(b, 64)
    _tiny_csp_stage(b, 128)
    t256, _ = _tiny_csp_stage(b, 256)
    b.conv(512, 3, 1, "leaky")
    neck = b.conv(256, 1, 1, "leaky")
    b.conv(512, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V4_TINY, (3, 4, 5), num_classes, scale_x_y=1.05)
    b.route([neck])
    b.conv(128, 1, 1, "leaky")
    up = b.upsample(2)
    b.route([up, t256])
    b.conv(256, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V4_TINY, (0, 1, 2), num_classes, scale_x_y=1.05)
    return NetSpec(layers=tuple(b.layers), in_channels=3, width=width,
                   height=height, name="complex_yolov4_tiny").validate()


def _darknet53_stage(b: _Builder, filters: int, blocks: int) -> int:
    idx = b.conv(filters, 3, 2, "leaky")
    for _ in range(blocks):
        b.conv(filters // 2, 1, 1, "leaky")
        x = b.conv(filters, 3, 1, "leaky")
        idx = b.shortcut(x - 2)
    return idx


def complex_yolov3(num_classes: int = 3, width: int = 608, height: int = 608) -> NetSpec:
    """Darknet53 backbone + FPN + 3 Complex-YOLO heads
    (reference: src/config/cfg/complex_yolov3.cfg)."""
    b = _Builder()
    per_head = 3 * (7 + num_classes)
    b.conv(32, 3, 1, "leaky")
    _darknet53_stage(b, 64, 1)
    _darknet53_stage(b, 128, 2)
    c3 = _darknet53_stage(b, 256, 8)
    c4 = _darknet53_stage(b, 512, 8)
    _darknet53_stage(b, 1024, 4)

    _conv_seq(b, [(512, 1), (1024, 3), (512, 1), (1024, 3)])
    h32 = b.conv(512, 1, 1, "leaky")
    b.conv(1024, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V3, (6, 7, 8), num_classes, scale_x_y=1.0)

    b.route([h32])
    b.conv(256, 1, 1, "leaky")
    up = b.upsample(2)
    b.route([up, c4])
    _conv_seq(b, [(256, 1), (512, 3), (256, 1), (512, 3)])
    h16 = b.conv(256, 1, 1, "leaky")
    b.conv(512, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V3, (3, 4, 5), num_classes, scale_x_y=1.0)

    b.route([h16])
    b.conv(128, 1, 1, "leaky")
    up = b.upsample(2)
    b.route([up, c3])
    _conv_seq(b, [(128, 1), (256, 3), (128, 1), (256, 3), (128, 1), (256, 3)])
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V3, (0, 1, 2), num_classes, scale_x_y=1.0)

    return NetSpec(layers=tuple(b.layers), in_channels=3, width=width,
                   height=height, name="complex_yolov3").validate()


def complex_yolov3_tiny(num_classes: int = 3, width: int = 608, height: int = 608) -> NetSpec:
    """Tiny darknet backbone + 2 Complex-YOLO heads
    (reference: src/config/cfg/complex_yolov3_tiny.cfg). Note: the reference
    implementation itself cannot instantiate this cfg (its yolo blocks lack
    scale_x_y and the reference parser raises KeyError); we default it to 1.0."""
    b = _Builder()
    per_head = 3 * (7 + num_classes)
    b.conv(16, 3, 1, "leaky")
    b.maxpool(2, 2)
    b.conv(32, 3, 1, "leaky")
    b.maxpool(2, 2)
    b.conv(64, 3, 1, "leaky")
    b.maxpool(2, 2)
    b.conv(128, 3, 1, "leaky")
    b.maxpool(2, 2)
    c8 = b.conv(256, 3, 1, "leaky")
    b.maxpool(2, 2)
    b.conv(512, 3, 1, "leaky")
    b.maxpool(2, 1)  # darknet replicate-padded, size-preserving pool
    b.conv(1024, 3, 1, "leaky")
    neck = b.conv(256, 1, 1, "leaky")
    b.conv(512, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V3_TINY, (3, 4, 5), num_classes, scale_x_y=1.0)
    b.route([neck])
    b.conv(128, 1, 1, "leaky")
    up = b.upsample(2)
    b.route([up, c8])
    b.conv(256, 3, 1, "leaky")
    b.conv(per_head, 1, 1, "linear", bn=False)
    b.yolo(ANCHORS_V3_TINY, (0, 1, 2), num_classes, scale_x_y=1.0)
    return NetSpec(layers=tuple(b.layers), in_channels=3, width=width,
                   height=height, name="complex_yolov3_tiny").validate()


MODEL_ZOO = {
    "complex_yolov4": complex_yolov4,
    "complex_yolov4_tiny": complex_yolov4_tiny,
    "complex_yolov3": complex_yolov3,
    "complex_yolov3_tiny": complex_yolov3_tiny,
}


def get_model_spec(name: str, num_classes: int = 3, **kw) -> NetSpec:
    if name not in MODEL_ZOO:
        raise KeyError(f"unknown model {name!r}; available: {sorted(MODEL_ZOO)}")
    return MODEL_ZOO[name](num_classes=num_classes, **kw)
