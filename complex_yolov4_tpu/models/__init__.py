from .spec import (
    ConvSpec, MaxPoolSpec, NetSpec, RouteSpec, ShortcutSpec, UpsampleSpec, YoloSpec,
)
from .zoo import MODEL_ZOO, get_model_spec
from .darknet_cfg import netspec_from_cfg
from . import network, weights_io
from .yolo_head import decode_head
