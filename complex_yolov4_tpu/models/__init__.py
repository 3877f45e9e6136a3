from .spec import (
    ConvSpec, MaxPoolSpec, NetSpec, RouteSpec, ShortcutSpec, UpsampleSpec, YoloSpec,
)
from .zoo import MODEL_ZOO, get_model_spec
from .darknet_cfg import netspec_from_cfg
