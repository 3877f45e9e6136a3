"""Pallas fused conv3x3 vs XLA conv (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from complex_yolov4_tpu.ops import pallas_conv
from complex_yolov4_tpu.ops.pallas_conv import conv3x3_fused, pick_tile_h, shape_ok

CASES = [
    (2, 256, 32, 64, 1, "mish"),
    (2, 256, 32, 64, 2, "leaky"),
    (1, 512, 64, 128, 2, "mish"),
    (2, 256, 128, 128, 1, "linear"),
]


@pytest.mark.parametrize("b,h,cin,cout,stride,act", CASES)
def test_matches_xla_conv(b, h, cin, cout, stride, act):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (b, h, h, cin)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (cout,)).astype(np.float32))
    got = conv3x3_fused(x, w, bias, stride=stride, activation=act, interpret=True)
    ref = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, (stride, stride), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32) + bias
    if act == "mish":
        ref = ref * jnp.tanh(jax.nn.softplus(ref))
    elif act == "leaky":
        ref = jax.nn.leaky_relu(ref, 0.1)
    assert got.shape == (b, h // stride, h // stride, cout)
    rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))) / (
        float(jnp.max(jnp.abs(ref))) + 1e-9)
    assert rel < 0.01, rel  # bf16 matmul noise only


def test_supported_envelope():
    assert shape_ok(608, 608, 32, 64, 3, 2)
    assert shape_ok(304, 304, 64, 64, 3, 1)
    assert not shape_ok(304, 304, 64, 64, 1, 1)   # 1x1
    assert not shape_ok(76, 76, 256, 256, 3, 1)   # big channels
    assert not shape_ok(100, 100, 64, 64, 3, 1)   # indivisible rows
    assert pick_tile_h(304, 304, 64) in (4, 8, 16, 32)
    # the executor gate respects the module switch
    assert pallas_conv.supported(608, 608, 32, 64, 3, 2) == pallas_conv.ENABLED


def test_network_pallas_path_matches_xla():
    """Full executor with use_pallas_conv (interpret) == XLA path, BN folded."""
    from complex_yolov4_tpu.models import network as net
    from complex_yolov4_tpu.models.spec import ConvSpec, NetSpec, YoloSpec
    from complex_yolov4_tpu.ops import pallas_conv as pc

    spec = NetSpec(
        layers=(
            ConvSpec(32, 3, 1, True, True, "mish"),
            ConvSpec(64, 3, 2, True, True, "leaky"),
            ConvSpec(10, 1, 1, True, False, "linear"),
            YoloSpec(anchors=((16, 32, 0, 1),), num_classes=3, stride=2),
        ),
        in_channels=3, width=256, height=256, name="mini",
    )
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    state = {k: {"mean": v["mean"] + 0.05, "var": v["var"] * 1.2}
             for k, v in state.items()}
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 256, 3))

    ref, _ = net.apply(spec, params, state, x, compute_dtype=jnp.float32,
                       use_pallas_conv=False)

    orig = pc.conv3x3_fused
    import functools as ft

    def interp(*args, **kw):
        kw["interpret"] = True
        return ft.partial(orig, **{})(*args, **kw)

    try:
        net.pallas_conv.conv3x3_fused = interp
        net.pallas_conv.ENABLED = True
        got, _ = net.apply(spec, params, state, x, compute_dtype=jnp.float32,
                           use_pallas_conv=True)
    finally:
        net.pallas_conv.conv3x3_fused = orig
        net.pallas_conv.ENABLED = False
    # bf16 matmul inside the pallas kernel vs f32 XLA path
    assert float(jnp.max(jnp.abs(got - ref))) / float(jnp.max(jnp.abs(ref))) < 0.02
