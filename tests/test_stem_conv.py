"""Pallas stem conv (ops/stem_conv.py) vs the XLA conv path.

Reference behavior under test: conv0 of the darknet backbone — 3x3 stride-1
SAME conv + bias + activation (reference src/models/darknet2pytorch.py:
259-264 builds it from the cfg; the kernel replaces only the schedule, never
the math). Interpret mode (CPU) checks numerics; the chip run is benched
separately (scripts/bench_stem.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from complex_yolov4_tpu.ops import stem_conv


def _ref(x, w, bias, activation):
    """The executor's plain inference path for a folded conv: bf16 conv with
    f32 MXU accumulation, then bias + activation."""
    y = jax.lax.conv_general_dilated(
        x.astype(jnp.bfloat16).astype(jnp.float32),
        w.astype(jnp.bfloat16).astype(jnp.float32),
        window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    y = y + bias.astype(jnp.float32)
    return np.asarray(stem_conv._ACTS[activation](y))


@pytest.mark.parametrize("c_in,c_out,activation", [
    (3, 32, "mish"),       # unpacked conv0
    (6, 64, "leaky"),      # batch-packed p=2 conv0 shape
    (12, 128, "linear"),   # p=4 shape, K=108 near the MXU tile edge
])
def test_stem_kernel_matches_xla(c_in, c_out, activation):
    rng = np.random.default_rng(c_in)
    b, h, w_in = 2, 16, 160  # w >= 128 (kernel envelope), h % 8 == 0
    x = rng.standard_normal((b, h, w_in, c_in)).astype(np.float32)
    w = (rng.standard_normal((3, 3, c_in, c_out)) * 0.2).astype(np.float32)
    bias = rng.standard_normal(c_out).astype(np.float32)

    assert stem_conv.supported(h, w_in, c_in, c_out, 3, 1, activation)
    y = stem_conv.conv3x3_stem(jnp.asarray(x), jnp.asarray(w),
                               jnp.asarray(bias), activation=activation,
                               interpret=True)
    assert y.dtype == jnp.bfloat16
    ref = _ref(x, w, bias, activation)
    # Same math, different accumulation order + f32 (not bf16) epilogue:
    # agree to bf16 resolution. Edge rows/columns included — the width-padded
    # input block must reproduce SAME-padding zeros exactly.
    np.testing.assert_allclose(np.asarray(y, np.float32), ref,
                               rtol=2e-2, atol=2e-2)


def test_stem_kernel_edge_columns_exact():
    """SAME zeros at the borders: an all-ones input makes padding mistakes
    show up as exact integer differences."""
    c_in, c_out = 3, 8
    x = np.ones((1, 8, 128, c_in), np.float32)
    w = np.ones((3, 3, c_in, c_out), np.float32)
    bias = np.zeros(c_out, np.float32)
    y = np.asarray(stem_conv.conv3x3_stem(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(bias),
        activation="linear", interpret=True), np.float32)
    assert y[0, 4, 64, 0] == 27.0          # interior: 9 taps * 3 channels
    assert y[0, 4, 0, 0] == 18.0           # left edge: 6 taps live
    assert y[0, 4, 127, 0] == 18.0         # right edge
    assert y[0, 0, 0, 0] == 12.0           # corner: 4 taps live
    assert y[0, 7, 127, 0] == 12.0


@pytest.mark.parametrize("bpack", [None, 2])
def test_stem_in_executor(bpack):
    """network.apply(stem_pallas=True) == the plain path on the real conv0
    weights (packed and unpacked), truncated after layer 0."""
    from complex_yolov4_tpu.models import get_model_spec
    from complex_yolov4_tpu.models import network as net

    spec = get_model_spec("complex_yolov4")
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    rng = np.random.default_rng(0)
    # Small H/W (multiple of 8, >= 128 wide) keeps interpret mode fast.
    x = jnp.asarray(rng.random((2, 16, 128, 3)), jnp.float32)

    plain, _ = net.apply(fspec, fparams, {}, x, stop_after=0,
                         stem_pallas=False, use_pallas_conv=False,
                         batch_pack=bpack)
    with pltpu.force_tpu_interpret_mode():
        fused, _ = net.apply(fspec, fparams, {}, x, stop_after=0,
                             stem_pallas=True, use_pallas_conv=False,
                             batch_pack=bpack)
    assert len(plain) == len(fused) == 1
    np.testing.assert_allclose(
        np.asarray(fused[0], np.float32), np.asarray(plain[0], np.float32),
        rtol=2e-2, atol=2e-2)
