"""Rational mish approximation (network.py::_act mish_approx — PERF.md
lever #6, gated by scripts/gate_mish.py before any default flip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from complex_yolov4_tpu.models import get_model_spec
from complex_yolov4_tpu.models import network as net


def _mish_exact(x):
    return x * np.tanh(np.log1p(np.exp(x)))


def test_pointwise_error_budget():
    # The fit's documented bound: max |mish - approx| <= 4e-3 everywhere
    # (f32 evaluation; [-12, 4] rational, linear/zero tails).
    x = np.linspace(-40.0, 40.0, 400001).astype(np.float32)
    y = np.asarray(net._act(jnp.asarray(x), "mish", mish_approx=True))
    ref = _mish_exact(x.astype(np.float64))
    assert np.max(np.abs(y - ref)) < 4e-3


def test_bf16_error_no_worse_than_exact_path():
    # In the serving dtype (bf16 in/out) the approx path must sit within the
    # same distance of true mish as the exact-formula path's own bf16
    # rounding: fit error (4e-3) + 2 bf16 ulp. (Pairwise approx-vs-exact
    # comparison is meaningless at this precision — the exact formula's
    # bf16 exp/divide already round 1-2 ulp.)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 2, 8192), jnp.bfloat16)
    ref = _mish_exact(np.asarray(x, np.float64))
    tol = 4e-3 + np.abs(ref) * 2.0 ** -6  # fit budget + 2 ulp
    for approx in (True, False):
        y = np.asarray(net._act(x, "mish", mish_approx=approx)
                       .astype(jnp.bfloat16), np.float64)
        worst = np.max(np.abs(y - ref) - tol)
        assert worst <= 0, f"approx={approx}: exceeds budget by {worst:.2e}"


@pytest.mark.parametrize("quantized", [False, True])
def test_network_outputs_close(quantized):
    spec = get_model_spec("complex_yolov4_tiny", width=128, height=128)
    params, state = net.init_params(spec, jax.random.PRNGKey(0))
    fparams = net.fold_batchnorm(spec, params, state)
    fspec = net.fold_spec(spec)
    x = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (2, 128, 128, 3)), jnp.float32)
    quant = None
    if quantized:
        from complex_yolov4_tpu.models import quantize as qz

        quant = qz.quantize_model(fspec, fparams, [np.asarray(x)])

    def run(approx):
        decoded, _ = net.apply(fspec, fparams, {}, x,
                               compute_dtype=jnp.bfloat16, quant=quant,
                               mish_approx=approx)
        return np.asarray(decoded, np.float32)

    exact, approx = run(False), run(True)
    assert exact.shape == approx.shape
    # box geometry columns are in pixel units (scale ~128); conf/cls in [0,1]
    np.testing.assert_allclose(approx[..., :6], exact[..., :6],
                               atol=1.5, rtol=0.05)
    np.testing.assert_allclose(approx[..., 6:], exact[..., 6:], atol=0.05)
    assert np.all(approx[..., 6] >= 0) and np.all(approx[..., 6] <= 1)
