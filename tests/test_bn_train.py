"""bn_train (bf16-residual custom-VJP BatchNorm) vs autodiff-through-stats.

The custom backward must equal the exact gradient of train-mode BatchNorm
(differentiating THROUGH the batch mean/var, torch semantics) — verified
against jax.grad of a plain autodiff implementation of the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from complex_yolov4_tpu.models import bn_train as bt


def _bn_ref(h, scale, bias):
    """Plain autodiff implementation (no custom VJP) of the same math."""
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=(0, 1, 2))
    var = jnp.var(hf, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + bt.BN_EPS)
    eff = inv * scale
    return (hf * eff + (bias - mean * eff)).astype(h.dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_bn_train_matches_autodiff(dtype):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(1.5, 2.0, (2, 8, 8, 16)), dtype)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, (16,)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 1, (16,)), jnp.float32)
    g_out = jnp.asarray(rng.normal(0, 1, (2, 8, 8, 16)), jnp.float32)

    y, mean, var = jax.jit(bt.bn_train)(h, scale, bias)
    y_ref = _bn_ref(h, scale, bias)
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_ref, np.float32),
                               atol=2e-2 if dtype == jnp.bfloat16 else 1e-6)
    hf = np.asarray(h, np.float32)
    np.testing.assert_allclose(np.asarray(mean), hf.mean(axis=(0, 1, 2)),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(var), hf.var(axis=(0, 1, 2)),
                               rtol=1e-4)

    def loss_custom(h, s, b):
        yy, _, _ = bt.bn_train(h, s, b)
        return jnp.sum(yy.astype(jnp.float32) * g_out)

    def loss_ref(h, s, b):
        return jnp.sum(_bn_ref(h, s, b).astype(jnp.float32) * g_out)

    gc = jax.jit(jax.grad(loss_custom, argnums=(0, 1, 2)))(h, scale, bias)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(h, scale, bias)
    # bf16: both sides round the output and dx to bf16; the backward math
    # itself runs f32 both ways, so tolerances stay tight relative to scale.
    tol = dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else \
        dict(rtol=1e-4, atol=1e-5)
    for a, b_ in zip(gc, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32), **tol)


def test_bn_train_zero_var_is_finite():
    """Constant channels (var = 0) must not NaN either direction."""
    h = jnp.ones((2, 4, 4, 3), jnp.bfloat16) * 3.0
    scale = jnp.ones((3,), jnp.float32)
    bias = jnp.zeros((3,), jnp.float32)

    def loss(h):
        y, _, _ = bt.bn_train(h, scale, bias)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    v, g = jax.value_and_grad(loss)(h)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g, np.float32)))
