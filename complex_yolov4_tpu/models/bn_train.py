"""Train-mode BatchNorm with bf16 residuals (custom VJP).

Why this exists: the straightforward train path casts every conv output to
f32 to compute batch statistics, and autodiff then stores that f32 cast as
the residual for the BN-affine and activation backward — one full f32
activation tensor per BN conv. The network's activations sum to ~4.7 GB per
batch-8 step, so every extra f32 pass over them costs ~6 ms of HBM time
(PERF.md roofline) and the measured backward runs at 3x the forward's time
instead of the theoretical 2x (r3 batch-2 train-step breakdown).

This kernel computes the SAME math — f32 batch statistics, f32 normalize
arithmetic, exact batch-norm gradient (through the batch mean/var, matching
torch's train-mode BatchNorm2d semantics, reference:
src/models/darknet2pytorch.py:253-259 via nn.BatchNorm2d) — but declares the
bf16 conv output as its only tensor residual. The backward recomputes
xhat from the bf16 input in f32; since the input IS bf16, recomputation
loses nothing over storing the f32 cast (the cast is deterministic), and the
stored-residual traffic halves.

Numerics: identical batch statistics (same f32 reductions); the normalized
output is rounded to bf16 once (the old path rounded act(f32) to bf16 one
op later — differences are sub-bf16-ulp and only on the training path;
the f32 train path in network.apply is unchanged and remains the
reference-parity surface that tests/test_reference_ab.py pins).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5  # torch BatchNorm2d default (must match network.BN_EPS)


@jax.custom_vjp
def bn_train(h: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray
             ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(h (B,H,W,C) compute-dtype, scale (C,) f32, bias (C,) f32) ->
    (normalized h in h.dtype, batch mean (C,) f32, biased batch var (C,) f32).

    The mean/var outputs feed the running-statistics update only; their
    cotangents are treated as zero (state is not differentiated)."""
    y, mean, var, _ = _bn_fwd_impl(h, scale, bias)
    return y, mean, var


def _bn_fwd_impl(h, scale, bias):
    hf = h.astype(jnp.float32)
    mean = jnp.mean(hf, axis=(0, 1, 2))
    var = jnp.var(hf, axis=(0, 1, 2))
    inv = jax.lax.rsqrt(var + BN_EPS)
    eff = (inv * scale).astype(jnp.float32)
    y = (hf * eff + (bias - mean * eff)).astype(h.dtype)
    return y, mean, var, inv


def _bn_fwd(h, scale, bias):
    y, mean, var, inv = _bn_fwd_impl(h, scale, bias)
    # Residuals: the bf16 input + per-channel f32 scalars. No f32 tensor.
    return (y, mean, var), (h, scale, mean, inv)


def _bn_bwd(res, cts):
    g_y, _g_mean, _g_var = cts  # state outputs carry zero cotangents
    h, scale, mean, inv = res
    g = g_y.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    xhat = (hf - mean) * inv
    n = hf.shape[0] * hf.shape[1] * hf.shape[2]
    # Exact train-mode BN gradient (through the batch statistics):
    #   dx = inv*scale * (g - mean(g) - xhat * mean(g*xhat))
    sum_g = jnp.sum(g, axis=(0, 1, 2))
    sum_gx = jnp.sum(g * xhat, axis=(0, 1, 2))
    dscale = sum_gx
    dbias = sum_g
    dx = (inv * scale) * (g - sum_g / n - xhat * (sum_gx / n))
    return dx.astype(h.dtype), dscale, dbias


bn_train.defvjp(_bn_fwd, _bn_bwd)
