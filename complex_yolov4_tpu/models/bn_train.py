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

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

BN_EPS = 1e-5  # torch BatchNorm2d default (must match network.BN_EPS)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def bn_train(h: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
             p: int = 1) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(h (B,H,W,C) compute-dtype, scale (C,) f32, bias (C,) f32) ->
    (normalized h in h.dtype, batch mean (C,) f32, biased batch var (C,) f32).

    The mean/var outputs feed the running-statistics update only; their
    cotangents are treated as zero (state is not differentiated).

    p > 1: h is a batch-PACKED activation (B/p, H, W, p*C) — see
    models/bpack.py. Statistics reduce over the frame-block axis too (a free
    minor-dim reshape, no transpose), giving the exact per-original-channel
    (C,) stats of the unpacked batch; the affine broadcasts tiled."""
    y, mean, var, _ = _bn_fwd_impl(h, scale, bias, p)
    return y, mean, var


def _stats(hf: jnp.ndarray, p: int):
    if p == 1:
        return (jnp.mean(hf, axis=(0, 1, 2)),
                jnp.var(hf, axis=(0, 1, 2)))
    g, hh, ww, pc = hf.shape
    r = hf.reshape(g, hh, ww, p, pc // p)
    return (jnp.mean(r, axis=(0, 1, 2, 3)),
            jnp.var(r, axis=(0, 1, 2, 3)))


def _tile(v: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.tile(v, p) if p > 1 else v


def _bn_fwd_impl(h, scale, bias, p):
    hf = h.astype(jnp.float32)
    mean, var = _stats(hf, p)
    inv = jax.lax.rsqrt(var + BN_EPS)
    eff = (inv * scale).astype(jnp.float32)
    y = (hf * _tile(eff, p) + _tile(bias - mean * eff, p)).astype(h.dtype)
    return y, mean, var, inv


def _bn_fwd(h, scale, bias, p):
    # custom_vjp convention: fwd keeps the primal signature (nondiff args in
    # their original positions); bwd receives the nondiff args first.
    y, mean, var, inv = _bn_fwd_impl(h, scale, bias, p)
    # Residuals: the bf16 input + per-channel f32 scalars. No f32 tensor.
    return (y, mean, var), (h, scale, mean, inv)


def _bn_bwd(p, res, cts):
    g_y, _g_mean, _g_var = cts  # state outputs carry zero cotangents
    h, scale, mean, inv = res
    g = g_y.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    xhat = (hf - _tile(mean, p)) * _tile(inv, p)
    n = hf.shape[0] * hf.shape[1] * hf.shape[2] * p
    # Exact train-mode BN gradient (through the batch statistics):
    #   dx = inv*scale * (g - mean(g) - xhat * mean(g*xhat))
    if p == 1:
        sum_g = jnp.sum(g, axis=(0, 1, 2))
        sum_gx = jnp.sum(g * xhat, axis=(0, 1, 2))
    else:
        gg, hh, ww, pc = g.shape
        c = pc // p
        sum_g = jnp.sum(g.reshape(gg, hh, ww, p, c), axis=(0, 1, 2, 3))
        sum_gx = jnp.sum((g * xhat).reshape(gg, hh, ww, p, c),
                         axis=(0, 1, 2, 3))
    dscale = sum_gx
    dbias = sum_g
    dx = _tile(inv * scale, p) * (
        g - _tile(sum_g / n, p) - xhat * _tile(sum_gx / n, p))
    return dx.astype(h.dtype), dscale, dbias


bn_train.defvjp(_bn_fwd, _bn_bwd)
