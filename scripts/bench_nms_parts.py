"""Decompose nms_batch cost with knobbed variants (scan-differential, high reps).

Variants: full; loop capped at 1/2/4 while-iterations; no-merge (skip
absorption einsum); suppress+candidates only. Input: random decoded tensor
(garbage boxes — matches bench.py's random-weight worst case).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from complex_yolov4_tpu.ops import nms as nms_mod
from complex_yolov4_tpu.ops import rotated_boxes as rb

B, N, K = 16, 22743, 128
NEG = -1e9
UNROLL = 8


def timed(fn, x, reps_hi=64):
    def run(reps, x):
        def body(c, i):
            return fn(x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype)), 0.0

        out, _ = jax.lax.scan(body, fn(x), jnp.arange(reps))
        return out

    r1 = jax.jit(run, static_argnums=0)
    _ = float(np.asarray(r1(1, x)).ravel()[0])
    _ = float(np.asarray(r1(reps_hi, x)).ravel()[0])
    t0 = time.perf_counter()
    v = r1(1, x); assert np.isfinite(float(np.asarray(v).ravel()[0]))
    t1 = time.perf_counter()
    v = r1(reps_hi, x); assert np.isfinite(float(np.asarray(v).ravel()[0]))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps_hi - 1) * 1e3


def nms_knobbed(decoded, max_iters=None, merge=True, unroll=UNROLL):
    b = decoded.shape[0]
    k = K
    cand, valid = jax.vmap(lambda d: nms_mod._candidates(d, 0.5, k))(decoded)
    suppress = jax.vmap(lambda c: nms_mod._suppress_matrix(c, 0.5))(cand)
    idx = jnp.arange(k)
    blocker = suppress & (idx[:, None] < idx[None, :])

    def round_cond(state):
        keep, reject, it = state
        lim = max_iters if max_iters is not None else k
        return jnp.any(valid & ~keep & ~reject) & (it < lim)

    def one_round(keep, reject):
        undecided = valid & ~keep & ~reject
        live_blocker = blocker & (keep | undecided)[:, :, None]
        keep = keep | (undecided & ~jnp.any(live_blocker, axis=1))
        reject = reject | (undecided & jnp.any(blocker & keep[:, :, None], axis=1))
        return keep, reject

    def round_body(state):
        keep, reject, it = state
        for _ in range(unroll):
            keep, reject = one_round(keep, reject)
        return keep, reject, it + 1

    zeros = jnp.zeros((b, k), bool)
    keep, _, iters = jax.lax.while_loop(
        round_cond, round_body, (zeros, zeros, jnp.int32(0)))
    if not merge:
        return keep.astype(jnp.float32).sum(axis=1) + iters.astype(jnp.float32)

    keeper_overlap = suppress & keep[:, :, None] & valid[:, None, :]
    absorber = jnp.min(jnp.where(keeper_overlap, idx[None, :, None], k), axis=1)
    group = keeper_overlap & (absorber[:, None, :] == idx[None, :, None])
    w = jnp.where(group, cand[:, None, :, 6], 0.0)
    wsum = jnp.maximum(jnp.sum(w, axis=2, keepdims=True), 1e-16)
    merged_boxes = jnp.einsum("bij,bjc->bic", w, cand[:, :, :6]) / wsum
    return merged_boxes.sum(axis=(1, 2)) + iters.astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    decoded = np.zeros((B, N, 10), np.float32)
    decoded[..., 0] = rng.uniform(0, 608, (B, N))
    decoded[..., 1] = rng.uniform(0, 608, (B, N))
    decoded[..., 2] = rng.uniform(5, 40, (B, N))
    decoded[..., 3] = rng.uniform(5, 40, (B, N))
    yaw = rng.uniform(-np.pi, np.pi, (B, N))
    decoded[..., 4] = np.sin(yaw)
    decoded[..., 5] = np.cos(yaw)
    decoded[..., 6] = rng.uniform(0, 1, (B, N))  # ~50% above conf 0.5: garbage
    decoded[..., 7:] = rng.dirichlet(np.ones(3), (B, N))
    decoded = jnp.asarray(decoded)

    # how many while-iterations does the fixpoint actually take?
    def iters_only(d):
        out = nms_knobbed(d, merge=False)
        return out - jax.jit(lambda x: x)(out)  # placeholder; replaced below

    kc, vc = jax.vmap(lambda d: nms_mod._candidates(d, 0.5, K))(decoded)
    sup = jax.vmap(lambda c: nms_mod._suppress_matrix(c, 0.5))(kc)
    idx = jnp.arange(K)
    blocker = np.asarray(sup & (idx[:, None] < idx[None, :]))
    validn = np.asarray(vc)
    keep = np.zeros((B, K), bool); reject = np.zeros((B, K), bool)
    rounds = 0
    while (validn & ~keep & ~reject).any() and rounds < K:
        und = validn & ~keep & ~reject
        live = blocker & (keep | und)[:, :, None]
        keep = keep | (und & ~live.any(axis=1))
        reject = reject | (und & (blocker & keep[:, :, None]).any(axis=1))
        rounds += 1
    print(f"fixpoint rounds (numpy replay): {rounds} "
          f"(= {-(-rounds // UNROLL)} while-iterations at unroll {UNROLL})",
          flush=True)

    print(f"full (merge, uncapped): {timed(lambda d: nms_knobbed(d), decoded):7.3f} ms", flush=True)
    print(f"cap 1 iter:             {timed(lambda d: nms_knobbed(d, 1), decoded):7.3f} ms", flush=True)
    print(f"cap 2 iters:            {timed(lambda d: nms_knobbed(d, 2), decoded):7.3f} ms", flush=True)
    print(f"no merge:               {timed(lambda d: nms_knobbed(d, merge=False), decoded):7.3f} ms", flush=True)
    print(f"unroll16 uncapped:      {timed(lambda d: nms_knobbed(d, unroll=16), decoded):7.3f} ms", flush=True)
    print(f"production nms_batch:   {timed(lambda d: nms_mod.nms_batch(d, 0.5, 0.5, K)[0].sum(axis=(1, 2)), decoded):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
