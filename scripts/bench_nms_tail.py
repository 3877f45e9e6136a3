"""Microbench: decompose the NMS tail (~5.4 ms/batch-16) into components.

Components (ops/nms.py): candidate top-k over 22,743 scores, pairwise
rotated-IoU suppression matrix (k(k-1)/2 pairs), fixpoint greedy while_loop,
absorption/merge einsum. Scan-differential protocol per axon timing memory.
Env: K (default 128), B (default 16).
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from complex_yolov4_tpu.ops import nms as nms_mod
from complex_yolov4_tpu.ops import rotated_boxes as rb

B = int(os.environ.get("B", "16"))
K = int(os.environ.get("K", "128"))
N = 22743


def timed(fn, x, reps_hi=16):
    def run(reps, x):
        def body(c, i):
            out = fn(x + i.astype(x.dtype) * jnp.asarray(1e-6, x.dtype))
            return out, 0.0

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


def main():
    rng = np.random.default_rng(0)
    # plausible decoded tensor: mostly low conf, some clusters of high conf
    decoded = np.zeros((B, N, 10), np.float32)
    decoded[..., 0] = rng.uniform(0, 608, (B, N))
    decoded[..., 1] = rng.uniform(0, 608, (B, N))
    decoded[..., 2] = rng.uniform(5, 40, (B, N))
    decoded[..., 3] = rng.uniform(5, 40, (B, N))
    yaw = rng.uniform(-np.pi, np.pi, (B, N))
    decoded[..., 4] = np.sin(yaw)
    decoded[..., 5] = np.cos(yaw)
    decoded[..., 6] = rng.beta(0.5, 12, (B, N))  # conf: few above 0.5
    decoded[..., 7:] = rng.dirichlet(np.ones(3), (B, N))
    hot = rng.integers(0, N, (B, 60))
    for b in range(B):
        decoded[b, hot[b], 6] = rng.uniform(0.9, 1.0, 60)
    decoded = jnp.asarray(decoded)

    full = lambda d: nms_mod.nms_batch(d, 0.5, 0.5, K)[0]
    print(f"K={K} B={B}", flush=True)
    print(f"full nms_batch:      {timed(full, decoded):7.3f} ms", flush=True)

    cand_fn = jax.vmap(lambda d: nms_mod._candidates(d, 0.5, K)[0])
    print(f"candidates (top-k):  {timed(lambda d: cand_fn(d), decoded):7.3f} ms",
          flush=True)

    cand, valid = jax.vmap(lambda d: nms_mod._candidates(d, 0.5, K))(decoded)
    sup_fn = jax.vmap(lambda c: nms_mod._suppress_matrix(c, 0.5))
    print(f"suppress matrix:     {timed(lambda c: sup_fn(c).any(axis=(1, 2)).astype(jnp.float32), cand):7.3f} ms", flush=True)

    # pair IoU alone (the geometry inside the suppress matrix)
    ii, jj = jnp.triu_indices(K, 1)

    def pairs_only(c):
        b5 = jnp.stack([c[..., 0], c[..., 1], c[..., 2], c[..., 3],
                        jnp.arctan2(c[..., 4], c[..., 5])], axis=-1)
        return jax.vmap(lambda x: rb.rotated_iou(x[ii], x[jj]))(b5).sum(axis=1)

    print(f"pair IoU only:       {timed(pairs_only, cand):7.3f} ms", flush=True)

    # fixpoint + merge on a precomputed suppress matrix: time full minus parts
    # (reported as residual) — direct timing of bool inputs is awkward under
    # the varied-input protocol.


if __name__ == "__main__":
    main()
