"""Packed pair-list vs full (k,k) broadcast for the NMS suppression matrix.

The pair list halves the IoU lanes but pays gather (2x 8128 rows) + scatter
(8128 updates) per image — at ~10 ns/row that's ~4 ms/batch-16, dwarfing the
~0.8 ms kernel. The broadcast form doubles kernel lanes but has zero
gather/scatter.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from complex_yolov4_tpu.ops import nms as nms_mod
from complex_yolov4_tpu.ops import rotated_boxes as rb

B, K = 16, 128


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


def packed(cand):
    return jax.vmap(lambda c: nms_mod._suppress_matrix(c, 0.5))(cand).sum(
        axis=(1, 2)).astype(jnp.float32)


def broadcast(cand):
    def one(c):
        b5 = jnp.stack([c[:, 0], c[:, 1], c[:, 2], c[:, 3],
                        jnp.arctan2(c[:, 4], c[:, 5])], axis=-1)
        a = jnp.broadcast_to(b5[:, None, :], (K, K, 5))
        bb = jnp.broadcast_to(b5[None, :, :], (K, K, 5))
        iou = rb.rotated_iou(a.reshape(-1, 5), bb.reshape(-1, 5)).reshape(K, K)
        same = c[:, 8][:, None] == c[:, 8][None, :]
        return (iou > 0.5) & same

    return jax.vmap(one)(cand).sum(axis=(1, 2)).astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    cand = np.zeros((B, K, 9), np.float32)
    cand[..., 0] = rng.uniform(0, 608, (B, K))
    cand[..., 1] = rng.uniform(0, 608, (B, K))
    cand[..., 2] = rng.uniform(5, 40, (B, K))
    cand[..., 3] = rng.uniform(5, 40, (B, K))
    yaw = rng.uniform(-np.pi, np.pi, (B, K))
    cand[..., 4] = np.sin(yaw)
    cand[..., 5] = np.cos(yaw)
    cand[..., 6] = rng.uniform(0.5, 1, (B, K))
    cand[..., 7] = rng.uniform(0.5, 1, (B, K))
    cand[..., 8] = rng.integers(0, 3, (B, K))
    cand = jnp.asarray(cand)

    a = np.asarray(jax.jit(packed)(cand))
    b = np.asarray(jax.jit(broadcast)(cand))
    # broadcast includes the diagonal (iou 1 > thresh, same class) like packed
    print("parity (counts equal):", np.array_equal(a, b), flush=True)
    print(f"packed pair-list: {timed(packed, cand):7.3f} ms", flush=True)
    print(f"(k,k) broadcast:  {timed(broadcast, cand):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
