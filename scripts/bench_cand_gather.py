"""Cost of _candidates' row gathers, vs a one-hot-matmul gather (MXU path).

Gathering 128 dynamic rows x 4 arrays from (22743, .) per image is suspected
to cost ~3 ms/batch-16 (dynamic-slice loops). The alternative builds a
(K, N) one-hot selection matrix and contracts it with the decoded tensor on
the MXU.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from complex_yolov4_tpu.ops import nms as nms_mod

B, N, K = 16, 22743, 128


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


def current(decoded):
    cand, valid = jax.vmap(lambda d: nms_mod._candidates(d, 0.5, K))(decoded)
    return cand.sum(axis=(1, 2))


def onehot(decoded):
    def one(d):
        conf = d[:, 6]
        cls_probs = d[:, 7:]
        cls_conf = jnp.max(cls_probs, axis=-1)
        cls_id = jnp.argmax(cls_probs, axis=-1).astype(jnp.float32)
        valid = conf >= 0.5
        score = jnp.where(valid, conf * cls_conf, -1e9)
        top_score, top_idx = nms_mod._topk_hierarchical(score, K)
        sel = (top_idx[:, None] == jnp.arange(N, dtype=top_idx.dtype)[None, :])
        selm = sel.astype(jnp.bfloat16)
        cols = jnp.concatenate(
            [d[:, :6], conf[:, None], cls_conf[:, None], cls_id[:, None]],
            axis=1).astype(jnp.bfloat16)  # (N, 9)
        cand = jnp.dot(selm, cols, preferred_element_type=jnp.float32)
        return cand

    return jax.vmap(one)(decoded).sum(axis=(1, 2))


def topk_only(decoded):
    def one(d):
        conf = d[:, 6]
        cls_conf = jnp.max(d[:, 7:], axis=-1)
        score = jnp.where(conf >= 0.5, conf * cls_conf, -1e9)
        v, i = nms_mod._topk_hierarchical(score, K)
        return v.sum() + i.sum().astype(jnp.float32)

    return jax.vmap(one)(decoded)


def main():
    rng = np.random.default_rng(0)
    decoded = jnp.asarray(rng.uniform(0, 1, (B, N, 10)).astype(np.float32))
    a = np.asarray(jax.jit(current)(decoded))
    b = np.asarray(jax.jit(onehot)(decoded))
    print("one-hot max dev:", float(np.abs(a - b).max()), flush=True)
    print(f"topk only (no row gather): {timed(topk_only, decoded):7.3f} ms", flush=True)
    print(f"current gathers:           {timed(current, decoded):7.3f} ms", flush=True)
    print(f"one-hot matmul gather:     {timed(onehot, decoded):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
