"""Probe the candidate-selection cost inside ops/nms.py::_candidates.

Variants timed (scan-differential, B=16, N=22743, K=128):
  score-only        : conf/cls max/argmax/where, no selection
  flat top_k        : lax.top_k over the full score vector
  hier top_k        : current hierarchical (group 16)
  hier stage1       : tile max + top_k over tile maxima only
  hier no-gather    : both top_ks but candidate gather replaced by slice
  sort-based        : lax.sort_key_val descending, take first k
  argmax-iter-8     : 8 rounds of max+mask (k=8 sanity lower bound)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, N, K, G = 16, 22743, 128, 16
NEG = -1e9


def timed(fn, x, reps_hi=256):
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


def main():
    rng = np.random.default_rng(0)
    decoded = jnp.asarray(rng.uniform(0, 1, (B, N, 10)).astype(np.float32))

    def score_of(d):
        conf = d[:, 6]
        cls_conf = jnp.max(d[:, 7:], axis=-1)
        valid = conf >= 0.5
        return jnp.where(valid, conf * cls_conf, NEG)

    def score_only(d):
        return jax.vmap(score_of)(d).sum(axis=1)

    def flat_topk(d):
        s = jax.vmap(score_of)(d)
        v, i = jax.vmap(lambda x: jax.lax.top_k(x, K))(s)
        return v.sum(axis=1) + i.sum(axis=1).astype(jnp.float32)

    def hier(d):
        s = jax.vmap(score_of)(d)

        def one(score):
            ng = -(-N // G)
            sp = jnp.pad(score, (0, ng * G - N), constant_values=NEG)
            sg = sp.reshape(ng, G)
            _, gidx = jax.lax.top_k(sg.max(axis=1), K)
            cand = sg[gidx].reshape(-1)
            cidx = (gidx[:, None] * G + jnp.arange(G)[None, :]).reshape(-1)
            v, i = jax.lax.top_k(cand, K)
            return v, cidx[i]

        v, i = jax.vmap(one)(s)
        return v.sum(axis=1) + i.sum(axis=1).astype(jnp.float32)

    def hier_stage1(d):
        s = jax.vmap(score_of)(d)

        def one(score):
            ng = -(-N // G)
            sp = jnp.pad(score, (0, ng * G - N), constant_values=NEG)
            sg = sp.reshape(ng, G)
            return jax.lax.top_k(sg.max(axis=1), K)

        v, i = jax.vmap(one)(s)
        return v.sum(axis=1) + i.sum(axis=1).astype(jnp.float32)

    def hier_nogather(d):
        s = jax.vmap(score_of)(d)

        def one(score):
            ng = -(-N // G)
            sp = jnp.pad(score, (0, ng * G - N), constant_values=NEG)
            sg = sp.reshape(ng, G)
            _, gidx = jax.lax.top_k(sg.max(axis=1), K)
            cand = sg[:K].reshape(-1)[: K * G]  # slice instead of gather
            v, i = jax.lax.top_k(cand, K)
            return v, i + gidx[:1]
        v, i = jax.vmap(one)(s)
        return v.sum(axis=1) + i.sum(axis=1).astype(jnp.float32)

    def sort_based(d):
        s = jax.vmap(score_of)(d)
        idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], s.shape)
        sv, si = jax.lax.sort_key_val(-s, idx, dimension=1)
        return (-sv[:, :K]).sum(axis=1) + si[:, :K].sum(axis=1).astype(jnp.float32)

    for name, fn in (("score-only", score_only), ("flat top_k", flat_topk),
                     ("hier top_k", hier), ("hier stage1", hier_stage1),
                     ("hier no-gather", hier_nogather),
                     ("sort-based", sort_based)):
        print(f"{name:16s}: {timed(fn, decoded):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
