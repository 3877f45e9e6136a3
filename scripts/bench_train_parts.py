"""Train-step cost breakdown on the real chip (VERDICT r1 #5).

Differentially times, at batch 8 / 608 / bf16:
  fwd            : train-mode forward only
  fwd+loss       : + network_loss value
  grad           : value_and_grad of loss (scan-differential, no donation —
                   reads higher than the production step, which donates
                   state and pipelines; compare full-step numbers)
  full step      : the production step (+ optimizer/BN update, metrics on)
Env: GIOU=1 for the rotated-GIoU loss path, BATCH.
"""

import os
import time

import numpy as np

import jax
import jax.numpy as jnp

from complex_yolov4_tpu import train as T
from complex_yolov4_tpu.losses import yolo_loss as yl
from complex_yolov4_tpu.models import get_model_spec
from complex_yolov4_tpu.models import network as net

BATCH = int(os.environ.get("BATCH", "8"))
USE_GIOU = os.environ.get("GIOU", "0") == "1"


def timed(fn, args, reps_hi=8):
    """Scan-differential (axon timing memory): fn's LAST positional arg is
    the image tensor, varied per rep so identical-dispatch caching can't lie."""
    *rest, images = args

    def run(reps, images):
        def body(c, i):
            return fn(*rest, images + i.astype(images.dtype) * 1e-6), 0.0

        out, _ = jax.lax.scan(body, fn(*rest, images), jnp.arange(reps))
        return out

    r1 = jax.jit(run, static_argnums=0)
    _ = float(np.asarray(jax.tree_util.tree_leaves(r1(1, images))[0]).ravel()[0])
    _ = float(np.asarray(jax.tree_util.tree_leaves(r1(reps_hi, images))[0]).ravel()[0])
    t0 = time.perf_counter()
    v = r1(1, images)
    assert np.isfinite(float(np.asarray(jax.tree_util.tree_leaves(v)[0]).ravel()[0]))
    t1 = time.perf_counter()
    v = r1(reps_hi, images)
    assert np.isfinite(float(np.asarray(jax.tree_util.tree_leaves(v)[0]).ravel()[0]))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (reps_hi - 1) * 1e3


def main():
    spec = get_model_spec("complex_yolov4")
    params, bn = net.init_params(spec, jax.random.PRNGKey(0))
    tx = T.create_optimizer(params, optimizer_type="sgd")
    state = T.TrainState.create(params, bn, tx)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(BATCH, 608, 608, 3)).astype(np.float32))
    targets = np.zeros((BATCH, 64, 7), np.float32)
    tmask = np.zeros((BATCH, 64), np.float32)
    for b in range(BATCH):
        for t in range(12):
            yaw = rng.uniform(-np.pi, np.pi)
            targets[b, t] = [rng.integers(0, 3), rng.uniform(0.1, 0.9),
                             rng.uniform(0.1, 0.9), 0.04, 0.08,
                             np.sin(yaw), np.cos(yaw)]
            tmask[b, t] = 1
    targets = jnp.asarray(targets)
    tmask = jnp.asarray(tmask)

    @jax.jit
    def fwd(params, bn, images):
        (_, raw), new_bn = net.apply(spec, params, bn, images, train=True,
                                     compute_dtype=jnp.bfloat16)
        leaves = [x for x in jax.tree_util.tree_leaves(raw)
                  if hasattr(x, "astype")]
        return sum(x.astype(jnp.float32).sum() for x in leaves)

    @jax.jit
    def fwd_loss(params, bn, targets, tmask, images):
        (_, raw), new_bn = net.apply(spec, params, bn, images, train=True,
                                     compute_dtype=jnp.bfloat16)
        total, _ = yl.network_loss(spec, raw, targets, tmask,
                                   use_giou_loss=USE_GIOU)
        return total

    @jax.jit
    def grad(params, bn, targets, tmask, images):
        def loss_fn(p):
            (_, raw), new_bn = net.apply(spec, p, bn, images, train=True,
                                         compute_dtype=jnp.bfloat16)
            total, _ = yl.network_loss(spec, raw, targets, tmask,
                                       use_giou_loss=USE_GIOU)
            return total

        g = jax.grad(loss_fn)(params)
        # sum EVERY leaf: returning just one dW would let XLA dead-code-
        # eliminate the other layers' weight-gradient contractions and
        # undercount the backward cost
        return sum(x.astype(jnp.float32).sum()
                   for x in jax.tree_util.tree_leaves(g))

    step = T.make_train_step(spec, tx, use_giou_loss=USE_GIOU,
                             compute_dtype=jnp.bfloat16)
    batch = {"image": images, "targets": targets, "target_mask": tmask}

    print(f"batch {BATCH}, giou={USE_GIOU}", flush=True)
    print(f"fwd (train mode):  {timed(fwd, (params, bn, images)):7.2f} ms", flush=True)
    print(f"fwd+loss value:    {timed(fwd_loss, (params, bn, targets, tmask, images)):7.2f} ms", flush=True)
    print(f"grad:              {timed(grad, (params, bn, targets, tmask, images)):7.2f} ms", flush=True)
    # full step donates state: carry it through the loop
    import numpy as _np
    st = state
    for _ in range(2):
        st, m = step(st, batch, jnp.float32(1e-4))
    jax.block_until_ready(m["loss"])
    t0 = time.perf_counter()
    for _ in range(20):
        st, m = step(st, batch, jnp.float32(1e-4))
    jax.block_until_ready(m["loss"])
    t_step = (time.perf_counter() - t0) / 20 * 1e3
    assert _np.isfinite(float(m["loss"]))
    print(f"full step:         {t_step:7.2f} ms "
          f"({BATCH / t_step * 1e3:.1f} imgs/s)", flush=True)


if __name__ == "__main__":
    main()
