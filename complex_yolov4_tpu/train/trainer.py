"""Jitted train step + training state.

The reference's hot loop (reference: src/train.py:183-244) interleaves
host-side Python with per-batch D2H copies; here one `TrainState` pytree and
one jitted function carry the whole step — forward, loss, backward, optimizer
update, BN-state update, metric reduction — and run fully on device. Under a
data mesh the same step is sharded (batch over `data`, state replicated) and
XLA inserts the gradient all-reduce.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..losses.yolo_loss import network_loss
from ..models import network as net
from ..models.spec import NetSpec
from ..parallel import mesh as pmesh
from .optimizer import set_learning_rate


def cnf_bev_size() -> int:
    from ..config import kitti as cnf

    return cnf.BEV_HEIGHT


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    """Replicated training state: everything the step mutates."""

    params: Dict[str, Any]
    bn_state: Dict[str, Any]
    opt_state: Any
    global_step: jnp.ndarray  # scalar int32, counts optimizer iterations

    @classmethod
    def create(cls, params, bn_state, tx: optax.GradientTransformation):
        return cls(
            params=params,
            bn_state=bn_state,
            opt_state=tx.init(params),
            global_step=jnp.zeros((), jnp.int32),
        )


def make_train_step(
    spec: NetSpec,
    tx: optax.GradientTransformation,
    *,
    use_giou_loss: bool = False,
    compute_dtype=jnp.bfloat16,
    mesh=None,
    remat: bool = False,
    device_raster: bool = False,
    metrics_cond: bool = False,
    batch_pack: Optional[int] = None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jnp.ndarray],
              Tuple[TrainState, Dict[str, jnp.ndarray]]]:
    """Build the jitted (state, batch, lr) -> (state, metrics) step.

    With `mesh`, the step is compiled with batch inputs sharded over the
    `data` axis and state replicated — the DDP equivalent, minus DDP.
    `remat` rematerializes the forward in the backward pass (jax.checkpoint),
    roughly halving activation memory for larger per-chip batches.

    With `device_raster`, the step takes the loader's deferred batches
    (compact points + augmentation decisions, loader.py `device_raster=True`)
    and builds the BEV images ON DEVICE inside the jit, then takes an extra
    trailing `img_size` static argument (the multiscale bucket) —
    (state, batch, lr, img_size). Per-step H2D drops ~14x (points vs
    rasterized images), which is the difference between a starved and a
    saturated chip on low-H2D-bandwidth hosts.

    With `metrics_cond`, the step takes a trailing traced bool
    (state, batch, lr, img_size, want_metrics): the metric-only loss work
    (pred-vs-target rotated IoU in MSE mode, score scatters) runs under
    lax.cond — steps that don't feed tensorboard skip that geometry while
    still compiling ONE program per size bucket.

    `batch_pack` runs the early backbone batch-packed (models/bpack.py) in
    the forward AND backward — the block-diagonal conv transform is exact
    and its VJP enjoys the same padded-MXU-pass halving; train-mode BN
    reduces statistics per original channel (models/bn_train.py `p`).
    """
    from ..data import bev as bev_mod

    def forward(params, bn_state, images):
        return net.apply(spec, params, bn_state, images, train=True,
                         compute_dtype=compute_dtype, batch_pack=batch_pack)

    if remat:
        forward = jax.checkpoint(forward)

    def step(state: TrainState, batch: Dict[str, jnp.ndarray], lr: jnp.ndarray,
             img_size: int = 0, want_metrics=True):
        if device_raster:
            images = bev_mod.images_from_deferred_batch(
                batch, img_size or cnf_bev_size())
        else:
            images = batch["image"]
        targets = batch["targets"]
        tmask = batch["target_mask"]

        def loss_fn(params):
            (_, head_raw), new_bn = forward(params, state.bn_state, images)
            total, head_metrics = network_loss(
                spec, head_raw, targets, tmask, use_giou_loss=use_giou_loss,
                want_metrics=want_metrics if metrics_cond else None)
            return total, (new_bn, head_metrics)

        (loss, (new_bn, head_metrics)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        opt_state = set_learning_rate(state.opt_state, lr)
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        metrics = {"loss": loss, "lr": lr}
        for h, hm in enumerate(head_metrics):
            for k, v in hm.items():
                metrics[f"head{h}/{k}"] = v
        new_state = TrainState(
            params=params,
            bn_state=new_bn,
            opt_state=opt_state,
            global_step=state.global_step + 1,
        )
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,), static_argnums=(3,))

    repl = pmesh.replicated(mesh)
    data = pmesh.data_sharding(mesh)
    if device_raster:
        batch_sh = {k: data for k in ("points", "point_mask", "flip", "holes",
                                      "hole_mask", "targets", "target_mask")}
    else:
        batch_sh = {"image": data, "targets": data, "target_mask": data}
    return jax.jit(
        step,
        in_shardings=(repl, batch_sh, repl) + ((repl,) if metrics_cond else ()),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
        static_argnums=(3,),
    )


def make_eval_step(spec: NetSpec, *, use_giou_loss: bool = False,
                   compute_dtype=jnp.float32):
    """Jitted validation loss (no optimizer/BN update)."""

    @jax.jit
    def step(params, bn_state, batch):
        # train=False: BN uses running statistics, matching the deployed
        # model (batch stats would make val loss depend on val batch size).
        _, head_raw = net.apply(
            spec, params, bn_state, batch["image"], train=False,
            compute_dtype=compute_dtype)
        total, head_metrics = network_loss(
            spec, head_raw, batch["targets"], batch["target_mask"],
            use_giou_loss=use_giou_loss)
        return total, head_metrics

    return step
