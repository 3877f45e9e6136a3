"""Optimizer construction with the reference's parameter grouping.

Behavioral contract (reference: src/utils/train_utils.py:21-50): three param
groups — conv kernels get weight decay, biases and BatchNorm affine params do
not; SGD is nesterov with momentum, Adam is vanilla; one shared LR.

optax expresses this as a weight-decay mask over the param pytree instead of
group lists; LR arrives per step through `inject_hyperparams` so schedules
never retrace the jitted step.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import optax


def weight_decay_mask(params: Dict[str, Any]):
    """True only for conv kernels ('w' leaves) — the reference's pg1."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(k, "key", None) == "w" for k in path
        ),
        params,
    )


def create_optimizer(
    params: Dict[str, Any],
    *,
    optimizer_type: str = "adam",
    momentum: float = 0.949,
    weight_decay: float = 5e-4,
    subdivisions: int = 1,
) -> optax.GradientTransformation:
    """Build the optax chain. LR is a hyperparameter injected per step
    (call `update` with `opt_state.hyperparams['learning_rate'] = lr` via
    the trainer). `subdivisions` > 1 wraps in MultiSteps for gradient
    accumulation (reference: src/train.py:69-71,213-221)."""
    decay = optax.masked(
        optax.add_decayed_weights(weight_decay), weight_decay_mask(params)
    )

    def base(learning_rate):
        if optimizer_type == "sgd":
            inner = optax.sgd(learning_rate, momentum=momentum, nesterov=True)
        elif optimizer_type == "adam":
            inner = optax.adam(learning_rate)
        else:
            raise ValueError(f"unknown optimizer_type {optimizer_type!r}")
        # MultiSteps AVERAGES the accumulated micro-gradients; the reference
        # accumulates by SUM (repeated backward() with no scaling,
        # train.py:212-217), so rescale before weight decay is added — the
        # decay term itself is applied once per optimizer step in both.
        pre = [optax.scale(float(subdivisions))] if subdivisions > 1 else []
        return optax.chain(*pre, decay, inner)

    tx = optax.inject_hyperparams(base)(learning_rate=0.0)
    if subdivisions > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=subdivisions)
    return tx


def set_learning_rate(opt_state, lr):
    """Return opt_state with the injected LR replaced (works through
    MultiSteps wrapping)."""
    if isinstance(opt_state, optax.MultiStepsState):
        inner = set_learning_rate(opt_state.inner_opt_state, lr)
        return opt_state._replace(inner_opt_state=inner)
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jax.numpy.asarray(lr, jax.numpy.float32)
    return opt_state._replace(hyperparams=hp)
