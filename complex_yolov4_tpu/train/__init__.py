"""Training runtime: optimizer, schedules, jitted step, checkpointing."""

from .checkpoint import (
    latest_epoch,
    restore_checkpoint,
    restore_params_only,
    save_checkpoint,
    save_checkpoint_async,
    wait_for_async_save,
)
from .optimizer import create_optimizer, set_learning_rate, weight_decay_mask
from .schedules import cosine_factor, make_lr_fn, multi_step_factor
from .trainer import TrainState, make_eval_step, make_train_step

__all__ = [
    "TrainState",
    "cosine_factor",
    "create_optimizer",
    "latest_epoch",
    "make_eval_step",
    "make_lr_fn",
    "make_train_step",
    "multi_step_factor",
    "restore_checkpoint",
    "restore_params_only",
    "save_checkpoint",
    "save_checkpoint_async",
    "set_learning_rate",
    "wait_for_async_save",
    "weight_decay_mask",
]
