"""Checkpoint save/restore (orbax) — params + BN state + optimizer + step.

The reference writes paired torch pickles per epoch
(`Model_{fn}_epoch_{e}.pth` + `Utils_{fn}_epoch_{e}.pth`,
reference: src/utils/train_utils.py:80-104) and resumes by name surgery
(reference: src/train.py:96-117). Here one orbax checkpoint per epoch holds
the whole train state atomically; `latest_epoch` replaces the name surgery.
"""

from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .trainer import TrainState

_DIR_RE = re.compile(r"^epoch_(\d+)$")


def _ckpt_dir(checkpoints_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(checkpoints_dir), f"epoch_{epoch}")


def save_checkpoint(checkpoints_dir: str, state: TrainState, epoch: int,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    """Write the full train state (+ JSON-able extras) for `epoch`."""
    os.makedirs(checkpoints_dir, exist_ok=True)
    path = _ckpt_dir(checkpoints_dir, epoch)
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = {
            "params": state.params,
            "bn_state": state.bn_state,
            "opt_state": state.opt_state,
            "global_step": state.global_step,
            "epoch": np.int32(epoch),
        }
        if extra:
            payload["extra"] = extra
        ckptr.save(path, payload, force=True)
    return path


def latest_epoch(checkpoints_dir: str) -> Optional[int]:
    if not os.path.isdir(checkpoints_dir):
        return None
    epochs = [
        int(m.group(1))
        for d in os.listdir(checkpoints_dir)
        if (m := _DIR_RE.match(d))
    ]
    return max(epochs) if epochs else None


def restore_checkpoint(path: str, template: TrainState):
    """Restore a checkpoint written by `save_checkpoint`.

    Returns (TrainState, epoch, extra). `template` supplies the tree
    structure: orbax must restore INTO it — a structureless restore returns
    plain dicts whose alphabetical leaf order silently permutes optax
    namedtuple states (e.g. MultiStepsState fields).
    """
    item = {
        "params": template.params,
        "bn_state": template.bn_state,
        "opt_state": template.opt_state,
        "global_step": template.global_step,
        "epoch": np.int32(0),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path, item=item)
            extra = None
        except Exception:
            # checkpoint may carry an "extra" dict the template lacks
            raw = ckptr.restore(path)
            item["extra"] = raw.get("extra")
            restored = ckptr.restore(path, item=item)
            extra = restored.get("extra")
    state = TrainState(
        params=jax.tree.map(np.asarray, restored["params"]),
        bn_state=jax.tree.map(np.asarray, restored["bn_state"]),
        opt_state=jax.tree.map(np.asarray, restored["opt_state"]),
        global_step=np.asarray(restored["global_step"]),
    )
    return state, int(restored["epoch"]), extra


def restore_params_only(path: str) -> Dict[str, Any]:
    """Load weights only (the reference's --pretrained_path mode,
    train.py:89-93)."""
    return restore_params_and_bn(path)[0]


def restore_params_and_bn(path: str):
    """(params, bn_state) from any checkpoint written by this framework
    (params/bn_state are plain dicts, so a structureless restore is safe)."""
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    return (jax.tree.map(np.asarray, restored["params"]),
            jax.tree.map(np.asarray, restored["bn_state"]))
