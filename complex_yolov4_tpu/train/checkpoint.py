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
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from .trainer import TrainState

_DIR_RE = re.compile(r"^epoch_(\d+)$")

_ASYNC_SAVER: Optional[threading.Thread] = None
_ASYNC_ERROR: Optional[BaseException] = None

# One compiled device-side copy per tree structure. Without donation XLA
# allocates fresh output buffers, so the snapshot stays valid even after the
# next train step donates-and-invalidates the live state.
_copy_tree = jax.jit(lambda t: jax.tree.map(lambda x: x.copy(), t))


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


def save_checkpoint_async(checkpoints_dir: str, state: TrainState, epoch: int,
                          extra: Optional[Dict[str, Any]] = None) -> None:
    """Save without stalling the train loop.

    The full-state D2H through the axon tunnel (~0.03 GB/s) costs minutes;
    done inline it freezes training at every checkpoint epoch. Here the state
    is device-copied in one dispatch (cheap; the copy cannot be invalidated
    by the train step's buffer donation), then a daemon thread pulls it to
    host and writes the orbax checkpoint while the loop keeps dispatching.
    At most one save is in flight; a second call joins the first. orbax
    writes are atomic (tmp dir + rename), so an interrupt mid-save can only
    lose that save, never corrupt an earlier one.
    """
    global _ASYNC_SAVER
    wait_for_async_save()
    snap = _copy_tree({
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "global_step": state.global_step,
    })

    def _run():
        global _ASYNC_ERROR
        try:
            host = jax.tree.map(np.asarray, jax.device_get(snap))
            host_state = TrainState(params=host["params"],
                                    bn_state=host["bn_state"],
                                    opt_state=host["opt_state"],
                                    global_step=host["global_step"])
            save_checkpoint(checkpoints_dir, host_state, epoch, extra)
        except BaseException as e:  # noqa: BLE001 — re-raised at the join
            _ASYNC_ERROR = e

    _ASYNC_SAVER = threading.Thread(target=_run, daemon=True,
                                    name=f"ckpt-save-epoch{epoch}")
    _ASYNC_SAVER.start()


def wait_for_async_save() -> None:
    """Block until any in-flight async checkpoint save has finished.
    Re-raises an exception the background save hit (disk full, orbax error) —
    a silently lost checkpoint must not look like a successful run."""
    global _ASYNC_SAVER, _ASYNC_ERROR
    if _ASYNC_SAVER is not None and _ASYNC_SAVER.is_alive():
        _ASYNC_SAVER.join()
    _ASYNC_SAVER = None
    if _ASYNC_ERROR is not None:
        err, _ASYNC_ERROR = _ASYNC_ERROR, None
        raise RuntimeError("async checkpoint save failed") from err


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
    path = os.path.abspath(path)  # orbax rejects relative paths
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
    path = os.path.abspath(path)  # orbax rejects relative paths
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    return (jax.tree.map(np.asarray, restored["params"]),
            jax.tree.map(np.asarray, restored["bn_state"]))
