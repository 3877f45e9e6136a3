"""Learning-rate schedules (reference: src/utils/train_utils.py:53-77).

Two schedules with the reference's exact shapes and stepping semantics:

- `multi_step`: quartic burn-in then x0.1 / x0.01 decays, evaluated per
  *optimizer iteration* (the reference steps LambdaLR every batch);
- `cosin`: (1 + cos(pi * epoch / num_epochs)) / 2 * 0.9 + 0.1, evaluated per
  *epoch*.

Both are pure functions (step|epoch -> multiplier); the trainer multiplies by
the base LR and feeds the result into the jitted step, so LR changes never
retrace.
"""

from __future__ import annotations

import math
from typing import Callable, Sequence


def multi_step_factor(burn_in: int, steps: Sequence[int]) -> Callable[[int], float]:
    s0, s1 = int(steps[0]), int(steps[1])

    def factor(iteration: int) -> float:
        if iteration < burn_in:
            return float(pow(iteration / burn_in, 4))
        if iteration < s0:
            return 1.0
        if iteration < s1:
            return 0.1
        return 0.01

    return factor


def cosine_factor(num_epochs: int) -> Callable[[int], float]:
    def factor(epoch: int) -> float:
        return ((1 + math.cos(epoch * math.pi / num_epochs)) / 2) * 0.9 + 0.1

    return factor


def plot_lr_schedule(lr_fn, num_epochs: int, iters_per_epoch: int,
                     save_path: str) -> None:
    """Plot the LR curve to a file (reference: train_utils.py:142-158)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    xs, ys = [], []
    it = 0
    for epoch in range(num_epochs):
        for _ in range(iters_per_epoch):
            xs.append(it)
            ys.append(lr_fn(it, epoch))
            it += 1
    plt.figure(figsize=(8, 4))
    plt.plot(xs, ys)
    plt.xlabel("iteration")
    plt.ylabel("learning rate")
    plt.tight_layout()
    plt.savefig(save_path, dpi=120)
    plt.close()


def make_lr_fn(lr_type: str, base_lr: float, *, burn_in: int = 50,
               steps: Sequence[int] = (1500, 4000), num_epochs: int = 300
               ) -> Callable[[int, int], float]:
    """(global_iteration, epoch_index) -> learning rate."""
    if lr_type == "multi_step":
        f = multi_step_factor(burn_in, steps)
        return lambda it, epoch: base_lr * f(it)
    if lr_type == "cosin":
        f = cosine_factor(num_epochs)
        return lambda it, epoch: base_lr * f(epoch)
    raise ValueError(f"unknown lr_type {lr_type!r} (multi_step|cosin)")
