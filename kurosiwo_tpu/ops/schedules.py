"""Learning-rate schedules (optax-style callables step -> lr).

Parity with the reference scheduler factory
(`/root/reference/utilities/utilities.py:268-304`) and the MAE per-iteration
schedule (`/root/reference/training/train_mae.py:14-32`). The reference steps
its epoch-level schedulers once per *epoch* even though the cosine one is
constructed with T_max=len(train_loader); we therefore express epoch-level
schedules as functions of the epoch index and wrap them per-step.
"""

from __future__ import annotations

import math
from typing import Callable


# NOTE: schedules are HOST-side (the lr is fed into the jitted step as a
# scalar argument via optim.inject_lr) — plain math keeps them free. The
# earlier jnp formulation dispatched a tiny op to the (remote, tunnel-bound)
# default TPU backend and blocked on float() EVERY training iteration.


def cosine_annealing(base_lr: float, t_max: int, eta_min: float = 0.0) -> Callable:
    """torch CosineAnnealingLR: lr(e) = eta_min + (base-eta_min)*(1+cos(pi*e/T))/2."""

    def schedule(epoch):
        return eta_min + (base_lr - eta_min) * (1 + math.cos(math.pi * float(epoch) / t_max)) / 2

    return schedule


def linear_decay(base_lr: float, epochs: int) -> Callable:
    """Reference 'linear': lr(e) = base * (1 - e / (epochs + 1))."""

    def schedule(epoch):
        return base_lr * (1.0 - epoch / float(epochs + 1))

    return schedule


def step_decay(base_lr: float, epochs: int, gamma: float = 0.1) -> Callable:
    """Reference 'step' branch is broken (undefined name,
    utilities/utilities.py:293); implemented here as the obvious intent:
    StepLR with step_size=epochs//3."""
    step_size = max(epochs // 3, 1)

    def schedule(epoch):
        return base_lr * (gamma ** (epoch // step_size))

    return schedule


def constant(base_lr: float) -> Callable:
    def schedule(epoch):
        del epoch
        return float(base_lr)

    return schedule


def mae_warmup_cosine(
    base_lr: float, min_lr: float, warmup_epochs: float, total_epochs: float
) -> Callable:
    """Per-iteration warmup + half-cycle cosine (train_mae.py:14-32). The
    argument is a fractional epoch (epoch + iter/steps_per_epoch)."""

    def schedule(frac_epoch):
        frac_epoch = float(frac_epoch)
        if frac_epoch < warmup_epochs:
            return base_lr * frac_epoch / max(warmup_epochs, 1e-12)
        denom = max(total_epochs - warmup_epochs, 1e-12)
        return min_lr + (base_lr - min_lr) * 0.5 * (
            1.0 + math.cos(math.pi * (frac_epoch - warmup_epochs) / denom)
        )

    return schedule


def create_lr_schedule(config: dict, model_config: dict, steps_per_epoch: int) -> Callable:
    """Factory mirroring init_lr_scheduler's selection; returns lr(epoch)."""
    name = model_config.get("lr_schedule")
    base_lr = float(model_config.get("learning_rate", config.get("learning_rate", 1e-3)))
    if name == "cosine":
        # The reference builds CosineAnnealingLR with T_max = len(train_loader)
        # but steps it per-epoch — replicated verbatim.
        return cosine_annealing(base_lr, max(steps_per_epoch, 1))
    if name is None:
        return constant(base_lr)
    if name == "linear":
        return linear_decay(base_lr, int(config.get("epochs", 1)))
    if name == "step":
        return step_decay(base_lr, int(config.get("epochs", 1)))
    raise NotImplementedError(f"{name} LR scheduling is not implemented")
