"""Optimizer factory: optax equivalents of the reference schedules.

Reference (reference: utils/utils.py:29-41): SGD(lr, wd) + MultiStepLR
milestones [10, 26] gamma 0.1; Adam(lr, wd) + MultiStepLR [25, 36] gamma 0.1,
stepped once per epoch. The Mnet driver builds SGD(1e-3, momentum .9) +
MultiStepLR [6, 21] inline (reference: kfold_train_Mnet.py:85-86); the ADVIT
driver uses Adam with no scheduler (reference: kfold_train_ADVIT.py:84-85).

Here the schedule is a step-indexed optax schedule (epoch milestones *
steps_per_epoch), so the whole update stays inside one jitted train step.
torch-Adam semantics: L2 weight decay is added to the gradient *before* the
moment updates (optax.add_decayed_weights chained before adam).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import optax

MILESTONES = {"SGD": (10, 26), "Adam": (25, 36), "Mnet": (6, 21)}


def multistep_schedule(lr: float, milestones: Sequence[int],
                       steps_per_epoch: int, gamma: float = 0.1):
    """MultiStepLR: lr * gamma^(#milestones passed), milestones in epochs."""
    boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


def build_optimizer(
    name: str = "Adam",
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    steps_per_epoch: int = 1,
    milestones: Optional[Sequence[int]] = None,
    gamma: float = 0.1,
    momentum: float = 0.0,
) -> Tuple[optax.GradientTransformation, optax.Schedule]:
    """Returns (tx, lr_schedule). `name`: 'Adam' | 'SGD'.

    milestones=None uses the reference defaults for the optimizer; pass
    milestones=() for a constant LR (ADVIT driver).
    """
    if milestones is None:
        milestones = MILESTONES[name]
    if milestones:
        schedule = multistep_schedule(lr, milestones, steps_per_epoch, gamma)
    else:
        schedule = optax.constant_schedule(lr)

    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if name == "Adam":
        parts.append(optax.inject_hyperparams(optax.adam)(learning_rate=schedule))
    elif name == "SGD":
        parts.append(
            optax.inject_hyperparams(optax.sgd)(
                learning_rate=schedule, momentum=momentum or None
            )
        )
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = optax.chain(*parts) if len(parts) > 1 else parts[0]
    return tx, schedule
