"""Optimizer / LR-schedule factories (reference `rl4co/utils/optim_helpers.py:25-49`,
which resolves `torch.optim` classes by name; scheduler use in configs, e.g.
POMO's MultiStepLR([80, 95], 0.1) — `configs/experiment/routing/pomo.yaml`).

TPU-native equivalents over optax. Schedules are step-indexed; pass
``steps_per_epoch`` to express the reference's epoch-indexed milestones.
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax

OPTIMIZER_REGISTRY = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "adagrad": optax.adagrad,
    "lamb": optax.lamb,
    "lion": optax.lion,
    "adafactor": optax.adafactor,
}


def get_optimizer(
    name: str = "adam",
    learning_rate: float | optax.Schedule = 1e-4,
    grad_clip: Optional[float] = None,
    **kwargs,
) -> optax.GradientTransformation:
    """By-name optimizer factory (reference `optim_helpers.py:34-40`).

    ``learning_rate`` may be a float or an optax schedule (see
    :func:`get_lr_schedule`). ``grad_clip`` prepends global-norm clipping
    (reference trainer default 1.0, `utils/trainer.py:55`).
    """
    key = name.lower().replace("_", "")
    if key not in OPTIMIZER_REGISTRY:
        raise ValueError(
            f"Unknown optimizer '{name}'. Available: {sorted(OPTIMIZER_REGISTRY)}"
        )
    tx = OPTIMIZER_REGISTRY[key](learning_rate, **kwargs)
    if grad_clip is not None and grad_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def get_lr_schedule(
    name: str = "constant",
    learning_rate: float = 1e-4,
    *,
    milestones: Sequence[int] = (),
    gamma: float = 0.1,
    total_steps: Optional[int] = None,
    warmup_steps: int = 0,
    min_lr: float = 0.0,
    steps_per_epoch: int = 1,
) -> optax.Schedule:
    """By-name LR schedule factory (reference scheduler-by-name resolution,
    `optim_helpers.py:43-49`).

    names: ``constant`` | ``multistep`` (MultiStepLR: decay ×gamma at each
    milestone epoch) | ``cosine`` | ``exponential`` (×gamma per epoch) |
    ``linear_warmup`` (warmup then constant). Milestones / decay are given in
    epochs and converted with ``steps_per_epoch``.
    """
    n = name.lower()
    if n == "constant":
        sched = optax.constant_schedule(learning_rate)
    elif n in ("multistep", "multisteplr"):
        boundaries = {int(m) * steps_per_epoch: gamma for m in milestones}
        sched = optax.piecewise_constant_schedule(learning_rate, boundaries)
    elif n in ("cosine", "cosineannealinglr"):
        if total_steps is None:
            raise ValueError("cosine schedule requires total_steps")
        sched = optax.cosine_decay_schedule(
            learning_rate, total_steps, alpha=min_lr / max(learning_rate, 1e-12)
        )
    elif n in ("exponential", "exponentiallr"):
        sched = optax.exponential_decay(
            learning_rate, steps_per_epoch, gamma, staircase=True
        )
    else:
        raise ValueError(f"Unknown schedule '{name}'")
    if warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, learning_rate, warmup_steps)
        sched = optax.join_schedules([warmup, sched], [warmup_steps])
    return sched
