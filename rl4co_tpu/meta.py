"""Reptile meta-learning across task distributions
(reference `rl4co/utils/meta_trainer.py:16-190` `ReptileCallback`).

Per epoch: sample a task (problem size / distribution), inner-train the task
model for the epoch from the current meta-weights, then move the meta-weights
toward the task result:  θ_meta ← θ_meta + β (θ_task − θ_meta), with β
decayed linearly over epochs (`meta_trainer.py:52-120`).
"""

from __future__ import annotations

import dataclasses
import random
from typing import Callable, Sequence

import jax


@dataclasses.dataclass
class ReptileConfig:
    meta_beta: float = 1.0          # initial outer step size (alpha in ref)
    beta_decay: bool = True         # linear decay to 0 over epochs
    tasks: Sequence[dict] = (       # task space: env kwargs variations
        {"num_loc": 20}, {"num_loc": 50}, {"num_loc": 100},
    )
    seed: int = 0


class Reptile:
    """Host-side meta-loop driver around per-task algorithm factories.

    ``make_algo(task_kwargs)`` builds an algorithm (e.g. POMO on TSP-n);
    inner training runs ``steps_per_task`` jitted train steps from the
    current meta params.
    """

    def __init__(self, make_algo: Callable[[dict], object], config: ReptileConfig):
        self.make_algo = make_algo
        self.config = config
        self._rng = random.Random(config.seed)

    def sample_task(self) -> dict:
        return self._rng.choice(list(self.config.tasks))

    def beta_at(self, epoch: int, total_epochs: int) -> float:
        if not self.config.beta_decay:
            return self.config.meta_beta
        return self.config.meta_beta * (1.0 - epoch / max(total_epochs, 1))

    def outer_update(self, meta_params, task_params, beta: float):
        """θ_meta + β (θ_task − θ_meta) (reference `meta_trainer.py:100-118`)."""
        return jax.tree_util.tree_map(
            lambda m, t: m + beta * (t - m), meta_params, task_params
        )

    def run(
        self,
        key: jax.Array,
        epochs: int,
        steps_per_task: int,
        batch_size: int,
        logger=print,
    ):
        # initialize meta params from the first task's algorithm
        algo = self.make_algo(self.sample_task())
        state = algo.init(key)
        meta_params = state.params
        for epoch in range(epochs):
            task = self.sample_task()
            algo = self.make_algo(task)
            state = algo.init(jax.random.fold_in(key, epoch))
            state = state.replace(params=meta_params)
            train_step = algo.make_train_step(batch_size, donate=False)
            metrics = {}
            for it in range(steps_per_task):
                state, metrics = train_step(state, jax.random.fold_in(key, epoch * 10007 + it))
            beta = self.beta_at(epoch, epochs)
            meta_params = self.outer_update(meta_params, state.params, beta)
            logger({"epoch": epoch, "task": task, "beta": round(beta, 4),
                    "loss": float(metrics.get("loss", float("nan")))})
        return meta_params
