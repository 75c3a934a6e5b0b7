"""Checkpoint / resume via Orbax (SURVEY.md §5: orbax checkpoints of
{params, opt state, baseline params, RNG/step}).

Reference equivalent: Lightning `ModelCheckpoint` + `trainer.fit(ckpt_path)`
(`configs/callbacks/default.yaml:9-17`, `rl4co/tasks/train.py:75`) and the
custom baseline-restoring `REINFORCE.load_from_checkpoint`
(`rl/reinforce/reinforce.py:163-208`) — here the whole TrainState pytree
(including the rollout baseline's params snapshot) is saved as one atom.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, state: Any, step: int | None = None) -> str:
    """Save a TrainState pytree; returns the checkpoint directory."""
    path = os.path.abspath(path)
    if step is not None:
        path = os.path.join(path, f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def restore_checkpoint(path: str, target: Any) -> Any:
    """Restore into the structure of ``target`` (a template TrainState)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=jax.device_get(target))
    return restored


def restore_checkpoint_raw(path: str) -> Any:
    """Restore without a template: returns the raw pytree (dataclasses come
    back as plain dicts keyed by field name). Useful for eval-only loads
    that need just ``["state"]["params"]`` and must not depend on the
    training run's exact host-state shapes (e.g. the rollout baseline's
    eval_rewards length)."""
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path)


def latest_step_dir(root: str) -> str | None:
    if not os.path.isdir(root):
        return None
    steps = [d for d in os.listdir(root) if d.startswith("step_")]
    if not steps:
        return None
    best = max(steps, key=lambda d: int(d.split("_")[1]))
    return os.path.join(root, best)
