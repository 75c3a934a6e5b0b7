"""Training orchestration (reference `rl4co/utils/trainer.py:19-147` RL4COTrainer).

The Lightning fit-loop becomes a plain epoch loop around one jitted train
step; per-epoch dataset regeneration (reference `rl/common/base.py:264-273`)
is just RNG key folding — every step generates a fresh on-device batch.
Speed metrics mirror the reference `SpeedMonitor`
(`utils/callbacks/speed_monitor.py:12-113`), plus the BASELINE.md
first-class metric env-steps/s.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Optional

import jax
import numpy as np

from rl4co_tpu.rl.baselines import RolloutBaseline, WarmupBaseline


@dataclasses.dataclass
class TrainerConfig:
    epochs: int = 10
    batch_size: int = 512
    train_data_size: int = 1_280_000   # samples per epoch (reference base.yaml)
    val_data_size: int = 10_000
    val_batch_size: int = 1024
    seed: int = 1234
    log_every: int = 50
    # jax profiler trace (reference SpeedMonitor analog, SURVEY.md §5): when
    # set, captures `profile_steps` train steps of epoch 0 into this dir
    # (view with TensorBoard / xprof).
    profile_dir: Optional[str] = None
    profile_steps: int = 5


class Trainer:
    """Minimal epoch-loop trainer around an algorithm object exposing
    ``init / make_train_step / make_eval_step / epoch_end``."""

    def __init__(
        self,
        algorithm,
        config: TrainerConfig = None,
        mesh=None,
        logger: Optional[Callable[[dict], None]] = None,
    ):
        self.algo = algorithm
        self.config = config or TrainerConfig()
        self.mesh = mesh
        self.logger = logger or (lambda m: print({k: _fmt(v) for k, v in m.items()}))
        self.history: list[dict] = []

    def fit(self) -> Any:
        cfg = self.config
        env = self.algo.env
        key = jax.random.PRNGKey(cfg.seed)
        kinit, kdata, kval, krun = jax.random.split(key, 4)

        state = self.algo.init(kinit)
        host: dict = {}

        # param-count logging (reference `utils/utils.py:131-173`
        # log_hyperparameters: model/params/total etc.)
        n_params = sum(
            x.size for x in jax.tree_util.tree_leaves(state.params)
        )
        self.logger({"model/params_total": n_params, "seed": cfg.seed,
                     "batch_size": cfg.batch_size, "epochs": cfg.epochs})

        # Rollout-baseline setup: held-out eval set + incumbent rewards
        # (reference `baselines.py:171-187` post_setup_hook).
        bl = getattr(self.algo, "baseline", None)
        needs_eval_set = isinstance(bl, (RolloutBaseline, WarmupBaseline)) and (
            not isinstance(bl, WarmupBaseline) or isinstance(bl.inner, RolloutBaseline)
        )
        if needs_eval_set:
            n_eval = min(cfg.val_data_size, 2048)
            host["eval_instances"] = env.generate_batch(kdata, n_eval)
            host["eval_rewards"] = np.asarray(
                self.algo.greedy_reward_fn()(state.params, host["eval_instances"])
            )

        val_instances = env.generate_batch(kval, cfg.val_data_size)

        train_step = self.algo.make_train_step(cfg.batch_size, mesh=self.mesh)
        eval_step = self.algo.make_eval_step()
        steps_per_epoch = max(1, cfg.train_data_size // cfg.batch_size)

        profiling = False
        for epoch in range(cfg.epochs):
            kepoch = jax.random.fold_in(krun, epoch)
            t0 = time.perf_counter()
            for it in range(steps_per_epoch):
                if cfg.profile_dir and epoch == 0 and it == 1:
                    # skip step 0 (compile); trace steady-state steps
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                state, metrics = train_step(state, kepoch)
                if profiling and it >= cfg.profile_steps:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                if it % cfg.log_every == 0:
                    metrics = jax.device_get(metrics)
                    self.logger({"epoch": epoch, "it": it, **metrics})
            if profiling:  # short epoch: close the trace before validation
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
            jax.block_until_ready(state.params)
            train_s = time.perf_counter() - t0

            # validation (greedy; reference logs val/reward per epoch)
            val_metrics = self._validate(eval_step, state.params, val_instances, kepoch)
            steps = steps_per_epoch * cfg.batch_size * env.max_steps
            record = {
                "epoch": epoch,
                "time/epoch_s": train_s,
                "env_steps_per_s": steps / train_s,
                **{f"val/{k}": v for k, v in val_metrics.items()},
            }
            self.history.append(jax.device_get(record))
            self.logger(record)

            state, host = self.algo.epoch_end(state, host)

        return state

    def test(self, state, datasets: Optional[dict] = None, key=None) -> dict:
        """Test phase (reference `tasks/train.py:79-86` trainer.test after fit;
        multiple *named* test datasets per `rl/common/base.py:281-316`).

        ``datasets``: ``{name: instances}`` pytrees (e.g. loaded with
        `rl4co_tpu.data.io.load_npz`); defaults to one freshly generated set
        named ``"test"`` (reference convention: test seed 1234, 10k).
        Returns ``{f"test/{name}/reward": float}`` and logs it.
        """
        cfg = self.config
        key = key if key is not None else jax.random.PRNGKey(cfg.seed)
        if datasets is None:
            datasets = {
                "test": self.algo.env.generate_batch(key, cfg.val_data_size)
            }
        eval_step = self.algo.make_eval_step()
        record = {}
        for name, instances in datasets.items():
            m = self._validate(eval_step, state.params, instances, key)
            for k, v in m.items():
                record[f"test/{name}/{k}"] = v
        self.history.append(record)
        self.logger(record)
        return record

    def _validate(self, eval_step, params, val_instances, key) -> dict:
        cfg = self.config
        n = jax.tree_util.tree_leaves(val_instances)[0].shape[0]
        rewards = []
        for start in range(0, n, cfg.val_batch_size):
            stop = min(start + cfg.val_batch_size, n)
            if stop - start < cfg.val_batch_size and start > 0:
                break  # drop ragged tail to avoid a recompile
            batch = jax.tree_util.tree_map(lambda x: x[start:stop], val_instances)
            m = eval_step(params, batch, key)
            rewards.append(float(m["reward"]))
        return {"reward": float(np.mean(rewards))}


def _fmt(v):
    try:
        return round(float(v), 5)
    except (TypeError, ValueError):
        return v
