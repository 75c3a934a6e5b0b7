"""Training orchestration (reference `rl4co/utils/trainer.py:19-147` RL4COTrainer).

The Lightning fit-loop becomes a plain epoch loop around one jitted train
step; per-epoch dataset regeneration (reference `rl/common/base.py:264-273`)
is just RNG key folding — every step generates a fresh on-device batch.
Speed metrics mirror the reference `SpeedMonitor`
(`utils/callbacks/speed_monitor.py:12-113`), plus the BASELINE.md
first-class metric env-steps/s.

Checkpointing mirrors the reference `ModelCheckpoint` callback
(`configs/callbacks/default.yaml:9-17`): monitor ``val/reward`` (max),
keep top-1 (``best``) + ``last``; resume via ``fit(resume_from=...)``
(reference `trainer.fit(ckpt_path)`, `rl4co/tasks/train.py:75`).
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
    # Checkpointing (reference ModelCheckpoint: monitor val/reward max,
    # save_top_k=1 + save_last). When ckpt_dir is set, `fit` writes
    # `<ckpt_dir>/last` every epoch and `<ckpt_dir>/best` whenever the
    # monitored value improves.
    ckpt_dir: Optional[str] = None
    ckpt_every: int = 1                # save `last` every N epochs
    monitor: str = "reward"            # metric of the primary val set, maximized
    # Wall-time budget: stop cleanly after the first epoch that ends beyond
    # this many hours (checkpointing `last` so `fit(resume_from=...)` picks
    # up the identical schedule). For preempted/time-sliced accelerator
    # quotas — the reference has no equivalent (Lightning `max_time` analog).
    max_hours: Optional[float] = None
    # Steps fused into one dispatch when the algorithm supports chained
    # train steps (`make_train_step(chunk=...)`). None → auto: the largest
    # divisor of steps_per_epoch ≤ log_every. 1 → one dispatch per step.
    # The RNG schedule is identical either way (steps fold the key with
    # state.step); chaining only amortizes the per-dispatch round trip,
    # which on the axon TPU tunnel is a large fraction of a small-batch step.
    steps_per_dispatch: Optional[int] = None


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

    def fit(
        self,
        resume_from: Optional[str] = None,
        val_datasets: Optional[dict] = None,
    ) -> Any:
        """Run the training loop (logger teardown guaranteed — see _fit).

        See :meth:`_fit` for the argument docs.
        """
        try:
            return self._fit(resume_from, val_datasets)
        finally:
            # teardown on ANY exit — exception or Ctrl-C included, so
            # MLflow runs don't stay status RUNNING forever and buffered
            # remote-backend metrics are flushed (ADVICE r4 #1)
            fin = getattr(self.logger, "finalize", None)
            if callable(fin):
                fin()

    def _fit(
        self,
        resume_from: Optional[str] = None,
        val_datasets: Optional[dict] = None,
    ) -> Any:
        """Run the training loop.

        Args:
            resume_from: checkpoint directory written by a previous ``fit``
                (``<ckpt_dir>/last`` or ``/best``). Restores params, optimizer
                and baseline state, epoch counter, and the rollout baseline's
                incumbent rewards, then continues — the RNG stream is derived
                from (seed, epoch, step), so a resumed run replays the exact
                uninterrupted schedule.
            val_datasets: ``{name: instances}`` evaluated every epoch
                (reference multiple named val dataloaders,
                `rl/common/base.py:281-316`). The first entry is the primary
                set whose ``val/reward`` is monitored for `best` checkpoints.
                Defaults to one generated set logged as plain ``val/*``.
        """
        cfg = self.config
        env = self.algo.env
        # Derive the seed keys on the host CPU backend and hold them as
        # uncommitted numpy values: feeding an accelerator-resident key into
        # the CPU-backend init (or vice versa) forces a cross-backend
        # transfer that deadlocks on the axon TPU tunnel (round-3 stack:
        # `_array_shard_arg` inside the very first `random.split`). Numpy
        # keys transfer h2d transparently wherever they are first used.
        with jax.default_device(self._cpu_device() or jax.devices()[0]):
            key = jax.random.PRNGKey(cfg.seed)
            kinit, kdata, kval, krun = (
                np.asarray(k) for k in jax.random.split(key, 4)
            )

        state = self._init_state(kinit)
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

        if val_datasets is None:
            val_datasets = {"": env.generate_batch(kval, cfg.val_data_size)}

        start_epoch = 0
        best_monitor = -np.inf
        if resume_from is not None:
            from rl4co_tpu.checkpoint import restore_checkpoint

            template = _ckpt_tree(state, 0, best_monitor, host)
            restored = restore_checkpoint(resume_from, template)
            state = restored["state"]
            start_epoch = int(restored["epoch"])
            best_monitor = float(restored["best_monitor"])
            if "eval_rewards" in restored:
                host["eval_rewards"] = np.asarray(restored["eval_rewards"])
            self.logger({"resumed_from": resume_from, "epoch": start_epoch,
                         "best_monitor": best_monitor})

        steps_per_epoch = max(1, cfg.train_data_size // cfg.batch_size)
        chunk = self._pick_chunk(steps_per_epoch)
        train_step = self.algo.make_train_step(
            cfg.batch_size, mesh=self.mesh,
            **({"chunk": chunk} if chunk > 1 else {}),
        )
        eval_step = self.algo.make_eval_step()

        profiling = False
        fit_t0 = time.perf_counter()
        for epoch in range(start_epoch, cfg.epochs):
            kepoch = jax.random.fold_in(krun, epoch)
            t0 = time.perf_counter()
            for it in range(0, steps_per_epoch, chunk):
                if cfg.profile_dir and epoch == start_epoch and it == chunk:
                    # skip dispatch 0 (compile); trace steady-state steps
                    jax.profiler.start_trace(cfg.profile_dir)
                    profiling = True
                state, metrics = train_step(state, kepoch)
                if profiling and it // chunk >= cfg.profile_steps:
                    jax.block_until_ready(state.params)
                    jax.profiler.stop_trace()
                    profiling = False
                if chunk > 1:
                    # Fetch every dispatch: serializes the tunnel (queued
                    # donated executions can deadlock the axon backend) and
                    # costs one RTT per `chunk` steps. Log the chunk's last
                    # step under its global step index.
                    metrics = jax.device_get(metrics)
                    self.logger({
                        "epoch": epoch, "it": it + chunk - 1,
                        **{k: v[-1] for k, v in metrics.items()},
                    })
                elif it % cfg.log_every == 0:
                    metrics = jax.device_get(metrics)
                    self.logger({"epoch": epoch, "it": it, **metrics})
            if profiling:  # short epoch: close the trace before validation
                jax.block_until_ready(state.params)
                jax.profiler.stop_trace()
                profiling = False
            jax.block_until_ready(state.params)
            train_s = time.perf_counter() - t0

            # validation on every named set (reference logs val/reward per epoch)
            record = {
                "epoch": epoch,
                "time/epoch_s": train_s,
            }
            # improvement envs have no fixed episode length (T_train moves
            # per batch instead of max_steps tokens)
            ep_len = getattr(env, "max_steps", None)
            if ep_len is None:
                ep_len = getattr(self.algo, "T_train", None)
            if ep_len is not None:
                record["env_steps_per_s"] = (
                    steps_per_epoch * cfg.batch_size * ep_len / train_s
                )
            monitor_val = None
            for name, instances in val_datasets.items():
                vm = self._validate(eval_step, state.params, instances, kepoch)
                prefix = f"val/{name}/" if name else "val/"
                record.update({f"{prefix}{k}": v for k, v in vm.items()})
                if monitor_val is None:
                    monitor_val = vm.get(cfg.monitor)
            self.history.append(jax.device_get(record))
            self.logger(record)

            state, host = self.algo.epoch_end(state, host)

            out_of_time = (
                cfg.max_hours is not None
                and time.perf_counter() - fit_t0 > cfg.max_hours * 3600
            )

            if cfg.ckpt_dir:
                from rl4co_tpu.checkpoint import save_checkpoint

                tree = _ckpt_tree(state, epoch + 1, max(best_monitor,
                                  monitor_val if monitor_val is not None else -np.inf),
                                  host)
                if ((epoch + 1) % cfg.ckpt_every == 0 or epoch + 1 == cfg.epochs
                        or out_of_time):
                    save_checkpoint(f"{cfg.ckpt_dir}/last", tree)
                if monitor_val is not None and monitor_val > best_monitor:
                    best_monitor = monitor_val
                    save_checkpoint(f"{cfg.ckpt_dir}/best", tree)
                    self.logger({"epoch": epoch, "ckpt/best_monitor": best_monitor})

            if out_of_time:
                self.logger({"epoch": epoch, "stopped": "max_hours",
                             "max_hours": cfg.max_hours})
                break

        return state

    @staticmethod
    def _cpu_device():
        try:
            return jax.devices("cpu")[0]
        except RuntimeError:
            return None

    def _init_state(self, kinit):
        """Algorithm init on the in-process CPU backend when the default
        backend is a remote accelerator: `init` runs dozens of tiny jit
        programs (param init, optimizer zeros), each costing a round trip
        on e.g. the axon TPU tunnel (~60 s total measured); on CPU it is
        ~7 s, then one transfer. ``kinit`` must be host-resident (numpy) —
        an accelerator-committed key would force a cross-backend transfer
        that deadlocks the axon tunnel."""
        cpu = self._cpu_device()
        if jax.default_backend() == "cpu" or cpu is None:
            state = self.algo.init(kinit)
        else:
            with jax.default_device(cpu):
                state = self.algo.init(kinit)
        # Place the state where the train step expects it. With a mesh, the
        # jitted step applies `with_sharding_constraint` over that mesh; a
        # state committed to device 0 alone would make the first dispatch
        # raise "Received incompatible devices for jitted computation", so
        # replicate over all mesh devices instead (params are replicated in
        # the dp design; model-axis sharding is applied by the step itself).
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            return jax.device_put(
                state, NamedSharding(self.mesh, PartitionSpec())
            )
        if jax.default_backend() == "cpu" or cpu is None:
            return state
        return jax.device_put(state, jax.devices()[0])

    def _pick_chunk(self, steps_per_epoch: int) -> int:
        """Largest divisor of steps_per_epoch ≤ the configured dispatch size,
        or 1 when the algorithm's ``make_train_step`` has no ``chunk`` param."""
        cfg = self.config
        if cfg.steps_per_dispatch == 1:
            return 1
        import inspect

        try:
            params = inspect.signature(self.algo.make_train_step).parameters
        except (TypeError, ValueError):
            return 1
        if "chunk" not in params:
            return 1
        target = min(cfg.steps_per_dispatch or cfg.log_every, steps_per_epoch)
        return max(c for c in range(1, target + 1) if steps_per_epoch % c == 0)

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
        """Full-set evaluation: every instance counts, batch means weighted by
        batch size (the ragged tail costs one extra compile, cached by shape)."""
        cfg = self.config
        n = jax.tree_util.tree_leaves(val_instances)[0].shape[0]
        sums: dict = {}
        total = 0
        for start in range(0, n, cfg.val_batch_size):
            stop = min(start + cfg.val_batch_size, n)
            batch = jax.tree_util.tree_map(lambda x: x[start:stop], val_instances)
            m = jax.device_get(eval_step(params, batch, key))
            w = stop - start
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v) * w
            total += w
        return {k: v / total for k, v in sums.items()}


def _ckpt_tree(state, epoch: int, best_monitor: float, host: dict) -> dict:
    """Composite checkpoint pytree: TrainState + trainer progress + the
    rollout baseline's incumbent rewards (reference REINFORCE checkpoints
    restore baseline state too, `rl/reinforce/reinforce.py:163-208`)."""
    tree = {
        "state": state,
        "epoch": np.int64(epoch),
        "best_monitor": np.float64(best_monitor),
    }
    if host.get("eval_rewards") is not None:
        tree["eval_rewards"] = np.asarray(host["eval_rewards"])
    return tree


def _fmt(v):
    try:
        return round(float(v), 5)
    except (TypeError, ValueError):
        return v
