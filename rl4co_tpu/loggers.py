"""Experiment logger adapters (reference `configs/logger/*.yaml` backends).

Hydra-instantiated Lightning loggers become small callables; all share the
`log(dict)` interface consumed by the Trainer. W&B is optional (gated
import); CSV/JSONL always available.
"""

from __future__ import annotations

import csv
import json
import os
import time
from typing import Optional


class JSONLLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._t0 = time.time()

    def __call__(self, metrics: dict) -> None:
        record = {"t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")


class CSVLogger:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._fieldnames: Optional[list] = None

    def __call__(self, metrics: dict) -> None:
        row = {}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                row[k] = str(v)
        write_header = self._fieldnames is None
        if write_header:
            self._fieldnames = list(row.keys())
        with open(self.path, "a", newline="") as f:
            writer = csv.DictWriter(f, fieldnames=self._fieldnames, extrasaction="ignore")
            if write_header:
                writer.writeheader()
            writer.writerow(row)


class WandbLogger:
    """Optional Weights & Biases adapter (no-op if wandb unavailable)."""

    def __init__(self, project: str = "rl4co-tpu", **kwargs):
        try:
            import wandb  # type: ignore

            self.run = wandb.init(project=project, **kwargs)
            self._wandb = wandb
        except Exception:
            self.run = None
            self._wandb = None

    def __call__(self, metrics: dict) -> None:
        if self._wandb is None:
            return
        self._wandb.log({k: v for k, v in metrics.items()})


class TensorBoardLogger:
    """TensorBoard event-file adapter (reference
    `configs/logger/tensorboard.yaml`). Scalars land next to any jax
    profiler traces written to the same logdir, so metrics + traces share
    one UI. Steps: uses the ``step`` metric when present (the Trainer logs
    it), else an internal counter."""

    def __init__(self, logdir: str):
        from torch.utils.tensorboard import SummaryWriter

        os.makedirs(logdir, exist_ok=True)
        self.writer = SummaryWriter(log_dir=logdir)
        self._auto_step = 0

    def __call__(self, metrics: dict) -> None:
        step = metrics.get("step", metrics.get("it", self._auto_step))
        try:
            step = int(step)
        except (TypeError, ValueError):
            step = self._auto_step
        for k, v in metrics.items():
            if k in ("step", "it"):
                continue
            try:
                self.writer.add_scalar(k, float(v), global_step=step)
            except (TypeError, ValueError):
                continue
        self.writer.flush()
        self._auto_step = max(self._auto_step + 1, step + 1)


class MLflowFileLogger:
    """MLflow *file-store* adapter (reference `configs/logger/mlflow.yaml`)
    with no mlflow dependency: writes the `mlruns/` directory layout the
    MLflow UI reads natively — `meta.yaml` per experiment/run, one
    `metrics/<name>` file of ``timestamp value step`` lines, `params/<name>`
    files for non-numeric entries."""

    def __init__(self, root: str = "mlruns", experiment: str = "rl4co-tpu",
                 run_name: Optional[str] = None):
        import uuid

        self.exp_id = "0"
        self.run_id = uuid.uuid4().hex
        self.run_dir = os.path.join(root, self.exp_id, self.run_id)
        os.makedirs(os.path.join(self.run_dir, "metrics"), exist_ok=True)
        os.makedirs(os.path.join(self.run_dir, "params"), exist_ok=True)
        exp_meta = os.path.join(root, self.exp_id, "meta.yaml")
        if not os.path.exists(exp_meta):
            with open(exp_meta, "w") as f:
                f.write(
                    f"artifact_location: {os.path.abspath(root)}/{self.exp_id}\n"
                    f"experiment_id: '{self.exp_id}'\n"
                    f"lifecycle_stage: active\nname: {experiment}\n"
                )
        now_ms = int(time.time() * 1000)
        with open(os.path.join(self.run_dir, "meta.yaml"), "w") as f:
            f.write(
                f"artifact_uri: {os.path.abspath(self.run_dir)}/artifacts\n"
                f"end_time: null\nentry_point_name: ''\n"
                f"experiment_id: '{self.exp_id}'\nlifecycle_stage: active\n"
                f"run_id: {self.run_id}\nrun_name: {run_name or self.run_id[:8]}\n"
                f"run_uuid: {self.run_id}\nsource_name: ''\nsource_type: 4\n"
                f"source_version: ''\nstart_time: {now_ms}\nstatus: 1\n"
                f"tags: []\nuser_id: {os.environ.get('USER', 'rl4co')}\n"
            )
        self._step = 0

    @staticmethod
    def _safe(name: str) -> str:
        return name.replace("/", "-").replace(" ", "_")

    def __call__(self, metrics: dict) -> None:
        step = metrics.get("step", metrics.get("it", self._step))
        try:
            step = int(step)
        except (TypeError, ValueError):
            step = self._step
        now_ms = int(time.time() * 1000)
        for k, v in metrics.items():
            try:
                val = float(v)
            except (TypeError, ValueError):
                # non-numeric → param file (last write wins, like mlflow)
                with open(os.path.join(self.run_dir, "params",
                                       self._safe(k)), "w") as f:
                    f.write(str(v))
                continue
            with open(os.path.join(self.run_dir, "metrics",
                                   self._safe(k)), "a") as f:
                f.write(f"{now_ms} {val} {step}\n")
        self._step = max(self._step + 1, step + 1)


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = loggers

    def __call__(self, metrics: dict) -> None:
        for lg in self.loggers:
            lg(metrics)
