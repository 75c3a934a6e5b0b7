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


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = loggers

    def __call__(self, metrics: dict) -> None:
        for lg in self.loggers:
            lg(metrics)
