"""Logger backend tests (reference `configs/logger/*.yaml` breadth)."""

import json

from rl4co_tpu.loggers import (
    CSVLogger,
    JSONLLogger,
    MultiLogger,
    TensorBoardLogger,
)


def test_jsonl_and_csv_roundtrip(tmp_path):
    jl = JSONLLogger(str(tmp_path / "m.jsonl"))
    cl = CSVLogger(str(tmp_path / "m.csv"))
    ml = MultiLogger(jl, cl)
    ml({"step": 0, "loss": 1.5, "note": "a"})
    ml({"step": 1, "loss": 1.25, "note": "b"})
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[1])["loss"] == 1.25
    csv_lines = (tmp_path / "m.csv").read_text().strip().splitlines()
    assert csv_lines[0].startswith("step") and len(csv_lines) == 3


def test_tensorboard_logger_writes_events(tmp_path):
    logdir = tmp_path / "tb"
    tb = TensorBoardLogger(str(logdir))
    tb({"step": 0, "loss": 2.0, "reward": -4.0})
    tb({"step": 1, "loss": 1.0, "reward": -3.0, "tag": "not-a-number"})
    tb.writer.close()
    events = list(logdir.glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0
    # scalars really landed: read them back with the tensorboard reader
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )

    acc = EventAccumulator(str(logdir))
    acc.Reload()
    assert "loss" in acc.Tags()["scalars"]
    vals = [s.value for s in acc.Scalars("loss")]
    assert vals == [2.0, 1.0]


def test_mlflow_file_logger_layout(tmp_path):
    """MLflowFileLogger writes the mlruns file-store layout the MLflow UI
    reads: experiment/run meta.yaml, `timestamp value step` metric lines,
    param files for non-numeric values."""
    from rl4co_tpu.loggers import MLflowFileLogger

    lg = MLflowFileLogger(root=str(tmp_path / "mlruns"), run_name="t")
    lg({"loss": 1.5, "it": 3, "note": "hello"})
    lg({"loss": 1.25, "it": 4})
    run_dir = tmp_path / "mlruns" / "0" / lg.run_id
    assert (tmp_path / "mlruns" / "0" / "meta.yaml").exists()
    assert (run_dir / "meta.yaml").exists()
    lines = (run_dir / "metrics" / "loss").read_text().strip().splitlines()
    assert len(lines) == 2
    ts, val, step = lines[1].split()
    assert float(val) == 1.25 and int(step) == 4
    assert (run_dir / "params" / "note").read_text() == "hello"
