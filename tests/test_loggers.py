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


def test_mlflow_finalize_marks_finished(tmp_path):
    """finalize() rewrites meta.yaml with status 3 (FINISHED) + end_time so
    the MLflow UI stops showing the run as eternally running (ADVICE r3)."""
    from rl4co_tpu.loggers import MLflowFileLogger, MultiLogger

    lg = MLflowFileLogger(root=str(tmp_path / "mlruns"), run_name="t")
    lg({"loss": 1.0})
    meta = (tmp_path / "mlruns" / "0" / lg.run_id / "meta.yaml")
    assert "status: 1" in meta.read_text()
    MultiLogger(lg).finalize()
    text = meta.read_text()
    assert "status: 3" in text and "end_time: null" not in text


def test_import_guarded_remote_loggers_noop():
    """neptune/comet/aim adapters (reference `configs/logger/*.yaml`) must
    degrade to no-ops when their packages are absent from the image."""
    from rl4co_tpu.loggers import AimLogger, CometLogger, NeptuneLogger

    for cls in (NeptuneLogger, CometLogger, AimLogger):
        lg = cls()
        lg({"loss": 1.0, "step": 1})  # must not raise
        lg.finalize()


def test_megatron_paired_sharding(tmp_path):
    """FFN down-projection / attention out-projection kernels are
    row-sharded P('model', None) so each encoder block needs one reduction
    instead of an all-gather per matmul (ADVICE r3)."""
    import jax
    from jax.tree_util import keystr, tree_flatten_with_path

    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.models.policies.constructive import init_policy_params
    from rl4co_tpu.parallel.mesh import make_mesh, shard_params_model_axis

    env = get_env("tsp", num_loc=8)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2, normalization="instance")
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    mesh = make_mesh(devices=jax.devices()[:4], dp=2, model=2)
    sharded = shard_params_model_axis(params, mesh, min_dim=8)
    flat, _ = tree_flatten_with_path(sharded)
    specs = {keystr(p): str(x.sharding.spec) for p, x in flat
             if getattr(x, "ndim", 0) == 2}
    row = [k for k, s in specs.items() if s.startswith("PartitionSpec('model'")]
    col = [k for k, s in specs.items() if "None, 'model'" in s]
    assert any("Dense_1" in k for k in row), specs
    assert any("out_proj" in k for k in row), specs
    assert any("Dense_0" in k for k in col), specs
