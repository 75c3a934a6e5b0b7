"""Real multi-process `jax.distributed` test (VERDICT r2 §6).

Launches TWO separate OS processes, each owning one CPU device, joined via
`jax.distributed.initialize` — so the dp-mesh psum actually crosses a
process boundary over gRPC, unlike the in-process 8-device simulation in
test_sharding.py. Asserts bitwise-replicated metrics across ranks and loss
parity with a single-process 2-device run of the identical recipe.

Reference contract being matched: Lightning auto-DDP
(`rl4co/utils/trainer.py:73-86`) — multi-process data-parallel training is
numerically the same training run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

CHILD = os.path.join(os.path.dirname(__file__), "_distributed_child.py")


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_matches_single_process(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"rank{i}.json" for i in range(2)]
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)  # children force their own 1-device flag
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), "2", str(port), str(outs[i])],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
        assert p.returncode == 0, err[-2000:]

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["num_devices"] == 2 for r in results)
    # both ranks observe the SAME replicated global metrics (step_s is
    # per-rank wall time, legitimately different)
    for s0, s1 in zip(results[0]["steps"], results[1]["steps"]):
        assert (s0["loss"], s0["reward"]) == (s1["loss"], s1["reward"]), (s0, s1)

    # single-process 2-device reference of the identical recipe
    import jax

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.parallel.mesh import make_mesh, replicate
    from rl4co_tpu.rl.reinforce import REINFORCE

    envr = get_env("tsp", num_loc=8)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2, normalization="instance")
    algo = REINFORCE(env=envr, policy=policy, baseline="mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    mesh = make_mesh(devices=jax.devices()[:2], dp=2)
    state = replicate(algo.init(jax.random.PRNGKey(0)), mesh)
    step = algo.make_train_step(16, mesh=mesh, donate=False)
    for i, dist_step in enumerate(results[0]["steps"]):
        state, m = step(state, jax.random.PRNGKey(42 + i))
        np.testing.assert_allclose(float(m["reward"]), dist_step["reward"],
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m["loss"]), dist_step["loss"],
                                   rtol=2e-4, atol=1e-5)


def test_four_process_train_parity_and_timing(tmp_path):
    """4-process jax.distributed run (VERDICT r3 #8): metric parity at
    num_processes=4 plus the per-step wall-time curve vs a single-process
    4-device run — the only scaling-shaped evidence producible without
    multi-chip hardware (characterizes the gRPC collective overhead the
    DCN story depends on)."""
    import time as _time

    nprocs, n_steps = 4, 4
    port = _free_port()
    outs = [tmp_path / f"rank{i}.json" for i in range(nprocs)]
    env = os.environ.copy()
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, str(i), str(nprocs), str(port),
             str(outs[i]), str(n_steps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(nprocs)
    ]
    for p in procs:
        try:
            _, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed child timed out")
        assert p.returncode == 0, err[-2000:]

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["num_devices"] == nprocs for r in results)
    # every rank observes the SAME replicated global metrics
    for rank in results[1:]:
        for s0, s1 in zip(results[0]["steps"], rank["steps"]):
            assert (s0["loss"], s0["reward"]) == (s1["loss"], s1["reward"])

    # single-process 4-device reference of the identical recipe
    import jax

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.parallel.mesh import make_mesh, replicate
    from rl4co_tpu.rl.reinforce import REINFORCE

    envr = get_env("tsp", num_loc=8)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2, normalization="instance")
    algo = REINFORCE(env=envr, policy=policy, baseline="mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))
    mesh = make_mesh(devices=jax.devices()[:4], dp=4)
    state = replicate(algo.init(jax.random.PRNGKey(0)), mesh)
    step = algo.make_train_step(16, mesh=mesh, donate=False)
    local_times = []
    for i, dist_step in enumerate(results[0]["steps"]):
        t0 = _time.perf_counter()
        state, m = step(state, jax.random.PRNGKey(42 + i))
        loss = float(m["loss"])
        local_times.append(_time.perf_counter() - t0)
        np.testing.assert_allclose(float(m["reward"]), dist_step["reward"],
                                   rtol=1e-5)
        np.testing.assert_allclose(loss, dist_step["loss"],
                                   rtol=2e-4, atol=1e-5)

    # timing: steady-state (post-compile) per-step wall, max over ranks vs
    # the in-process run. Informational print + a loose sanity bound only —
    # CI boxes are noisy, and the point is the recorded curve, not a gate.
    dist_steady = max(
        sum(r["steps"][i]["step_s"] for i in range(1, n_steps)) / (n_steps - 1)
        for r in results
    )
    local_steady = sum(local_times[1:]) / (n_steps - 1)
    print(f"\n[4-proc timing] per-step: distributed {dist_steady*1e3:.1f} ms "
          f"vs single-process {local_steady*1e3:.1f} ms "
          f"(gRPC overhead x{dist_steady / max(local_steady, 1e-9):.2f})")
    assert dist_steady < 60.0, "4-process step pathologically slow"
