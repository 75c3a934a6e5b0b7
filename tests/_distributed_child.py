"""Child process for tests/test_distributed.py — one rank of a 2-process
`jax.distributed` run on CPU (the first real cross-process collective path
in the repo; reference DDP contract `rl4co/utils/trainer.py:73-86`).

Each rank owns ONE local CPU device; the global mesh spans both ranks, so
GSPMD's psum gradient reduction really crosses a process boundary (gRPC),
not just threads of one client. Usage:

    python tests/_distributed_child.py <process_id> <num_processes> <port> <out>
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    proc_id, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]

    # one local CPU device per rank (parent pytest env forces 8 — undo that)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nprocs,
        process_id=proc_id,
    )
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.local_device_count() == 1
    assert jax.device_count() == nprocs

    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.envs import get_env
    from rl4co_tpu.models import AttentionModelPolicy
    from rl4co_tpu.parallel.mesh import make_mesh, replicate
    from rl4co_tpu.rl.reinforce import REINFORCE

    env = get_env("tsp", num_loc=8)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, feedforward_hidden=32,
                                  num_heads=2, normalization="instance")
    algo = REINFORCE(env=env, policy=policy, baseline="mean",
                     train_spec=DecodeSpec(kind="sampling", tanh_clipping=10.0))

    mesh = make_mesh(dp=nprocs)  # spans both processes
    state = replicate(algo.init(jax.random.PRNGKey(0)), mesh)
    # optional global batch override (argv[6]) — runs/dp_scaling_cpu.py uses
    # batch = per_device x nprocs for a weak-scaling efficiency curve
    batch = int(sys.argv[6]) if len(sys.argv) > 6 else 16
    step = algo.make_train_step(batch, mesh=mesh, donate=False)

    n_steps = int(sys.argv[5]) if len(sys.argv) > 5 else 2
    records = []
    for i in range(n_steps):
        t0 = time.perf_counter()
        state, m = step(state, jax.random.PRNGKey(42 + i))
        # metrics are fully-replicated global scalars -> addressable anywhere
        loss, reward = float(m["loss"]), float(m["reward"])  # fetch = sync
        records.append({"loss": loss, "reward": reward,
                        "step_s": time.perf_counter() - t0})

    with open(out_path, "w") as f:
        json.dump({"process": proc_id, "num_devices": jax.device_count(),
                   "steps": records}, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
