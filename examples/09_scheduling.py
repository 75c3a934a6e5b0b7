"""Scheduling: FJSP / JSSP with Learning-to-Dispatch (L2D).

Reference counterpart: `examples/other/2-scheduling.ipynb`
(`rl4co/envs/scheduling/fjsp`, `zoo/l2d`). Also shows the standard-format
instance file parser round-trip (`fjsp/parser.py` equivalent).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from rl4co_tpu.decoding import DecodeSpec
from rl4co_tpu.envs.scheduling.fjsp import FJSP, JSSP


def main():
    # ---- FJSP with the HetGNN-based L2D policy ----
    from rl4co_tpu.models.zoo.l2d import (
        L2DAttnModel,
        L2DAttnPolicy,
        L2DModel,
        L2DPolicy,
        l2d_attn_rollout,
    )

    env = FJSP(num_jobs=4, num_mas=3, max_ops_per_job=3)
    policy = L2DPolicy(embed_dim=32, num_encoder_layers=1,
                       actor_hidden_dim=32)
    model = L2DModel(env=env, policy=policy)
    state = model.init(jax.random.PRNGKey(0))
    step = model.make_train_step(batch_size=4)
    for it in range(3):
        state, m = step(state, jax.random.fold_in(jax.random.PRNGKey(1), it))
    print(f"FJSP L2D: loss {float(m['loss']):.4f} "
          f"reward (−makespan) {float(m['reward']):.4f}")

    # ---- JSSP with the encode-once attention variant ----
    jenv = JSSP(num_jobs=4, num_mas=3)
    jpolicy = L2DAttnPolicy(embed_dim=32, num_heads=4, num_encoder_layers=1)
    jmodel = L2DAttnModel(env=jenv, policy=jpolicy)
    jstate = jmodel.init(jax.random.PRNGKey(0))
    jstep = jmodel.make_train_step(batch_size=4)
    jstate, jm = jstep(jstate, jax.random.PRNGKey(1))
    instances = jenv.generate_batch(jax.random.PRNGKey(2), 4)
    out = l2d_attn_rollout(jpolicy, jstate.params, jenv, instances,
                           jax.random.PRNGKey(3), DecodeSpec(kind="greedy"))
    print(f"JSSP L2DAttn greedy makespan: {-float(out.reward.mean()):.2f}")

    # ---- standard-format instance files (write -> parse round-trip) ----
    import tempfile

    from rl4co_tpu.envs.scheduling.parser import (
        parse_fjsp_file,
        write_fjsp_file,
    )

    inst = jax.tree_util.tree_map(lambda x: np.asarray(x[0]), instances)
    with tempfile.NamedTemporaryFile("w", suffix=".fjs", delete=False) as f:
        path = f.name
    write_fjsp_file(path, inst)
    parsed = parse_fjsp_file(path)
    print(f"parser round-trip ok: {parsed['num_jobs']} jobs, "
          f"{parsed['num_mas']} machines")


if __name__ == "__main__":
    main()
