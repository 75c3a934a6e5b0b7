"""Evaluation CLI (reference `rl4co/tasks/eval.py:411-583`).

    python -m rl4co_tpu.tasks.eval_cli --problem tsp --num-loc 50 \
        --method multistart_greedy --ckpt-path ckpts/step_100 --size 1000
"""

from __future__ import annotations

import argparse
import json

import jax

from rl4co_tpu.data.io import load_instances_npz
from rl4co_tpu.envs import get_env
from rl4co_tpu.models import AttentionModelPolicy
from rl4co_tpu.models.policies.constructive import init_policy_params
from rl4co_tpu.tasks.eval import EVAL_METHODS, evaluate_policy


def main(argv=None):
    p = argparse.ArgumentParser(description="rl4co-tpu evaluation")
    p.add_argument("--problem", default="tsp")
    p.add_argument("--num-loc", type=int, default=50)
    p.add_argument("--method", default="greedy", choices=sorted(EVAL_METHODS))
    p.add_argument("--size", type=int, default=1000, help="instances to evaluate")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--data-path", default=None, help="npz dataset (else generated)")
    p.add_argument("--ckpt-path", default=None, help="orbax checkpoint dir")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--embed-dim", type=int, default=128)
    p.add_argument("--num-encoder-layers", type=int, default=3)
    args = p.parse_args(argv)

    env = get_env(args.problem, num_loc=args.num_loc)
    policy = AttentionModelPolicy(
        env_name=env.name,
        embed_dim=args.embed_dim,
        num_encoder_layers=args.num_encoder_layers,
    )
    # init's many tiny jits on the in-process CPU backend (remote-tunnel
    # backends charge a round trip per program)
    try:
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = init_policy_params(policy, env, jax.random.PRNGKey(0))
        params = jax.device_put(params, jax.devices()[0])
    except RuntimeError:
        params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    if args.ckpt_path:
        from rl4co_tpu.checkpoint import restore_checkpoint
        from rl4co_tpu.rl.reinforce import REINFORCE

        algo = REINFORCE(env=env, policy=policy, baseline="no")
        template = algo.init(jax.random.PRNGKey(0))
        state = restore_checkpoint(args.ckpt_path, template)
        params = state.params

    if args.data_path:
        instances = load_instances_npz(args.data_path)
    else:
        instances = env.generate_batch(jax.random.PRNGKey(args.seed), args.size)

    res = evaluate_policy(
        env, policy, params, instances, method=args.method,
        key=jax.random.PRNGKey(args.seed), batch_size=args.batch_size,
    )
    out = {k: v for k, v in res.items() if k != "rewards"}
    print(json.dumps(out))
    return res


if __name__ == "__main__":
    main()
