"""Dataset generation CLI (reference `rl4co/data/generate_data.py:25-369`).

Generates seeded npz validation/test datasets with the reference's seed
conventions (val seed 4321, test seed 1234, 10k instances —
`configs/env/tsp.yaml:8-10`):

    python -m rl4co_tpu.data.generate --problem tsp --num-loc 50 \
        --data-dir data/ --dataset-size 10000
"""

from __future__ import annotations

import argparse
import os

import jax

from rl4co_tpu.data.io import save_instances_npz
from rl4co_tpu.envs import ENV_REGISTRY, get_env

DEFAULT_SEEDS = {"val": 4321, "test": 1234}
DEFAULT_PROBLEMS = ("tsp", "cvrp", "op", "pctsp", "pdp", "atsp", "mdpp")


def generate_dataset(
    problem: str, num_loc: int, dataset_size: int, seed: int, **env_kwargs
) -> dict:
    kwargs = dict(env_kwargs)
    if problem not in ("mcp", "ffsp", "fjsp", "jssp", "dpp", "mdpp"):
        kwargs["num_loc"] = num_loc
    env = get_env(problem, **kwargs)
    instances = env.generate_batch(jax.random.PRNGKey(seed), dataset_size)
    return jax.device_get(instances)


def generate_default_datasets(
    data_dir: str,
    problems=DEFAULT_PROBLEMS,
    sizes=(20, 50, 100),
    dataset_size: int = 10_000,
) -> list:
    """Reference `generate_default_datasets` (`generate_data.py:314+`)."""
    written = []
    for problem in problems:
        for n in sizes:
            for phase, seed in DEFAULT_SEEDS.items():
                path = os.path.join(data_dir, problem, f"{phase}{n}_seed{seed}.npz")
                if os.path.exists(path):
                    continue
                os.makedirs(os.path.dirname(path), exist_ok=True)
                data = generate_dataset(problem, n, dataset_size, seed)
                save_instances_npz(data, path)
                written.append(path)
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description="rl4co-tpu dataset generation")
    p.add_argument("--problem", default="tsp", choices=sorted(ENV_REGISTRY))
    p.add_argument("--num-loc", type=int, default=50)
    p.add_argument("--dataset-size", type=int, default=10_000)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--name", default=None)
    args = p.parse_args(argv)
    data = generate_dataset(args.problem, args.num_loc, args.dataset_size, args.seed)
    name = args.name or f"{args.problem}{args.num_loc}_seed{args.seed}.npz"
    path = os.path.join(args.data_dir, args.problem, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_instances_npz(data, path)
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
