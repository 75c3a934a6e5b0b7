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

# Kool et al. 2019 capacity schedule, as the reference hardcodes it
# (`rl4co/data/generate_data.py:42-57`).
_VRP_CAPACITIES = {
    10: 20.0, 15: 25.0, 20: 30.0, 30: 33.0, 40: 37.0, 50: 40.0, 60: 43.0,
    75: 45.0, 100: 50.0, 125: 55.0, 150: 60.0, 200: 70.0, 500: 100.0,
    1000: 150.0,
}


def generate_reference_convention(
    problem: str, num_loc: int, dataset_size: int, seed: int
) -> dict:
    """Reproduce the reference's canonical dataset numpy streams bit-for-bit.

    The reference seeds global numpy (`np.random.seed(seed)`,
    `rl4co/data/generate_data.py:302`) then draws with the per-problem
    generator (`generate_tsp_data`/`generate_vrp_data`/... at
    `generate_data.py:36-131`). Mirroring the exact draw order makes our
    npz byte-identical to the reference's ``data/<problem>/test{n}_seed{s}.npz``,
    pinning the instance distribution for optimality-gap artifacts
    (VERDICT r4 #4). Returns the *raw* reference-format dict; feed through
    :func:`rl4co_tpu.data.io.load_reference_npz` conventions at use time.
    """
    import numpy as np

    rng = np.random.RandomState(seed)  # same MT19937 stream as np.random.seed
    if problem == "tsp":
        return {"locs": rng.uniform(size=(dataset_size, num_loc, 2)).astype(np.float32)}
    if problem in ("cvrp", "vrp", "sdvrp"):
        # draw order: depot, locs, demand (`generate_data.py:66-76`)
        return {
            "depot": rng.uniform(size=(dataset_size, 2)).astype(np.float32),
            "locs": rng.uniform(size=(dataset_size, num_loc, 2)).astype(np.float32),
            "demand": rng.randint(1, 10, size=(dataset_size, num_loc)).astype(np.float32),
            "capacity": np.full(dataset_size, _VRP_CAPACITIES[num_loc]).astype(np.float32),
        }
    if problem == "atsp":
        # `generate_atsp_data`: uniform [0, tmax) cost matrix + floyd-like
        # min-plus closure is NOT applied in the reference default path;
        # it draws dists uniform and symmetrizes via min-plus loop. Keep
        # unsupported here rather than mis-pin the stream.
        raise NotImplementedError("atsp reference stream not mirrored")
    raise NotImplementedError(f"reference convention for {problem!r} not mirrored")


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
    p.add_argument("--convention", default="native", choices=["native", "reference"],
                   help="'reference' mirrors the reference repo's numpy "
                        "streams bit-for-bit (canonical test/val sets)")
    args = p.parse_args(argv)
    if args.convention == "reference":
        data = generate_reference_convention(
            args.problem, args.num_loc, args.dataset_size, args.seed)
    else:
        data = generate_dataset(args.problem, args.num_loc, args.dataset_size, args.seed)
    name = args.name or f"{args.problem}{args.num_loc}_seed{args.seed}.npz"
    path = os.path.join(args.data_dir, args.problem, name)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_instances_npz(data, path)
    print(f"Wrote {path}")


if __name__ == "__main__":
    main()
