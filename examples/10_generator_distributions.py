"""Instance-generator distributions for generalization studies.

Reference counterpart: `examples/other/3-data-generator-distributions.ipynb`
(`rl4co/envs/common/distribution_utils.py`: Cluster, Mixed,
Gaussian_Mixture, Mix_Distribution). Envs take a `loc_distribution` name;
samplers are stateless `sample(key, shape)` objects.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from rl4co_tpu.envs import get_env
from rl4co_tpu.envs.distributions import get_sampler


def main(n=200):
    key = jax.random.PRNGKey(0)
    for name, kwargs in [
        ("uniform", {}),
        ("cluster", {"n_cluster": 3}),
        ("mixed", {"n_cluster_mix": 2}),
        ("gaussian_mixture", {"num_modes": 5, "cdist": 50.0}),
        ("mix_distribution", {}),
    ]:
        sampler = get_sampler(name, **kwargs)
        pts = np.asarray(sampler.sample(key, (n, 2)))
        print(f"{name:<18} mean={pts.mean(0).round(3)} "
              f"std={pts.std(0).round(3)} range=[{pts.min():.3f},{pts.max():.3f}]")

    # envs accept the distribution by name — train/eval on shifted data
    env = get_env("tsp", num_loc=20, loc_distribution="cluster")
    batch = env.generate_batch(jax.random.PRNGKey(1), 4)
    print("cluster-TSP batch locs shape:", batch["locs"].shape)

    # a constant scalar yields fixed values; callables pass through
    const = get_sampler(0.5)
    print("constant sampler:", np.unique(np.asarray(const.sample(key, (4,)))))


if __name__ == "__main__":
    main()
