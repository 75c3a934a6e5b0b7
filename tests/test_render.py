"""Rendering smoke tests (reference ships per-env render.py modules;
`rl4co/envs/routing/tsp/render.py` etc.)."""

import jax
import jax.numpy as jnp
import matplotlib
import numpy as np
import pytest

matplotlib.use("Agg")

from rl4co_tpu.envs import get_env
from rl4co_tpu.envs.render import render


def _greedy_random_actions(env, instance, key):
    """Feasible action sequence via masked random rollout (host loop)."""
    state = env.reset(instance)
    step = jax.jit(env.step)
    mask_fn = jax.jit(env.action_mask)
    actions = []
    for t in range(env.max_steps):
        if bool(state.done):
            break
        mask = np.asarray(mask_fn(state))
        key, sub = jax.random.split(key)
        probs = mask / mask.sum()
        a = int(jax.random.choice(sub, mask.shape[0], p=jnp.asarray(probs)))
        actions.append(a)
        state = step(state, jnp.int32(a))
    return np.asarray(actions, int), state


@pytest.mark.parametrize(
    "name,kwargs",
    [
        ("tsp", dict(num_loc=10)),
        ("cvrp", dict(num_loc=10)),
        ("op", dict(num_loc=10)),
        ("mtsp", dict(num_loc=10)),
        ("flp", dict(num_loc=10)),
        ("mcp", dict()),
        ("smtwtp", dict()),
        ("ffsp", dict(num_job=4)),
        ("dpp", dict()),
    ],
)
def test_render_smoke(name, kwargs):
    env = get_env(name, **kwargs)
    instance = env.generate(jax.random.PRNGKey(0))
    actions, state = _greedy_random_actions(env, instance, jax.random.PRNGKey(1))
    ax = render(env, instance, actions, state=state)
    assert ax is not None
    ax.figure.clf()


def test_render_atsp_circle():
    env = get_env("atsp", num_loc=8)
    instance = env.generate(jax.random.PRNGKey(0))
    actions = np.random.default_rng(0).permutation(8)
    ax = render(env, instance, actions)
    assert ax is not None
    ax.figure.clf()
