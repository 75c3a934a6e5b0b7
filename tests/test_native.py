"""Native C++ local-search tests (reference `tsp/local_search.py`,
`cvrp/local_search.py` capabilities)."""

import jax
import numpy as np
import pytest

from rl4co_tpu.envs import get_env

try:
    from rl4co_tpu.native import batched_cvrp_local_search, batched_two_opt, get_lib

    get_lib()
    HAVE_NATIVE = True
except Exception as e:  # pragma: no cover
    HAVE_NATIVE = False
    REASON = str(e)

pytestmark = pytest.mark.skipif(not HAVE_NATIVE, reason="native lib build failed")


def tour_length(locs, tour):
    ordered = locs[tour]
    return np.linalg.norm(ordered - np.roll(ordered, -1, axis=0), axis=-1).sum()


def test_two_opt_improves_random_tours():
    env = get_env("tsp", num_loc=30)
    instances = jax.device_get(env.generate_batch(jax.random.PRNGKey(0), 8))
    locs = np.asarray(instances["locs"])
    rng = np.random.default_rng(0)
    tours = np.stack([rng.permutation(30) for _ in range(8)]).astype(np.int32)
    before = np.array([tour_length(locs[b], tours[b]) for b in range(8)])
    improved = batched_two_opt(locs, tours, max_iterations=200)
    after = np.array([tour_length(locs[b], improved[b]) for b in range(8)])
    assert (after <= before + 1e-5).all()
    assert after.mean() < before.mean() * 0.8  # random tours improve a lot
    for b in range(8):
        assert sorted(improved[b]) == list(range(30)), "tour must stay a permutation"


def cvrp_cost(locs, actions):
    prev = 0
    cost = 0.0
    for a in actions:
        cost += np.linalg.norm(locs[a] - locs[prev])
        prev = a
    cost += np.linalg.norm(locs[0] - locs[prev])
    return cost


def test_cvrp_local_search_improves_and_stays_feasible():
    env = get_env("cvrp", num_loc=20)
    _, state, actions, reward = env.rollout_random(jax.random.PRNGKey(0), 6)
    locs = np.asarray(state.locs)
    demand = np.pad(np.asarray(state.demand), ((0, 0), (1, 0)))
    actions = np.asarray(actions).astype(np.int32)
    before = np.array([cvrp_cost(locs[b], actions[b]) for b in range(6)])
    improved = batched_cvrp_local_search(locs, demand, actions, capacity=1.0)
    after = np.array([cvrp_cost(locs[b], improved[b]) for b in range(6)])
    assert (after <= before + 1e-4).all()
    # feasibility: all customers exactly once, capacity respected
    for b in range(6):
        cust = improved[b][improved[b] > 0]
        assert sorted(cust) == list(range(1, 21))
        load = 0.0
        for a in improved[b]:
            if a == 0:
                load = 0.0
            else:
                load += demand[b][a]
                assert load <= 1.0 + 1e-5


def test_tsp_ls_fn_inside_jit():
    import jax.numpy as jnp
    from rl4co_tpu.envs.routing.local_search import make_tsp_ls_fn

    env = get_env("tsp", num_loc=12)
    instances = env.generate_batch(jax.random.PRNGKey(0), 4)
    rng = np.random.default_rng(1)
    tours = jnp.asarray(
        np.stack([rng.permutation(12) for _ in range(4)]).astype(np.int32)
    )
    ls = make_tsp_ls_fn(max_iterations=100)

    @jax.jit
    def run(instances, tours):
        reward0 = -jnp.linalg.norm(
            jnp.take_along_axis(instances["locs"], tours[..., None], axis=-2)
            - jnp.roll(
                jnp.take_along_axis(instances["locs"], tours[..., None], axis=-2),
                1, axis=-2,
            ),
            axis=-1,
        ).sum(-1)
        return ls(instances, tours, reward0), reward0

    (new_tours, new_reward), reward0 = run(instances, tours)
    assert (np.asarray(new_reward) >= np.asarray(reward0) - 1e-5).all()


def test_deepaco_nls_improves():
    from rl4co_tpu.models.zoo.deepaco import DeepACO
    from rl4co_tpu.models.zoo.nargnn import NARGNNEncoder

    env = get_env("tsp", num_loc=12)
    enc = NARGNNEncoder(env_name="tsp", embed_dim=16,
                        num_layers_graph_encoder=2,
                        num_layers_heatmap_generator=2)
    plain = DeepACO(env=env, encoder=enc, n_ants_eval=6, n_iterations_eval=3)
    nls = DeepACO(env=env, encoder=enc, n_ants_eval=6, n_iterations_eval=3,
                  use_local_search=True)
    state = plain.init(jax.random.PRNGKey(0))
    val = env.generate_batch(jax.random.PRNGKey(1), 4)
    r_plain = plain.make_eval_step()(state.params, val, jax.random.PRNGKey(2))
    r_nls = nls.make_eval_step()(state.params, val, jax.random.PRNGKey(2))
    assert float(r_nls["reward"]) >= float(r_plain["reward"]) - 1e-6


def test_host_callback_detection_logic(monkeypatch):
    """The axon tunnel registers as plain 'tpu' (no string identifies it);
    detection must use the PALLAS_AXON_POOL_IPS marker, else the runtime
    probe (round-3: the old platform-string guard always passed and in-jit
    LS crashed on-chip)."""
    import rl4co_tpu.envs.routing.local_search as ls

    monkeypatch.setattr(ls, "_HOST_CB_SUPPORTED", None)
    monkeypatch.setattr(ls.jax, "default_backend", lambda: "tpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "127.0.0.1")
    assert ls.host_callbacks_supported() is False

    monkeypatch.setattr(ls, "_HOST_CB_SUPPORTED", None)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS")
    monkeypatch.setattr(ls, "_probe_host_callback", lambda: True)
    assert ls.host_callbacks_supported() is True

    # cpu backend always supports callbacks (no probe, no env dependence)
    monkeypatch.setattr(ls, "_HOST_CB_SUPPORTED", None)
    monkeypatch.setattr(ls.jax, "default_backend", lambda: "cpu")
    assert ls.host_callbacks_supported() is True


def test_neighbor_list_two_opt_or_opt():
    """Large-N kernel (neighbor-list 2-opt + Or-opt): permutation preserved,
    never worse than the input, and at least as short as the plain
    best-improvement 2-opt given the same budget class."""
    import numpy as np

    from rl4co_tpu.native import batched_two_opt, batched_two_opt_nl

    rng = np.random.default_rng(7)
    b, n = 4, 300
    locs = rng.random((b, n, 2), dtype=np.float32)
    tours = np.stack([rng.permutation(n) for _ in range(b)]).astype(np.int32)

    def lengths(t):
        o = np.take_along_axis(locs, t[..., None].repeat(2, -1), 1)
        c = np.concatenate([o, o[:, :1]], 1)
        return np.linalg.norm(np.diff(c, axis=1), axis=-1).sum(1)

    l0 = lengths(tours)
    out_nl = batched_two_opt_nl(locs, tours)
    assert (np.sort(out_nl, axis=1) == np.arange(n)).all()
    l_nl = lengths(out_nl)
    assert (l_nl <= l0 + 1e-4).all()
    out_plain = batched_two_opt(locs, tours, max_iterations=10_000)
    # or-opt + 2-opt should be at least competitive with plain 2-opt
    assert l_nl.mean() <= lengths(out_plain).mean() * 1.02
    # dispatcher picks the nl kernel at large N
    from rl4co_tpu.envs.routing.local_search import tsp_local_search

    out_auto = tsp_local_search(locs, tours)
    assert (lengths(out_auto) <= l0 + 1e-4).all()
