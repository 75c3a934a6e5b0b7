"""TSPLIB95 / CVRPLIB parser + adapter tests (reference workflow:
`examples/datasets/1-test-on-tsplib.ipynb`, `2-test-on-cvrplib.ipynb`)."""

import jax
import numpy as np
import pytest

from rl4co_tpu.data.tsplib import (
    normalize_coords,
    read_cvrplib_solution,
    read_tsplib,
    read_tsplib_tour,
    tour_cost,
    tsplib_distance_matrix,
    tsplib_to_tsp_batch,
    vrplib_to_cvrp_batch,
)

SQUARE_TSP = """\
NAME : square4
TYPE : TSP
COMMENT : unit square scaled by 10
DIMENSION : 4
EDGE_WEIGHT_TYPE : EUC_2D
NODE_COORD_SECTION
1 0 0
2 10 0
3 10 10
4 0 10
EOF
"""

EXPLICIT_TSP = """\
NAME : tri3
TYPE : TSP
DIMENSION : 3
EDGE_WEIGHT_TYPE : EXPLICIT
EDGE_WEIGHT_FORMAT : UPPER_ROW
EDGE_WEIGHT_SECTION
 2 3
 4
EOF
"""

OPT_TOUR = """\
NAME : square4.opt.tour
TYPE : TOUR
DIMENSION : 4
TOUR_SECTION
1
2
3
4
-1
EOF
"""

VRP_FILE = """\
NAME : toy5
TYPE : CVRP
DIMENSION : 5
EDGE_WEIGHT_TYPE : EUC_2D
CAPACITY : 10
NODE_COORD_SECTION
1 5 5
2 0 0
3 10 0
4 10 10
5 0 10
DEMAND_SECTION
1 0
2 3
3 4
4 5
5 6
DEPOT_SECTION
 1
 -1
EOF
"""

SOL_FILE = """\
Route #1: 1 2
Route #2: 3 4
Cost 42
"""


def test_parse_euc2d_and_canonical_cost():
    p = read_tsplib(SQUARE_TSP)
    assert p["dimension"] == 4 and p["edge_weight_type"] == "EUC_2D"
    tour = read_tsplib_tour(OPT_TOUR)
    np.testing.assert_array_equal(tour, [0, 1, 2, 3])
    # perimeter of the 10x10 square, canonical = plain here (integer coords)
    assert tour_cost(p, tour) == 40.0
    assert tour_cost(p, tour, rounded=False) == pytest.approx(40.0)
    # nint rounding: diagonal tour hits sqrt(200)=14.142 -> 14 per diagonal
    diag = np.array([0, 2, 1, 3])
    assert tour_cost(p, diag) == 2 * 14 + 2 * 10


def test_parse_explicit_upper_row():
    p = read_tsplib(EXPLICIT_TSP)
    dm = tsplib_distance_matrix(p)
    expect = np.array([[0, 2, 3], [2, 0, 4], [3, 4, 0]], dtype=float)
    np.testing.assert_array_equal(dm, expect)
    assert tour_cost(p, np.array([0, 1, 2])) == 2 + 4 + 3


def test_att_and_geo_metrics_sane():
    # ATT pseudo-euclidean: d = ceil-ish of sqrt(sum/10)
    att = read_tsplib(SQUARE_TSP.replace("EUC_2D", "ATT"))
    dm = tsplib_distance_matrix(att)
    r = np.sqrt(100.0 / 10.0)  # nodes 1-2: dx=10 -> sqrt(10)=3.162 -> 4
    assert dm[0, 1] == np.floor(r + 0.5) + (1 if np.floor(r + 0.5) < r else 0)
    geo = read_tsplib(SQUARE_TSP.replace("EUC_2D", "GEO"))
    gm = tsplib_distance_matrix(geo)
    assert (gm >= 0).all() and np.allclose(gm, gm.T) and gm[0, 0] == 0


ULYSSES16_COORDS = np.array([
    [38.24, 20.42], [39.57, 26.15], [40.56, 25.32], [36.26, 23.12],
    [33.48, 10.54], [37.56, 12.19], [38.42, 13.11], [37.52, 20.44],
    [41.23, 9.10], [41.17, 13.05], [36.08, -5.21], [38.47, 15.13],
    [38.15, 15.35], [37.51, 15.17], [35.49, 14.32], [39.36, 19.56],
])


def test_geo_ulysses16_published_optimum():
    """GEO regression: canonical TSPLIB GEO arithmetic truncates the degree
    part (Concorde `(int) x`), it does not round. The published ulysses16
    optimum is 6859; nint-rounding the degrees gives 6917 (ADVICE r2)."""
    p = {"edge_weight_type": "GEO", "node_coords": ULYSSES16_COORDS,
         "edge_weights": None}
    opt = np.array([1, 14, 13, 12, 7, 6, 15, 5, 11, 9, 10, 16, 3, 2, 4, 8]) - 1
    assert tour_cost(p, opt) == 6859.0


def test_explicit_instance_clear_errors():
    """EXPLICIT (matrix-only) instances must raise descriptive errors from
    coordinate-requiring paths, not opaque TypeErrors (ADVICE r2)."""
    p = read_tsplib(EXPLICIT_TSP)
    with pytest.raises(ValueError, match="rounded=True"):
        tour_cost(p, np.array([0, 1, 2]), rounded=False)
    with pytest.raises(ValueError, match="ATSP"):
        tsplib_to_tsp_batch(p)


def test_cvrplib_solution_parse():
    sol = read_cvrplib_solution(SOL_FILE)
    assert sol["routes"] == [[1, 2], [3, 4]] and sol["cost"] == 42.0


def test_normalize_coords_unit_square():
    c = np.array([[0.0, 5.0], [10.0, 10.0], [5.0, 0.0]])
    n = normalize_coords(c)
    assert n.min() == 0.0 and n.max() == 1.0
    assert (n >= 0).all() and (n <= 1).all()


def test_tsplib_to_tsp_rollout_valid():
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models import AttentionModelPolicy, rollout
    from rl4co_tpu.models.policies.constructive import init_policy_params

    p = read_tsplib(SQUARE_TSP)
    env, batch = tsplib_to_tsp_batch(p)
    policy = AttentionModelPolicy(env_name="tsp", embed_dim=16,
                                  num_encoder_layers=1, num_heads=2,
                                  feedforward_hidden=32)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    out = rollout(policy, params, env, batch, jax.random.PRNGKey(1),
                  DecodeSpec(kind="greedy"))
    actions = np.asarray(out.actions[0])
    assert sorted(actions[:4].tolist()) == [0, 1, 2, 3]
    # report the canonical cost of the model tour on raw coordinates
    cost = tour_cost(p, actions[:4])
    assert cost >= 40.0  # can't beat the optimum


def test_vrplib_to_cvrp_rollout_valid():
    from rl4co_tpu.decoding import DecodeSpec
    from rl4co_tpu.models import AttentionModelPolicy, rollout
    from rl4co_tpu.models.policies.constructive import init_policy_params

    p = read_tsplib(VRP_FILE)
    assert p["capacity"] == 10.0 and p["depot"] == 0
    env, batch = vrplib_to_cvrp_batch(p)
    assert batch["demand"].shape == (1, 4)
    policy = AttentionModelPolicy(env_name="cvrp", embed_dim=16,
                                  num_encoder_layers=1, num_heads=2,
                                  feedforward_hidden=32)
    params = init_policy_params(policy, env, jax.random.PRNGKey(0))
    out = rollout(policy, params, env, batch, jax.random.PRNGKey(1),
                  DecodeSpec(kind="greedy"))
    inst0 = jax.tree_util.tree_map(lambda x: x[0], batch)
    env.check_solution_validity(inst0, np.asarray(out.actions)[0])
