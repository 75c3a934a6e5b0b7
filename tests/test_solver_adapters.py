"""Classical-solver adapter tests (reference `mtvrp/baselines/*`).

The external packages (pyvrp / lkh / ortools) are not installable in this
zero-egress image, so each adapter is exercised against a fake module that
mimics the package's API surface — verifying the instance conversion,
solution decoding, batch dispatch, and padding end-to-end. A missing real
package must raise a clean ImportError.
"""

import numpy as np
import pytest

import jax

from rl4co_tpu.envs import get_env
from rl4co_tpu.envs.routing import mtvrp_baselines
from rl4co_tpu.envs.routing.solver_adapters import convert, solve_batch


def mtvrp_instances(n=3, num_loc=6):
    env = get_env("mtvrp", num_loc=num_loc)
    return env, jax.device_get(env.generate_batch(jax.random.PRNGKey(0), n))


# ---------------------------------------------------------------- convert

def test_split_batch_adds_derived_fields():
    env, inst = mtvrp_instances()
    per = convert.split_batch(inst)
    assert len(per) == 3
    one = per[0]
    assert one["locs"].shape == (7, 2)
    assert one["cost_matrix"].shape == (7, 7)
    assert np.allclose(np.diag(one["cost_matrix"]), 0.0)
    assert float(one["vehicle_capacity"]) == 1.0  # scale_demand normalizes
    assert int(one["backhaul_class"]) == 1


def test_split_batch_plain_cvrp_demand():
    env = get_env("cvrp", num_loc=5)
    inst = jax.device_get(env.generate_batch(jax.random.PRNGKey(0), 2))
    per = convert.split_batch(inst)
    assert per[0]["demand_linehaul"].shape == (6,)
    assert per[0]["demand_linehaul"][0] == 0.0


def test_scale_int_rounds_and_maps_inf():
    arr = convert.scale_int(np.array([0.5, np.inf, 1.23456]), 1000)
    assert arr.tolist() == [500, convert.INT32_MAX, 1235]
    assert convert.scale_int(np.float64(2.0), 10) == 20


def test_routes_to_action():
    assert convert.routes_to_action([[1, 2], [3]]) == [1, 2, 0, 3, 0]


# ---------------------------------------------------------------- pyvrp

class _FakeLoc:
    def __init__(self, **kw):
        self.__dict__.update(kw)


class _FakeRoute:
    def __init__(self, visits):
        self._v = visits

    def visits(self):
        return self._v


class _FakeResult:
    def __init__(self, routes, cost):
        self.best = type("Sol", (), {"routes": lambda s: routes})()
        self._cost = cost

    def cost(self):
        return self._cost


def make_fake_pyvrp(captured):
    import types

    fake = types.SimpleNamespace()
    fake.Client = _FakeLoc
    fake.Depot = _FakeLoc
    fake.VehicleType = _FakeLoc

    def problem_data(clients, depots, vehicle_types, dist, dur):
        captured["clients"] = clients
        captured["vehicle_types"] = vehicle_types
        captured["matrix"] = dist[0]
        return "DATA"

    fake.ProblemData = problem_data

    def solve(data, stop):
        assert data == "DATA"
        n_clients = len(captured["clients"])
        return _FakeResult([_FakeRoute(list(range(1, n_clients + 1)))], 4200)

    fake.solve = solve
    return fake


def test_pyvrp_adapter_with_fake_module(monkeypatch):
    from rl4co_tpu.envs.routing.solver_adapters import pyvrp as adapter

    captured = {}
    fake = make_fake_pyvrp(captured)
    monkeypatch.setattr(adapter, "_import_pyvrp",
                        lambda: (fake, lambda max_runtime: None))

    env, inst = mtvrp_instances(n=2, num_loc=5)
    actions, rewards = solve_batch(inst, "pyvrp", max_runtime=1.0)
    assert actions.shape == (2, 6)  # 5 customers + trailing depot 0
    assert (actions[:, :5] == np.arange(1, 6)).all()
    assert np.allclose(rewards, -4.2)  # 4200 / PYVRP_SCALING_FACTOR
    # conversion captured the full model
    assert len(captured["clients"]) == 5
    assert captured["vehicle_types"][0].num_available == 5
    assert captured["matrix"].shape == (6, 6)


def test_pyvrp_backhaul_precedence_arcs(monkeypatch):
    """VRPB: backhaul->linehaul arcs must be forbidden in the matrix."""
    from rl4co_tpu.envs.routing.solver_adapters import pyvrp as adapter

    captured = {}
    fake = make_fake_pyvrp(captured)
    inst = {
        "locs": np.array([[0.5, 0.5], [0.1, 0.1], [0.9, 0.9]]),
        "demand_linehaul": np.array([0.0, 0.3, 0.0]),
        "demand_backhaul": np.array([0.0, 0.0, 0.2]),
        "time_windows": np.array([[0, 3.0], [0, 3.0], [0, 3.0]]),
        "service_time": np.zeros(3),
        "vehicle_capacity": np.float64(1.0),
        "distance_limit": np.float64(np.inf),
        "open_route": np.bool_(False),
        "backhaul_class": np.int64(1),
        "cost_matrix": np.linalg.norm(
            np.array([[0.5, 0.5], [0.1, 0.1], [0.9, 0.9]])[:, None]
            - np.array([[0.5, 0.5], [0.1, 0.1], [0.9, 0.9]])[None], axis=-1),
    }
    adapter.instance_to_data(fake, inst)
    m = captured["matrix"]
    assert m[2, 1] == np.iinfo(np.int32).max  # backhaul(2) -> linehaul(1)
    assert m[1, 2] != np.iinfo(np.int32).max


def test_pyvrp_missing_raises_importerror():
    from rl4co_tpu.envs.routing.solver_adapters import pyvrp as adapter

    with pytest.raises(ImportError, match="PyVRP"):
        adapter._import_pyvrp()


# ---------------------------------------------------------------- lkh

def test_lkh_adapter_with_fake_module(monkeypatch):
    import types

    from rl4co_tpu.envs.routing.solver_adapters import lkh as adapter

    parsed = {}

    class FakeProblem:
        @staticmethod
        def parse(text):
            parsed["text"] = text
            return "PROBLEM"

    fake = types.SimpleNamespace()
    fake.LKHProblem = FakeProblem

    def solve(solver_loc, problem, time_limit, runs):
        assert problem == "PROBLEM"
        return [[1, 3], [2, 4]], 123456.0

    fake.solve = solve
    monkeypatch.setattr(adapter, "_import_lkh", lambda: fake)

    env, inst = mtvrp_instances(n=1, num_loc=4)
    actions, rewards = solve_batch(inst, "lkh", max_runtime=1.0,
                                   problem_type="VRPTW")
    assert actions.tolist() == [[1, 3, 0, 2, 4, 0]]
    np.testing.assert_allclose(rewards, [-123456.0 / convert.LKH_SCALING_FACTOR])
    text = parsed["text"]
    assert "TYPE : CVRPTW" in text          # VRPTW maps to LKH CVRPTW
    assert "DIMENSION : 5" in text
    assert "TIME_WINDOW_SECTION" in text
    assert "EDGE_WEIGHT_SECTION" in text
    assert text.rstrip().endswith("EOF")


def test_lkh_unsupported_variant_raises():
    from rl4co_tpu.envs.routing.solver_adapters import lkh as adapter

    with pytest.raises(ValueError, match="not expressible"):
        adapter.instance_to_problem(None, {}, "VRPB")


# ---------------------------------------------------------------- dispatch

def test_mtvrp_solve_dispatch_and_greedy_default():
    env, inst = mtvrp_instances(n=2, num_loc=5)
    actions, cost = mtvrp_baselines.solve(inst, env=env, solver="greedy",
                                          num_samples=2)
    assert actions.shape[0] == 2 and np.isfinite(cost).all()
    with pytest.raises(ValueError, match="Unknown solver"):
        mtvrp_baselines.solve(inst, solver="nope")


def test_mtvrp_solve_external_via_fake(monkeypatch):
    from rl4co_tpu.envs.routing.solver_adapters import pyvrp as adapter

    captured = {}
    fake = make_fake_pyvrp(captured)
    monkeypatch.setattr(adapter, "_import_pyvrp",
                        lambda: (fake, lambda max_runtime: None))
    env, inst = mtvrp_instances(n=2, num_loc=5)
    actions, cost = mtvrp_baselines.solve(inst, solver="pyvrp")
    assert actions.shape == (2, 6)
    np.testing.assert_allclose(cost, 4.2)  # solve() returns positive cost
